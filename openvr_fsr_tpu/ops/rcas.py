"""RCAS on XLA: planar (3, H, W), zero-padded shifts.

Line-faithful port of FsrRcasF (reference src/fsr/ffx_fsr1.h:684-769). The
reference wrapper loads taps with Texture2D.Load whose out-of-bounds reads
return zero (src/fsr/fsr_rcas.hlsl:18) — reproduced by zero padding. Flat
regions divide by zero; HLSL min/max NaN semantics swallow the NaNs.
"""

import jax.numpy as jnp
import numpy as np

from .common import F32, aprx_med_rcp, rcp, hlsl_min, hlsl_max, min3, max3, sat

__all__ = ["rcas_jax", "rcas_core"]

RCAS_LIMIT = F32(0.25 - 1.0 / 16.0)


def _shift_zero(rgb, dx, dy):
    """rgb[:, y+dy, x+dx] with zeros outside."""
    padded = jnp.pad(rgb, ((0, 0), (1, 1), (1, 1)))
    _, h, w = rgb.shape
    return padded[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def rcas_jax(rgb, sharpness_linear, denoise=False):
    """rgb: (3, H, W) f32 (the quantized upscale output in the full pipeline).
    sharpness_linear: f32 scalar (traced or static) = exp2(-stops).
    Returns (3, H, W) f32."""
    e = rgb
    b = _shift_zero(rgb, 0, -1)
    d = _shift_zero(rgb, -1, 0)
    f = _shift_zero(rgb, 1, 0)
    h = _shift_zero(rgb, 0, 1)
    return rcas_core(b, d, e, f, h, sharpness_linear, denoise)


def rcas_core(b, d, e, f, h, sharpness_linear, denoise=False):
    """FsrRcasF (ffx_fsr1.h:684-769) given the 5 cross taps as (C, ...) f32
    arrays (b=up, d=left, e=centre, f=right, h=down; out-of-image taps must
    already be zero). Pure jnp — shared by the XLA op and the Pallas kernel."""
    mn4 = jnp.minimum(min3(b, d, f), h)   # per channel (3,H,W)
    mx4 = jnp.maximum(max3(b, d, f), h)

    peak_x, peak_y = F32(1.0), F32(-4.0)
    hit_min = mn4 * rcp(F32(4.0) * mx4)
    hit_max = (peak_x - mx4) * rcp(F32(4.0) * mn4 + peak_y)
    lobe_rgb = hlsl_max(-hit_min, hit_max)
    lobe = hlsl_max(
        jnp.full_like(lobe_rgb[0], -RCAS_LIMIT),
        hlsl_min(max3(lobe_rgb[0], lobe_rgb[1], lobe_rgb[2]),
                 jnp.zeros_like(lobe_rgb[0])),
    ) * sharpness_linear

    if denoise:  # FSR_RCAS_DENOISE — off in the shipped shaders
        def luma(c):
            return c[2] * F32(0.5) + (c[0] * F32(0.5) + c[1])
        bL, dL, eL, fL, hL = luma(b), luma(d), luma(e), luma(f), luma(h)
        nz = F32(0.25) * bL + F32(0.25) * dL + F32(0.25) * fL + F32(0.25) * hL - eL
        rng = max3(max3(bL, dL, eL), fL, hL) - min3(min3(bL, dL, eL), fL, hL)
        nz = sat(jnp.abs(nz) * aprx_med_rcp(rng))
        nz = F32(-0.5) * nz + F32(1.0)
        lobe = lobe * nz

    rcp_l = aprx_med_rcp(F32(4.0) * lobe + F32(1.0))
    out = (lobe * b + lobe * d + lobe * h + lobe * f + e) * rcp_l
    return out
