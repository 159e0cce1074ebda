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


def rcas_core(b, d, e, f, h, sharpness_linear, denoise=False, dt=F32):
    """FsrRcasF (ffx_fsr1.h:684-769) given the 5 cross taps as (C, ...)
    arrays (b=up, d=left, e=centre, f=right, h=down; out-of-image taps must
    already be zero). Pure jnp — shared by the XLA op and the Pallas kernel.
    dt=bfloat16 gives the relaxed-precision fast mode (FsrRcasHx2 analog,
    ffx_fsr1.h:874+); the rcp approximations then evaluate in f32."""
    if dt is not F32:
        b, d, e, f, h = (x.astype(dt) for x in (b, d, e, f, h))
        sharpness_linear = dt(sharpness_linear)

        def _via_f32(fn):
            return lambda a: fn(a.astype(jnp.float32)).astype(dt)
        _rcp = _via_f32(rcp)
        _rcp_med = _via_f32(aprx_med_rcp)

        def _hmin(x, y):  # bf16 compares are unsupported on the VPU
            return jnp.where(x.astype(jnp.float32) < y.astype(jnp.float32), x, y)

        def _hmax(x, y):
            return jnp.where(x.astype(jnp.float32) > y.astype(jnp.float32), x, y)
    else:
        _rcp, _rcp_med = rcp, aprx_med_rcp
        _hmin, _hmax = hlsl_min, hlsl_max
    mn4 = jnp.minimum(min3(b, d, f), h)   # per channel (3,H,W)
    mx4 = jnp.maximum(max3(b, d, f), h)

    peak_x, peak_y = dt(1.0), dt(-4.0)
    hit_min = mn4 * _rcp(dt(4.0) * mx4)
    hit_max = (peak_x - mx4) * _rcp(dt(4.0) * mn4 + peak_y)
    lobe_rgb = _hmax(-hit_min, hit_max)
    lobe = _hmax(
        jnp.full_like(lobe_rgb[0], -dt(0.25 - 1.0 / 16.0)),
        _hmin(max3(lobe_rgb[0], lobe_rgb[1], lobe_rgb[2]),
              jnp.zeros_like(lobe_rgb[0])),
    ) * sharpness_linear

    if denoise:  # FSR_RCAS_DENOISE — off in the shipped shaders
        def luma(c):
            return c[2] * dt(0.5) + (c[0] * dt(0.5) + c[1])
        bL, dL, eL, fL, hL = luma(b), luma(d), luma(e), luma(f), luma(h)
        nz = dt(0.25) * bL + dt(0.25) * dL + dt(0.25) * fL + dt(0.25) * hL - eL
        rng = max3(max3(bL, dL, eL), fL, hL) - min3(min3(bL, dL, eL), fL, hL)
        nz = sat(jnp.abs(nz) * _rcp_med(rng))
        nz = dt(-0.5) * nz + dt(1.0)
        lobe = lobe * nz

    rcp_l = _rcp_med(dt(4.0) * lobe + dt(1.0))
    out = (lobe * b + lobe * d + lobe * h + lobe * f + e) * rcp_l
    return out
