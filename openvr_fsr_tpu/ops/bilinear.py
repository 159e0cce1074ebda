"""Bilinear sampling on XLA with static separable index/weight maps.

Implements the linear-clamp sampler used by the out-of-radius fallbacks
(src/fsr/fsr_easu.hlsl:33-36, src/nis/NIS_Upscale.hlsl:77-90) and by the NIS
chroma tap. Coordinates are axis-separable in every use here, so the gather is
two static takes and the weights are baked per-axis constants.
"""

import jax.numpy as jnp
import numpy as np

from .common import F32

__all__ = ["bilinear_axis_maps", "bilinear_sample_jax", "bilinear_fallback_fsr_jax"]


def bilinear_axis_maps(t):
    """For f32 texel-space coordinates t (numpy, any 1-D length), return
    (i0_clamped_fn inputs): floor indices and fractions."""
    t = np.asarray(t, np.float32)
    i0 = np.floor(t)
    frac = (t - i0).astype(np.float32)
    return i0.astype(np.int64), frac


def bilinear_sample_jax(rgba, u_axis, v_axis):
    """rgba: (C, H, W). u_axis: (Wo,) normalized-u numpy f32 per output column;
    v_axis: (Ho,) per output row. Returns (C, Ho, Wo).

    Texel space: t = u*W - 0.5 (f32), corners clamped to the edge."""
    c, h, w = rgba.shape
    tx = np.asarray(u_axis, np.float32) * F32(w) - F32(0.5)
    ty = np.asarray(v_axis, np.float32) * F32(h) - F32(0.5)
    x0, fx = bilinear_axis_maps(tx)
    y0, fy = bilinear_axis_maps(ty)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)

    rows0 = jnp.take(rgba, y0c, axis=1)
    rows1 = jnp.take(rgba, y1c, axis=1)
    c00 = jnp.take(rows0, x0c, axis=2)
    c10 = jnp.take(rows0, x1c, axis=2)
    c01 = jnp.take(rows1, x0c, axis=2)
    c11 = jnp.take(rows1, x1c, axis=2)

    fxj = jnp.asarray(fx)[None, None, :]
    fyj = jnp.asarray(fy)[None, :, None]
    one = F32(1.0)
    top = c00 * (one - fxj) + c10 * fxj
    bot = c01 * (one - fxj) + c11 * fxj
    return top * (one - fyj) + bot * fyj


def bilinear_fallback_fsr_jax(rgba, out_w, out_h):
    """The EASU/NIS-upscale out-of-radius fallback: sample at
    (x/outW, y/outH) — integer pixel over output size, no half-texel offset
    (fsr_easu.hlsl:34)."""
    u = np.arange(out_w, dtype=np.float32) / F32(out_w)
    v = np.arange(out_h, dtype=np.float32) / F32(out_h)
    return bilinear_sample_jax(rgba, u, v)
