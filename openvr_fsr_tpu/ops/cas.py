"""FFX CAS sharpen-only on XLA (see oracle/cas.py for provenance).

The shared `cas_core` runs identically under XLA and inside a Pallas kernel;
`cas_sharpen_jax` is the XLA op used by `api.cas_sharpen`.
"""

import jax.numpy as jnp
import numpy as np

from .common import F32, sat, aprx_lo_rcp, aprx_med_rcp, min3, max3, rcp

__all__ = ["cas_sharpen_jax", "cas_core", "cas_setup_sharp", "aprx_lo_sqrt"]


def aprx_lo_sqrt(a):
    """APrxLoSqrtF1: bitcast((bits(a)>>1) + 0x1fbc4639) (ffx_a.h:1455)."""
    import jax

    u = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (u >> jnp.uint32(1)) + jnp.uint32(0x1FBC4639), jnp.float32)


def cas_setup_sharp(sharpness):
    """CasSetup sharpness term (ffx_cas.h:391)."""
    s = min(max(float(sharpness), 0.0), 1.0)
    return F32(-1.0) * rcp(F32(8.0) + F32(s) * (F32(5.0) - F32(8.0)))


def cas_core(taps, sharp, max_color_delta):
    """CasFilter noScaling=true, CAS_BETTER_DIAGONALS, green-coef weights
    (ffx_cas.h:430-552). taps: dict (dy, dx) -> (3, H, W); channel-leading."""
    a, b, c = taps[-1, -1], taps[-1, 0], taps[-1, 1]
    d, e, f = taps[0, -1], taps[0, 0], taps[0, 1]
    g, h, i = taps[1, -1], taps[1, 0], taps[1, 1]

    mn = jnp.minimum(min3(d, e, f), jnp.minimum(b, h))
    mn = mn + jnp.minimum(min3(mn, a, c), jnp.minimum(g, i))
    mx = jnp.maximum(max3(d, e, f), jnp.maximum(b, h))
    mx = mx + jnp.maximum(max3(mx, a, c), jnp.maximum(g, i))

    amp = aprx_lo_sqrt(sat(jnp.minimum(mn, F32(2.0) - mx) * aprx_lo_rcp(mx)))
    w_g = (amp * sharp)[1:2]                 # green coefficient only
    rcp_weight = aprx_med_rcp(F32(1.0) + F32(4.0) * w_g)
    pix = sat((b * w_g + d * w_g + f * w_g + h * w_g + e) * rcp_weight)
    mcd = F32(max_color_delta)
    return jnp.minimum(jnp.maximum(pix, e - mcd), e + mcd)


def _shift_zero(rgb, dy, dx):
    padded = jnp.pad(rgb, ((0, 0), (1, 1), (1, 1)))
    _, h, w = rgb.shape
    return padded[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def cas_sharpen_jax(rgb, sharpness, max_color_delta=1.0):
    """rgb: (3, H, W) f32 in [0,1]. Returns the sharpened (3, H, W)."""
    taps = {(dy, dx): _shift_zero(rgb, dy, dx)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
    return cas_core(taps, cas_setup_sharp(sharpness), max_color_delta)
