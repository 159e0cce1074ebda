"""FFX CAS sharpen-only on XLA (see oracle/cas.py for provenance).

The shared `cas_core` runs identically under XLA and inside a Pallas kernel;
`cas_sharpen_jax` is the XLA op used by `api.cas_sharpen`.
"""

import jax.numpy as jnp
import numpy as np

from .common import F32, sat, aprx_lo_rcp, aprx_med_rcp, min3, max3, rcp

__all__ = ["cas_sharpen_jax", "cas_core", "cas_setup_sharp", "aprx_lo_sqrt",
           "cas_upscale_core", "cas_upscale_jax", "CAS_TAP_OFFSETS"]

# 4x4 footprint of the scaling path (ffx_cas.h:554-587), (dx, dy) keys
CAS_TAP_OFFSETS = tuple((dx, dy) for dy in (-1, 0, 1, 2)
                        for dx in (-1, 0, 1, 2))


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


def cas_core(taps, sharp, max_color_delta, dt=F32):
    """CasFilter noScaling=true, CAS_BETTER_DIAGONALS, green-coef weights
    (ffx_cas.h:430-552). taps: dict (dy, dx) -> (3, H, W); channel-leading.
    dt=bfloat16 is the relaxed-precision fast mode (CasFilterH analog,
    ffx_cas.h:902+); the bitcast approximations then evaluate in f32."""
    if dt is not F32:
        taps = {k: v.astype(dt) for k, v in taps.items()}

        def via_f32(fn):
            return lambda x: fn(x.astype(jnp.float32)).astype(dt)
        lo_sqrt, lo_rcp, med_rcp = (via_f32(aprx_lo_sqrt),
                                    via_f32(aprx_lo_rcp),
                                    via_f32(aprx_med_rcp))
    else:
        lo_sqrt, lo_rcp, med_rcp = aprx_lo_sqrt, aprx_lo_rcp, aprx_med_rcp
    a, b, c = taps[-1, -1], taps[-1, 0], taps[-1, 1]
    d, e, f = taps[0, -1], taps[0, 0], taps[0, 1]
    g, h, i = taps[1, -1], taps[1, 0], taps[1, 1]

    mn = jnp.minimum(min3(d, e, f), jnp.minimum(b, h))
    mn = mn + jnp.minimum(min3(mn, a, c), jnp.minimum(g, i))
    mx = jnp.maximum(max3(d, e, f), jnp.maximum(b, h))
    mx = mx + jnp.maximum(max3(mx, a, c), jnp.maximum(g, i))

    def sat_dt(x):  # sat() in dt (ops.common.sat's F32 scalars would promote)
        return jnp.minimum(dt(1.0), jnp.maximum(dt(0.0), x))

    amp = lo_sqrt(sat_dt(jnp.minimum(mn, dt(2.0) - mx) * lo_rcp(mx)))
    w_g = (amp * dt(sharp))[1:2]             # green coefficient only
    rcp_weight = med_rcp(dt(1.0) + dt(4.0) * w_g)
    pix = sat_dt((b * w_g + d * w_g + f * w_g + h * w_g + e) * rcp_weight)
    mcd = dt(max_color_delta)
    return jnp.minimum(jnp.maximum(pix, e - mcd), e + mcd)


def cas_upscale_core(taps, ppx, ppy, sharp, dt=F32):
    """CasFilter noScaling=false (ffx_cas.h:552-892) given the 16 gathered
    taps — the mod's upscale shader flags: CAS_SHARPEN_ONLY=0 and *no*
    CAS_BETTER_DIAGONALS (src/cas/cas.upscale.hlsl), fast approximations,
    green-coefficient weighting. No maxColorDelta clamp on this path
    (ffx_cas.h:876-878). Pure jnp — shared by the XLA op and the Pallas
    kernel (same f32 op order as oracle/cas.cas_upscale_oracle).

    taps: dict (dx, dy) -> (3, h, w) channel-leading arrays.
    ppx/ppy: fractional coords broadcastable against (h, w).
    dt=bfloat16 is the relaxed-precision fast mode (CasFilterH analog,
    ffx_cas.h:902+); the bitcast approximations then evaluate in f32.
    """
    if dt is not F32:
        taps = {k: v.astype(dt) for k, v in taps.items()}
        ppx, ppy = jnp.asarray(ppx).astype(dt), jnp.asarray(ppy).astype(dt)

        def via_f32(fn):
            return lambda x: fn(x.astype(jnp.float32)).astype(dt)
        lo_sqrt, lo_rcp, med_rcp = (via_f32(aprx_lo_sqrt),
                                    via_f32(aprx_lo_rcp),
                                    via_f32(aprx_med_rcp))
    else:
        lo_sqrt, lo_rcp, med_rcp = aprx_lo_sqrt, aprx_lo_rcp, aprx_med_rcp

    def sat_dt(x):
        return jnp.minimum(dt(1.0), jnp.maximum(dt(0.0), x))

    one = dt(1.0)
    b, c = taps[(0, -1)], taps[(1, -1)]
    e, f, g, h = taps[(-1, 0)], taps[(0, 0)], taps[(1, 0)], taps[(2, 0)]
    i, j, k, ll = taps[(-1, 1)], taps[(0, 1)], taps[(1, 1)], taps[(2, 1)]
    n, o = taps[(0, 2)], taps[(1, 2)]

    def soft_g(up, lf, ce, rt, dn):  # green-channel 5-tap soft min/max
        mn = jnp.minimum(min3(up, lf, ce), jnp.minimum(rt, dn))
        mx = jnp.maximum(max3(up, lf, ce), jnp.maximum(rt, dn))
        return mn, mx

    G = 1
    mnf, mxf = soft_g(b[G], e[G], f[G], g[G], j[G])
    mng, mxg = soft_g(c[G], f[G], g[G], h[G], k[G])
    mnj, mxj = soft_g(f[G], i[G], j[G], k[G], n[G])
    mnk, mxk = soft_g(g[G], j[G], k[G], ll[G], o[G])

    def weight(mn, mx):
        amp = lo_sqrt(sat_dt(jnp.minimum(mn, one - mx) * lo_rcp(mx)))
        return amp * dt(sharp)

    wf, wg = weight(mnf, mxf), weight(mng, mxg)
    wj, wk = weight(mnj, mxj), weight(mnk, mxk)

    s = (one - ppx) * (one - ppy)
    t = ppx * (one - ppy)
    u = (one - ppx) * ppy
    v = ppx * ppy
    thin = dt(1.0 / 32.0)
    s = s * lo_rcp(thin + (mxf - mnf))
    t = t * lo_rcp(thin + (mxg - mng))
    u = u * lo_rcp(thin + (mxj - mnj))
    v = v * lo_rcp(thin + (mxk - mnk))

    qbe = wf * s
    qch = wg * t
    qf = wg * t + wj * u + s
    qg = wf * s + wk * v + t
    qj = wf * s + wk * v + u
    qk = wg * t + wj * u + v
    qin = wj * u
    qlo = wk * v
    rcp_w = med_rcp(dt(2.0) * qbe + dt(2.0) * qch + dt(2.0) * qin
                    + dt(2.0) * qlo + qf + qg + qj + qk)[None]
    return sat_dt((b * qbe + e * qbe + c * qch + h * qch + i * qin + n * qin
                   + ll * qlo + o * qlo + f * qf + g * qg + j * qj + k * qk)
                  * rcp_w)


def cas_upscale_index_maps(in_n, out_n, rows=None):
    """Per-axis pp maps (ffx_cas.h:385-388, 568-571), f32-faithful numpy.

    rows: optional integer array of output positions to evaluate at —
    may extend beyond [0, out_n) (used by the derived-rows prologue in
    kernels/cas.py, which needs the unclamped map on a halo of virtual
    output rows). Defaults to arange(out_n). The f32 op order is identical
    either way, so in-range values match exactly."""
    scale = np.float32(in_n) * rcp(np.float32(out_n))
    off = F32(0.5) * np.float32(in_n) * rcp(np.float32(out_n)) - F32(0.5)
    if rows is None:
        rows = np.arange(out_n)
    pp = (np.asarray(rows).astype(np.float32) * scale + off
          ).astype(np.float32)
    fp = np.floor(pp)
    return fp.astype(np.int64), (pp - fp).astype(np.float32)


def cas_upscale_jax(rgb, sharpness, out_w, out_h):
    """rgb: (3, H, W) f32 in [0,1]. Returns (3, out_h, out_w) f32."""
    _, h, w = rgb.shape
    fx, ppx = cas_upscale_index_maps(w, out_w)
    fy, ppy = cas_upscale_index_maps(h, out_h)
    pad = jnp.pad(rgb, ((0, 0), (1, 3), (1, 3)))  # CasLoad OOB -> zero

    def tap(dx, dy):
        ys = np.clip(fy + dy + 1, 0, h + 3)
        xs = np.clip(fx + dx + 1, 0, w + 3)
        return jnp.take(jnp.take(pad, ys, axis=1), xs, axis=2)

    taps = {off: tap(*off) for off in CAS_TAP_OFFSETS}
    return cas_upscale_core(taps, jnp.asarray(ppx)[None, :],
                            jnp.asarray(ppy)[:, None],
                            cas_setup_sharp(sharpness))


def _shift_zero(rgb, dy, dx):
    padded = jnp.pad(rgb, ((0, 0), (1, 1), (1, 1)))
    _, h, w = rgb.shape
    return padded[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def cas_sharpen_jax(rgb, sharpness, max_color_delta=1.0):
    """rgb: (3, H, W) f32 in [0,1]. Returns the sharpened (3, H, W)."""
    taps = {(dy, dx): _shift_zero(rgb, dy, dx)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
    return cas_core(taps, cas_setup_sharp(sharpness), max_color_delta)
