"""EASU on XLA: planar (3, H, W) channels, static gather maps.

Math is a line-faithful port of FsrEasuF (reference src/fsr/ffx_fsr1.h:315-437)
— see oracle/easu.py for the tap-footprint derivation. The gather of the 12
taps is separable (row map depends only on the output row, column map only on
the output column), so each tap is two static `take`s baked at trace time.
"""

import jax.numpy as jnp
import numpy as np

from .common import (F32, aprx_lo_rcp, aprx_lo_rsq, rcp, rcp_ieee, sat,
                     min3, max3)

__all__ = ["easu_jax", "easu_index_maps", "easu_core", "easu_core_split",
           "TAP_ORDER"]

_TAP_ORDER = [  # exact FsrEasuF accumulation order (ffx_fsr1.h:423-434)
    (0, -1), (1, -1), (-1, 1), (0, 1), (0, 0), (-1, 0),
    (1, 1), (2, 1), (2, 0), (1, 0), (1, 2), (0, 2),
]
TAP_ORDER = _TAP_ORDER


def _easu_fns(dt):
    """The approximation intrinsics for the chosen math dtype (bf16 mode
    routes the ffx_a.h bit approximations through f32 — the fp16 magic
    constants have no bf16 equivalent; bf16 compares are unsupported on
    the VPU)."""
    if dt is not F32:
        def _via_f32(fn):
            return lambda a: fn(a.astype(jnp.float32)).astype(dt)

        def _lt(a, c):
            return a.astype(jnp.float32) < F32(c)
        return (_via_f32(aprx_lo_rcp), _via_f32(aprx_lo_rsq),
                _via_f32(rcp), _lt)

    def _lt(a, c):
        return a < F32(c)
    return aprx_lo_rcp, aprx_lo_rsq, rcp, _lt


def _easu_weights(L, ppx, ppy, dt):
    """Direction/anisotropy analysis from the luma dict L
    (ffx_fsr1.h:368-421). Returns (tap_w, z): an on-demand per-tap weight
    function and a zero plane for the accumulators. Shared by the stacked
    and channel-split cores — the weight math never touches color
    channels."""
    _rcp_lo, _rsq_lo, _rcp_ex, _lt = _easu_fns(dt)
    bL, cL = L[(0, -1)], L[(1, -1)]
    eL, fL, gL, hL = L[(-1, 0)], L[(0, 0)], L[(1, 0)], L[(2, 0)]
    iL, jL, kL, lL = L[(-1, 1)], L[(0, 1)], L[(1, 1)], L[(2, 1)]
    nL, oL = L[(0, 2)], L[(1, 2)]

    one = dt(1.0)

    def easu_set(acc, which, lA, lB, lC, lD, lE):
        dir_x, dir_y, length = acc
        if which == "s":
            w = (one - ppx) * (one - ppy)
        elif which == "t":
            w = ppx * (one - ppy)
        elif which == "u":
            w = (one - ppx) * ppy
        else:
            w = ppx * ppy
        dc = lD - lC
        cb = lC - lB
        lenX = _rcp_lo(jnp.maximum(jnp.abs(dc), jnp.abs(cb)))
        dirX = lD - lB
        dir_x = dir_x + dirX * w
        lenX = sat(jnp.abs(dirX) * lenX)
        length = length + (lenX * lenX) * w
        ec = lE - lC
        ca = lC - lA
        lenY = _rcp_lo(jnp.maximum(jnp.abs(ec), jnp.abs(ca)))
        dirY = lE - lA
        dir_y = dir_y + dirY * w
        lenY = sat(jnp.abs(dirY) * lenY)
        length = length + (lenY * lenY) * w
        return dir_x, dir_y, length

    z = jnp.zeros(jnp.broadcast_shapes(fL.shape, (ppx * ppy).shape), dt)
    acc = (z, z, z)
    acc = easu_set(acc, "s", bL, eL, fL, gL, jL)
    acc = easu_set(acc, "t", cL, fL, gL, hL, kL)
    acc = easu_set(acc, "u", fL, iL, jL, kL, nL)
    acc = easu_set(acc, "v", gL, jL, kL, lL, oL)
    dir_x, dir_y, length = acc

    dirR = dir_x * dir_x + dir_y * dir_y
    zro = _lt(dirR, 1.0 / 32768.0)
    dirR = _rsq_lo(dirR)
    dirR = jnp.where(zro, one, dirR)
    dir_x = jnp.where(zro, one, dir_x)
    dir_x = dir_x * dirR
    dir_y = dir_y * dirR

    length = length * dt(0.5)
    length = length * length
    stretch = (dir_x * dir_x + dir_y * dir_y) * _rcp_lo(
        jnp.maximum(jnp.abs(dir_x), jnp.abs(dir_y)))
    len2_x = one + (stretch - one) * length
    len2_y = one + dt(-0.5) * length
    lob = dt(0.5) + dt((1.0 / 4.0 - 0.04) - 0.5) * length
    clp = _rcp_lo(lob)

    # Shared per-offset product planes: in FsrEasuTapF (ffx_fsr1.h:250-253)
    #   vx = off_x*dir_x + off_y*dir_y,  vy = off_x*(-dir_y) + off_y*dir_x
    # and off_x/off_y depend on dx/dy ALONE — so the four products are
    # computed once per distinct offset component (4 dx values, 4 dy
    # values) instead of once per tap. The per-tap work shrinks to two
    # adds. Bit-identical: the product values and the final-add rounding
    # are exactly the original op-for-op sequence, just de-duplicated
    # (measured ~0.2 ms/pair on the fused kernel, tools/ab_fsr.py r5).
    ndir_y = -dir_y
    _dxs, _dys = (-1, 0, 1, 2), (-1, 0, 1, 2)
    offx = {dx: dt(float(dx)) - ppx for dx in _dxs}
    offy = {dy: dt(float(dy)) - ppy for dy in _dys}
    pvx_x = {dx: offx[dx] * dir_x for dx in _dxs}
    pvx_y = {dy: offy[dy] * dir_y for dy in _dys}
    pvy_x = {dx: offx[dx] * ndir_y for dx in _dxs}
    pvy_y = {dy: offy[dy] * dir_x for dy in _dys}

    def tap_w(dx, dy):
        """The (dx, dy) tap weight — computed on demand so only one weight
        plane is live at a time in the accumulation loops (exact FsrEasuTapF
        op order, ffx_fsr1.h:239-272, with the shared products above)."""
        vx = pvx_x[dx] + pvx_y[dy]
        vy = pvy_x[dx] + pvy_y[dy]
        vx = vx * len2_x
        vy = vy * len2_y
        d2 = jnp.minimum(vx * vx + vy * vy, clp)
        wB = dt(2.0 / 5.0) * d2 + dt(-1.0)
        wA = lob * d2 + dt(-1.0)
        wB = wB * wB
        wA = wA * wA
        wB = dt(25.0 / 16.0) * wB + dt(-(25.0 / 16.0 - 1.0))
        return wB * wA

    return tap_w, z


def easu_core(taps, ppx, ppy, dt=F32):
    """The FsrEasuF math after the 12 taps are gathered (ffx_fsr1.h:363-437).

    taps: dict (dx, dy) -> (C, h, w) arrays for the 12 offsets in TAP_ORDER.
    ppx/ppy: fractional coordinates broadcastable against (h, w) — typically
    (1, w) and (h, 1). Pure jnp, so it runs identically under XLA and inside
    a Pallas kernel (same f32 op ordering as the HLSL).

    dt: constant dtype — np.float32 (default, parity) or ml_dtypes.bfloat16
    for the relaxed-precision fast mode, the analog of the reference's
    packed-fp16 FsrEasuH (ffx_fsr1.h:445-594).
    Returns the dering-clamped (C, h, w) RGB."""
    if dt is not F32:
        taps = {k: v.astype(dt) for k, v in taps.items()}
        ppx, ppy = jnp.asarray(ppx).astype(dt), jnp.asarray(ppy).astype(dt)
    _rcp_lo, _rsq_lo, _rcp_ex, _lt = _easu_fns(dt)

    def luma(c):  # luma*2: B*0.5 + (R*0.5 + G)  (ffx_fsr1.h:363-366)
        return c[2] * dt(0.5) + (c[0] * dt(0.5) + c[1])

    L = {off: luma(taps[off]) for off in taps}
    tap_w, z = _easu_weights(L, ppx, ppy, dt)

    cf, cg, cj, ck = taps[(0, 0)], taps[(1, 0)], taps[(0, 1)], taps[(1, 1)]
    min4 = jnp.minimum(min3(cf, ck, cj), cg)
    max4 = jnp.maximum(max3(cf, ck, cj), cg)

    aC = jnp.zeros(taps[(0, 0)].shape, dt)
    aW = z
    for dx, dy in _TAP_ORDER:
        w = tap_w(dx, dy)
        aC = aC + taps[(dx, dy)] * w[None]
        aW = aW + w

    return jnp.minimum(max4, jnp.maximum(min4, aC * _rcp_ex(aW)[None]))


def easu_core_split(taps, ppx, ppy, dt=F32, exact_div=False):
    """easu_core with channel-split taps: dict (dx, dy) -> [r, g, b] lists
    of 2-D planes. Identical f32 op order per element (the weight math is
    the same function; the per-channel accumulation is the same multiply/
    add without the channel-stacked intermediates) — used by the Pallas
    kernel, where stacking 12 (3, th, chunk) tap arrays per chunk costs
    real VMEM copies. Returns [r, g, b].

    exact_div=True replaces the one true division of the resolve
    (aC * ARcpF1(aW), ffx_fsr1.h:434) with the exactly-rounded rcp_ieee —
    used by the Pallas TPU kernel, whose native f32 division is ~1 ulp off
    IEEE and was the sole source of >1-LSB parity drift vs the oracle
    (PARITY_r02.json; tools/numerics_probe.py)."""
    if dt is not F32:
        taps = {k: [p.astype(dt) for p in v] for k, v in taps.items()}
        ppx, ppy = jnp.asarray(ppx).astype(dt), jnp.asarray(ppy).astype(dt)
    _rcp_lo, _rsq_lo, _rcp_ex, _lt = _easu_fns(dt)
    if exact_div and dt is F32:
        _rcp_ex = rcp_ieee

    L = {off: c[2] * dt(0.5) + (c[0] * dt(0.5) + c[1])
         for off, c in taps.items()}
    tap_w, z = _easu_weights(L, ppx, ppy, dt)

    cf, cg, cj, ck = taps[(0, 0)], taps[(1, 0)], taps[(0, 1)], taps[(1, 1)]
    # one weight plane live at a time: accumulate all three channels (and
    # aW) inside the tap loop, like the HLSL
    aC = [jnp.zeros_like(z) for _ in range(3)]
    aW = z
    for dx, dy in _TAP_ORDER:
        w = tap_w(dx, dy)
        for c in range(3):
            aC[c] = aC[c] + taps[(dx, dy)][c] * w
        aW = aW + w
    inv_w = _rcp_ex(aW)
    out = []
    for c in range(3):
        min4 = jnp.minimum(min3(cf[c], ck[c], cj[c]), cg[c])
        max4 = jnp.maximum(max3(cf[c], ck[c], cj[c]), cg[c])
        out.append(jnp.minimum(max4, jnp.maximum(min4, aC[c] * inv_w)))
    return out


def easu_index_maps(in_w, in_h, out_w, out_h, con0):
    """Static (numpy) per-axis index and fraction maps.

    Returns (fxi, fyi, ppx, ppy): int64 floor maps and f32 fractions, where
    pp = ip*con0.xy + con0.zw (ffx_fsr1.h:324-326)."""
    ix = np.arange(out_w, dtype=np.float32)
    iy = np.arange(out_h, dtype=np.float32)
    ppx = ix * con0[0] + con0[2]
    ppy = iy * con0[1] + con0[3]
    fpx = np.floor(ppx)
    fpy = np.floor(ppy)
    return (
        fpx.astype(np.int64),
        fpy.astype(np.int64),
        (ppx - fpx).astype(np.float32),
        (ppy - fpy).astype(np.float32),
    )


def easu_jax(rgb, out_w, out_h, con):
    """rgb: (3, H_in, W_in) f32 in [0,1]. con: fsr_easu_con tuple (numpy).
    Returns (3, out_h, out_w) f32."""
    con0 = np.asarray(con[0], np.float32)
    _, h_in, w_in = rgb.shape
    fxi, fyi, ppx_np, ppy_np = easu_index_maps(w_in, h_in, out_w, out_h, con0)
    ppx = jnp.asarray(ppx_np)[None, :]          # (1, Wo)
    ppy = jnp.asarray(ppy_np)[:, None]          # (Ho, 1)

    def tap(dx, dy):
        ys = np.clip(fyi + dy, 0, h_in - 1)
        xs = np.clip(fxi + dx, 0, w_in - 1)
        return jnp.take(jnp.take(rgb, ys, axis=1), xs, axis=2)  # (3, Ho, Wo)

    taps = {off: tap(*off) for off in set(_TAP_ORDER)}
    return easu_core(taps, ppx, ppy)
