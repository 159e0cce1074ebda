"""FFX CAS Pallas TPU kernels (upscale and sharpen-only).

The reference keeps CAS in-tree but out of the build (absent from
src/CMakeLists.txt:58-90; superseded by FSR1) — its shaders predate the
foveated-radius feature and always write alpha 1 (src/cas/cas.compute.h:
34-47). This framework ships CAS as a first-class pipeline mode with the
same foveation/debug-tint semantics as the FSR and NIS wrappers:

  * build_cas_upscale — CasFilter noScaling=false (ffx_cas.h:552-892), the
    mod's cas.upscale.hlsl flags (CAS_SHARPEN_ONLY=0, no
    CAS_BETTER_DIAGONALS). One pass sharpens AND upscales; outside the
    foveation circle a bilinear DirectCopy fallback (+ optional debug tint)
    runs instead, mirroring fsr_easu.hlsl:33-36 / NIS_Upscale.hlsl:77-90.
  * build_cas_sharpen — CasFilter noScaling=true (ffx_cas.h:430-552) with
    the maxColorDelta clamp; passthrough (+ tint) outside the circle like
    fsr_rcas.hlsl:44-47.

TPU-first design is the v3 fused-FSR scheme (kernels/fsr.py): per row
band a single one-hot row-gather matmul per channel stages all dy tap
rows + the two bilinear rows; per 128-column chunk one stacked column
matmul yields every (dy, dx) tap combination at once. CAS's 4x4 footprint
uses the same dx, dy in {-1, 0, 1, 2} offsets as EASU, but with the
Load() zero-OOB rule (ops/cas.cas_upscale_jax pads with zeros) — the
one-hot matrices encode that directly: out-of-image rows/columns are
all-zero rows of the gather matrix, so no clamp-composition blocks are
needed. The outer machine (row-band grid, DMA ring, packed-u32 IO, mask
state, zero-OOB lane taps) is the shared scaffold in kernels/_band.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import foveation as fov
from ..ops.cas import (cas_core, cas_upscale_core, cas_setup_sharp,
                       cas_upscale_index_maps)
from .fsr import _bilinear_axis  # DirectCopy bilinear maps (shared)
from . import _band as BD

__all__ = ["build_cas_upscale", "build_cas_sharpen"]

F32 = np.float32

_DYS = (-1, 0, 1, 2)
# the 12 taps CasFilter's scaling path reads (ffx_cas.h:573-587): the 4x4
# window minus its corners, keyed (dx, dy)
CAS_USED_TAPS = tuple((dx, dy) for dy in (-1, 0, 1, 2)
                      for dx in (-1, 0, 1, 2)
                      if not (dx in (-1, 2) and dy in (-1, 2)))

_CHUNK = 128


def cas_band_layout(out_w, out_h, band_rows=128, chunk=_CHUNK):
    """(TH, GY) after the CAS VMEM auto-shrink — cf. fsr.fsr_band_layout."""
    OH, OW = int(out_h), int(out_w)
    OWP_EST = BD.round_up(OW, int(chunk))
    band_rows = int(band_rows)
    while band_rows > 32 and 9 * band_rows * OWP_EST * 4 > 24 * 2**20:
        band_rows //= 2
    TH = OH if OH <= band_rows else band_rows
    return TH, -(-OH // TH)


def build_cas_upscale(batch, in_h, in_w, out_w, out_h, *, sharpness,
                      centres, color_bits=8, debug=False, band_rows=128,
                      chunk=_CHUNK, precision="full", interpret=False,
                      no_derive=False, band_range=None):
    """Build the CAS scaling kernel for a fixed shape/config.

    Args mirror kernels/fsr.build_fsr_fused; sharpness is the [0,1] CAS
    slider (CasSetup, ffx_cas.h:391). Returns fn(img) with the same packed
    u32 (8-bit) / planar f32 (10-bit) IO contract. no_derive forces the
    4-block row-gather matmul prologue (A/B of the derived-rows variant).
    band_range=(g0, g1) builds a spatial strip kernel exactly like
    fsr.build_fsr_fused(band_range=...) — global maps, sliced per band.
    """
    B = int(batch)
    H, W, OH, OW = int(in_h), int(in_w), int(out_h), int(out_w)
    TH, GY = cas_band_layout(OW, OH, band_rows, chunk)
    CHUNK = int(chunk)
    NCHUNK = -(-OW // CHUNK)
    OWP = NCHUNK * CHUNK
    TOTAL = B * GY

    import ml_dtypes
    core_dt = F32 if precision == "full" else ml_dtypes.bfloat16
    pol = BD.io_policy(color_bits)
    inv_cmax, cmax = pol.inv_cmax, pol.cmax
    sharp = cas_setup_sharp(sharpness)
    tint = (F32(0.7), F32(0.7)) if debug else None
    HP, WP = BD.input_padding(H, W)

    # ---- host-side static maps ----------------------------------------------
    fxi, ppx = cas_upscale_index_maps(W, OW)
    fyi, ppy = cas_upscale_index_maps(H, OH)
    bx0, fbx = _bilinear_axis(OW, W)
    by0, fby = _bilinear_axis(OH, H)
    # per-band output rows (clipped duplicates beyond OH on the last band —
    # masked out by the partial output block)
    rows_o = np.clip(np.arange(GY)[:, None] * TH + np.arange(TH)[None, :],
                     0, OH - 1)
    fyi_e = fyi[rows_o]                      # (GY, TH) input floor rows
    ppy_e = ppy[rows_o].astype(np.float32)
    by0_e, fby_e = by0[rows_o], fby[rows_o].astype(np.float32)
    fxi_p = np.concatenate([fxi, np.repeat(fxi[-1:], OWP - OW)]) \
        if OWP > OW else fxi
    ppx_p = np.concatenate([ppx, np.repeat(ppx[-1:], OWP - OW)]) \
        if OWP > OW else ppx
    bx0_p = np.concatenate([bx0, np.repeat(bx0[-1:], OWP - OW)]) \
        if OWP > OW else bx0
    fbx_p = np.concatenate([fbx, np.repeat(fbx[-1:], OWP - OW)]) \
        if OWP > OW else fbx

    # --- derived-rows prologue structure (mirror of kernels/fsr.py v3) ------
    # fyi is monotone with steps <= 1 inside the CAS scaling envelope
    # (<= 4x area => per-dim scale in [0.5, 1], ffx_cas.h:368-372), so the
    # 4 dy tap blocks are views of ONE extended dy=0 gather E[j] =
    # Load(fyi_u(i*TH - 2 + j)): row t of block dy equals E[t + 2 + s] for
    # a shift s taking one of two values per dy, selected by a host mask.
    # CAS taps are Load() zero-OOB (not clamped), so the derivation runs in
    # *unclamped* index space: the extended one-hot has zero rows exactly
    # where fyi_u is out of image, and target equality in sentinel space
    # implies matching zero rows. Host-verified per build; falls back to
    # the direct 4-block gather when the structure doesn't hold.
    EXT = TH + 5                         # j = t + 2 + s, s in [-2, 3]
    TPX = BD.round_up(EXT, 8)
    rows_ext = (np.arange(GY)[:, None] * TH - 2
                + np.arange(EXT)[None, :])            # unclamped out rows
    fyi_x = cas_upscale_index_maps(H, OH, rows=rows_ext)[0]  # (GY, EXT)
    row_live = (np.arange(GY)[:, None] * TH
                + np.arange(TH)[None, :]) < OH
    _SHIFTS = {-1: (-1, -2), 1: (1, 2), 2: (2, 3)}
    derive_ok = not no_derive
    dymasks = np.zeros((GY, 3, TH, 1), np.float32)    # dy -1, 1, 2: 1 = s1
    for i in range(GY):
        for mi, dy in enumerate((-1, 1, 2)):
            s1, s2 = _SHIFTS[dy]
            tgt = fyi_x[i, 2:2 + TH] + dy             # unclamped target
            m1 = fyi_x[i, 2 + s1:2 + s1 + TH] == tgt
            m2 = fyi_x[i, 2 + s2:2 + s2 + TH] == tgt
            if not ((m1 | m2) | ~row_live[i]).all():
                derive_ok = False
            dymasks[i, mi, :, 0] = m1

    # per-band input row windows (cover all valid taps incl. bilinear rows)
    lo = np.minimum(np.clip(fyi_e[:, 0] - 1, 0, H - 1),
                    np.clip(by0_e[:, 0], 0, H - 1))
    hi = np.maximum(np.clip(fyi_e[:, -1] + 2, 0, H - 1),
                    np.clip(by0_e[:, -1] + 1, 0, H - 1))
    if derive_ok:   # the extended gather may reach one in-image row further
        lo = np.minimum(lo, np.clip(fyi_x[:, 0], 0, H - 1))
        hi = np.maximum(hi, np.clip(fyi_x[:, -1], 0, H - 1))
    IH, oy_all = BD.row_windows(lo, hi, HP)

    # per-chunk static input column windows
    cw0, cKc = [], 0
    for k in range(NCHUNK):
        c0, c1 = k * CHUNK, k * CHUNK + CHUNK - 1
        klo = min(int(np.clip(fxi_p[c0] - 1, 0, W - 1)),
                  int(np.clip(bx0_p[c0], 0, W - 1)))
        khi = max(int(np.clip(fxi_p[c1] + 2, 0, W - 1)),
                  int(np.clip(bx0_p[c1] + 1, 0, W - 1)))
        cw0.append(klo)
        cKc = max(cKc, khi - klo + 1)
    KC = min(cKc, W)
    cw0 = [min(w0, W - KC) for w0 in cw0]

    # host-side foveation state: 0 outside, 1 inside, 2 out-of-image cols
    mstate, cls_flat, band_cls = BD.mask_state(
        B, centres, OW, OH, OWP, fov.TILE_FSR, rows_o, chunk=CHUNK)

    # ---- one-hot gather matrices (zero rows/cols for Load() OOB) ------------
    TP = BD.round_up(TH, 8)
    N_CAS = 4 * TP
    N_BIL = 2 * TP
    N_ROW = N_CAS + N_BIL
    iota_ih = np.arange(IH)[None, :]

    def _row_oh(rows, band, clamp):
        """rows: (TH,) global input rows -> (TP, IH); OOB rows stay zero
        unless clamp (bilinear fallback clamps like the sampler)."""
        if clamp:
            loc = np.clip(rows, 0, H - 1) - oy_all[band]
            oh = np.zeros((TP, IH), np.float32)
            oh[:TH] = (loc[:, None] == iota_ih)
        else:
            oh = np.zeros((TP, IH), np.float32)
            valid = (rows >= 0) & (rows < H)
            loc = rows - oy_all[band]
            oh[:TH] = (loc[:, None] == iota_ih) & valid[:, None]
        return oh

    if derive_ok:
        # [extended dy=0 gather (TPX rows, zero-OOB) | 2 bilinear blocks]
        N_RIN = TPX + N_BIL
        rstack = np.zeros((GY, N_RIN, IH), np.float32)
        for i in range(GY):
            valid = (fyi_x[i] >= 0) & (fyi_x[i] < H)
            loc = fyi_x[i] - oy_all[i]
            rstack[i, :EXT] = ((loc[:, None] == iota_ih)
                               & valid[:, None]).astype(np.float32)
            rstack[i, TPX:TPX + TP] = _row_oh(by0_e[i], i, True)
            rstack[i, TPX + TP:] = _row_oh(by0_e[i] + 1, i, True)
    else:
        N_RIN = N_ROW
        rstack = np.zeros((GY, N_RIN, IH), np.float32)
        for i in range(GY):
            blocks = [_row_oh(fyi_e[i] + dy, i, False) for dy in _DYS]
            blocks += [_row_oh(by0_e[i], i, True),
                       _row_oh(by0_e[i] + 1, i, True)]
            rstack[i] = np.concatenate(blocks, axis=0)

    iota_kc = np.arange(KC)[:, None]
    sstack = np.zeros((NCHUNK, KC, 6 * CHUNK), np.float32)
    for k in range(NCHUNK):
        cs = slice(k * CHUNK, k * CHUNK + CHUNK)
        blocks = []
        for dx in (-1, 0, 1, 2):
            cols = fxi_p[cs] + dx
            valid = (cols >= 0) & (cols < W)
            blocks.append(((iota_kc == (cols - cw0[k])[None, :]) &
                           valid[None, :]).astype(np.float32))
        for b0 in (np.clip(bx0_p[cs], 0, W - 1),
                   np.clip(bx0_p[cs] + 1, 0, W - 1)):
            blocks.append((iota_kc == (b0 - cw0[k])[None, :]
                           ).astype(np.float32))
        sstack[k] = np.concatenate(blocks, axis=1)

    # spatial strip slicing — mirror of kernels/fsr.py (band_range)
    in_row_base, in_rows = 0, H
    if band_range is not None:
        g0, g1 = int(band_range[0]), int(band_range[1])
        assert 0 <= g0 < g1 <= GY, (g0, g1, GY)
        in_row_base = int(oy_all[g0:g1].min())
        in_rows = int((oy_all[g0:g1] + IH).max()) - in_row_base
        oy_all = oy_all[g0:g1] - in_row_base
        rstack = rstack[g0:g1]
        mstate = mstate[:, g0:g1]
        ppy_e, fby_e = ppy_e[g0:g1], fby_e[g0:g1]
        dymasks = dymasks[g0:g1]
        cls_flat = np.asarray(cls_flat).reshape(B, GY, NCHUNK)[:, g0:g1]\
            .reshape(-1)
        band_cls = np.asarray(band_cls).reshape(B, GY)[:, g0:g1].reshape(-1)
        OH = OH - g0 * TH if g1 == GY else (g1 - g0) * TH
        GY = g1 - g0
        TOTAL = B * GY

    _mm, _mm2 = BD.mm_fns(pol)
    dyi = {dy: j for j, dy in enumerate(_DYS)}

    def kernel(oy_ref, cls_ref, bcls_ref,
               img, mst_r, rst_r, sst_r, ppy_r, fby_r, ppx_r, fbx_r, dym_r,
               out_ref, inbuf, g_rows, s_cas, s_bilx, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=pol.packed_io, ih=IH, gy=GY,
                                total=TOTAL)
        chans = BD.band_channels(inbuf, slot, pol.packed_io, 3)

        ppy_t = ppy_r[0]                     # (TH, 1)
        one = F32(1.0)

        r_all = rst_r[0]
        if derive_ok:
            # derived prologue: ONE TPX-row extended dy=0 gather per
            # channel; the 4 dy blocks are sublane slices of it (+ one
            # select for the two-shift dys). Rows TH..TP of each block
            # stay stale — matmul row i only affects output row i, and
            # the tap slices read [.. : .. + TH] only.
            m = dym_r[0]                                # (3, TH, 1) f32
            for c in range(3):
                g0 = _mm(r_all[:TPX], chans[c]).astype(g_rows.dtype)
                base = c * N_ROW
                g_rows[base:base + TH] = jnp.where(          # dy = -1
                    m[0] > F32(0.5), g0[1:1 + TH], g0[0:TH])
                g_rows[base + TP:base + TP + TH] = g0[2:2 + TH]  # dy = 0
                g_rows[base + 2 * TP:base + 2 * TP + TH] = jnp.where(
                    m[1] > F32(0.5), g0[3:3 + TH], g0[4:4 + TH])  # dy = 1
                g_rows[base + 3 * TP:base + 3 * TP + TH] = jnp.where(
                    m[2] > F32(0.5), g0[4:4 + TH], g0[5:5 + TH])  # dy = 2
                gb = _mm(r_all[TPX:], chans[c])
                g_rows[base + N_CAS:base + N_ROW] = gb.astype(g_rows.dtype)
        else:
            # fallback prologue: one full row-gather matmul per channel
            for c in range(3):
                g = _mm(r_all, chans[c])
                g_rows[c * N_ROW:(c + 1) * N_ROW] = g.astype(g_rows.dtype)

        def _cas_chunk(k, c0, w0, ppx_c):
            s_e = sst_r[k, :, :4 * CHUNK]
            taps = {}
            for c in range(3):
                ge = g_rows[c * N_ROW:c * N_ROW + N_CAS, w0:w0 + KC]
                t = _mm2(ge, s_e)            # (4*TP, 4*CHUNK)
                for (dx, dy) in CAS_USED_TAPS:
                    taps.setdefault((dx, dy), []).append(
                        t[dyi[dy] * TP:dyi[dy] * TP + TH,
                          (dx + 1) * CHUNK:(dx + 2) * CHUNK])
            taps = {kk: jnp.stack(v, 0) * inv_cmax for kk, v in taps.items()}
            s_cas[:, :, c0:c0 + CHUNK] = cas_upscale_core(
                taps, ppx_c, ppy_t, sharp, dt=core_dt).astype(jnp.float32)

        def _bil_chunk(k, c0, w0):
            s_b = sst_r[k, :, 4 * CHUNK:]
            fxc = fbx_r[k]
            for c in range(3):
                gb = g_rows[c * N_ROW + N_CAS:(c + 1) * N_ROW, w0:w0 + KC]
                t = _mm2(gb, s_b)            # (2*TP, 2*CHUNK)
                for yb in range(2):
                    ty = t[yb * TP:yb * TP + TH]
                    t0 = ty[:, :CHUNK] * inv_cmax
                    t1 = ty[:, CHUNK:] * inv_cmax
                    s_bilx[c, yb * TH:(yb + 1) * TH, c0:c0 + CHUNK] = \
                        t0 * (one - fxc) + t1 * fxc

        def _chunk_loop(mode):
            for k in range(NCHUNK):
                c0 = k * CHUNK
                w0 = cw0[k]
                ppx_c = ppx_r[k]
                if mode == "bil":
                    _bil_chunk(k, c0, w0)
                elif mode == "cas":
                    _cas_chunk(k, c0, w0, ppx_c)
                else:
                    tcls = cls_ref[step * NCHUNK + k]
                    pl.when(tcls > 0)(
                        lambda k=k, c0=c0, w0=w0, p=ppx_c:
                        _cas_chunk(k, c0, w0, p))
                    pl.when(tcls < 2)(
                        lambda k=k, c0=c0, w0=w0: _bil_chunk(k, c0, w0))

        bcls = bcls_ref[step]
        pl.when(bcls == 0)(lambda: _chunk_loop("bil"))
        pl.when(bcls != 0)(lambda: _chunk_loop("both"))

        # band epilogue: y-lerp fallback, foveated select, tint, UNORM store
        ms = mst_r[0, 0].astype(jnp.int32)   # (TH, OWP)
        fy = fby_r[0]                        # (TH, 1)
        bil = s_bilx[:, :TH] * (one - fy) + s_bilx[:, TH:] * fy
        if tint is not None:
            bil = jnp.stack([bil[0], bil[1] * tint[0], bil[2] * tint[1]], 0)
        res = jnp.where((ms == 1)[None], s_cas[:], bil)
        if pol.packed_io:
            BD.pack_store_u32(out_ref, res, None, cmax, OW)
        else:
            out_ref[0] = res[:, :, :OW]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, TH, OWP), lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, N_RIN, IH), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((NCHUNK, KC, 6 * CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((1, TH, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((1, 3, TH, 1), lambda b, i, *_: (i, 0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, TH, OW), lambda b, i, *_: (b, i, 0))
                   if pol.packed_io else
                   pl.BlockSpec((1, 3, TH, OW), lambda b, i, *_: (b, 0, i, 0))),
        scratch_shapes=[
            (pltpu.VMEM((2, IH, WP), jnp.uint32) if pol.packed_io
             else pltpu.VMEM((2, 3, IH, WP), jnp.float32)),
            pltpu.VMEM((3 * N_ROW, WP), pol.mm_dtype),
            pltpu.VMEM((3, TH, OWP), jnp.float32),
            pltpu.VMEM((3, 2 * TH, OWP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, OH, OW), jnp.uint32)
                   if pol.packed_io else
                   jax.ShapeDtypeStruct((B, 3, OH, OW), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    rowmaps = [ppy_e.reshape(GY, TH, 1), fby_e.reshape(GY, TH, 1)]
    colmaps = [ppx_p.reshape(NCHUNK, 1, CHUNK).astype(np.float32),
               fbx_p.reshape(NCHUNK, 1, CHUNK)]
    statics = [jnp.asarray(oy_all), jnp.asarray(cls_flat),
               jnp.asarray(band_cls), jnp.asarray(mstate),
               jnp.asarray(rstack, pol.mm_dtype),
               jnp.asarray(sstack, pol.mm_dtype)] \
        + [jnp.asarray(a) for a in rowmaps + colmaps] \
        + [jnp.asarray(dymasks)]

    io_h, io_hp = (H, HP) if band_range is None else (in_rows, in_rows)
    fn = BD.make_io_fn(
        lambda img: call(statics[0], statics[1], statics[2], img,
                         *statics[3:]),
        io_h, W, io_hp, WP, pol.packed_io,
        geom=dict(batch=B, gy=GY, ih=IH, th=TH, out_h=OH, out_w=OW,
                  oy=np.asarray(oy_all)))
    fn.derived_rows = derive_ok   # lets tests pin the prologue actually taken
    if band_range is not None:
        fn.band_range = (int(band_range[0]), int(band_range[1]))
        fn.in_row_base = in_row_base
        fn.in_rows = in_rows
        fn.out_rows = OH
    return fn


def build_cas_sharpen(batch, h, w, *, sharpness, centres, color_bits=8,
                      debug=False, band_rows=256, max_color_delta=1.0,
                      precision="full", interpret=False):
    """CAS sharpen-only kernel (CasFilter noScaling=true, ffx_cas.h:430-552)
    — the structural sibling of kernels/rcas.build_rcas_sharpen with CAS's
    3x3 footprint and maxColorDelta clamp. Same IO contract."""
    import ml_dtypes
    core_dt = F32 if precision == "full" else ml_dtypes.bfloat16
    B, H, W = int(batch), int(h), int(w)
    TH = H if H <= int(band_rows) else int(band_rows)
    TH_E = TH + 2
    GY = -(-H // TH)
    TOTAL = B * GY

    pol = BD.io_policy(color_bits)
    inv_cmax, inv_amax, cmax = pol.inv_cmax, pol.inv_amax, pol.cmax
    sharp = cas_setup_sharp(sharpness)
    tint = (F32(0.7), F32(0.7)) if debug else None
    HP, WP = BD.input_padding(H, W)

    rows_e = np.clip(np.arange(GY)[:, None] * TH - 1
                     + np.arange(TH_E)[None, :], 0, H - 1)
    IH, oy_all = BD.row_windows(rows_e[:, 0], rows_e[:, -1], HP)

    rstack = np.zeros((GY, TH_E, IH), np.float32)
    for i in range(GY):
        rstack[i] = (rows_e[i] - oy_all[i])[:, None] == np.arange(IH)[None, :]

    row_ok = ((np.arange(GY)[:, None] * TH - 1 + np.arange(TH_E)[None, :] >= 0)
              & (np.arange(GY)[:, None] * TH - 1
                 + np.arange(TH_E)[None, :] < H))
    mstate, _, _ = BD.mask_state(B, centres, W, H, WP, fov.TILE_FSR,
                                 rows_e, row_ok)

    _mm, _ = BD.mm_fns(pol)

    def kernel(oy_ref, img, mst_r, rst_r, out_ref, inbuf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=pol.packed_io, ih=IH, gy=GY,
                                total=TOTAL)
        rsel = rst_r[0]
        band = BD.band_channels(inbuf, slot, pol.packed_io, 4)

        ms = mst_r[0, 0].astype(jnp.int32)
        gathered = jnp.stack([_mm(rsel, band[c]) for c in range(4)], 0)
        masked = jnp.where((ms != 2)[None], gathered, F32(0.0))
        if inv_amax == inv_cmax:     # 8-bit: one fused scalar multiply
            dec = masked * inv_cmax
        else:                        # 10-bit: 2-bit alpha decodes a/3
            dec = jnp.concatenate(
                [masked[:3] * inv_cmax, masked[3:] * inv_amax], axis=0)

        qv = dec[:3]
        # CasLoad zero-OOB taps via lane rotates for each of the 3 dy rows
        taps = {}
        for dy in (-1, 0, 1):
            r = qv[:, 1 + dy:1 + dy + TH]
            lf, rt = BD.htaps_zero_oob(r, WP, W)
            taps[dy, -1], taps[dy, 0], taps[dy, 1] = lf, r, rt
        e = taps[0, 0]
        sh = cas_core(taps, sharp, max_color_delta,
                      dt=core_dt).astype(jnp.float32)
        m_in = (ms[1:1 + TH] == 1)[None]
        if tint is not None:
            fb = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
        else:
            fb = e
        rgb = jnp.where(m_in, sh, fb)
        alpha_src = dec[3:4][:, 1:1 + TH]
        alpha = jnp.where(m_in, F32(1.0), alpha_src)
        if pol.packed_io:
            BD.pack_store_u32(out_ref, rgb, alpha[0], cmax, W)
        else:
            out_ref[0] = jnp.concatenate([rgb, alpha], axis=0)[:, :, :W]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, TH_E, WP), lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, TH_E, IH), lambda b, i, *_: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, TH, W), lambda b, i, *_: (b, i, 0))
                   if pol.packed_io else
                   pl.BlockSpec((1, 4, TH, W), lambda b, i, *_: (b, 0, i, 0))),
        scratch_shapes=[
            (pltpu.VMEM((2, IH, WP), jnp.uint32) if pol.packed_io
             else pltpu.VMEM((2, 4, IH, WP), jnp.float32)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.uint32)
                   if pol.packed_io else
                   jax.ShapeDtypeStruct((B, 4, H, W), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    statics = [jnp.asarray(oy_all), jnp.asarray(mstate),
               jnp.asarray(rstack, pol.mm_dtype)]

    return BD.make_io_fn(
        lambda img: call(statics[0], img, statics[1], statics[2]),
        H, W, HP, WP, pol.packed_io,
        geom=dict(batch=B, gy=GY, ih=IH, th=TH, out_h=H, out_w=W,
                  oy=np.asarray(oy_all)))
