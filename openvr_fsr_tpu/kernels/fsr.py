"""Fused FSR (EASU + RCAS) Pallas TPU kernel — the north-star launch.

One kernel performs, per output row band, what the reference does in two
compute dispatches plus an intermediate texture round-trip
(src/postprocess/PostProcessor.cpp:385-401, 483-496):

  1. EASU 12-tap edge-adaptive upscale (src/fsr/ffx_fsr1.h:315-437),
  2. the D3D11 UNORM store/load between the two dispatches (quantize to
     8/10-bit and back, PostProcessor.cpp:527),
  3. RCAS sharpening (ffx_fsr1.h:684-769),
  4. the foveated-radius select with bilinear fallback + debug tint
     (src/fsr/fsr_easu.hlsl:38-64, fsr_rcas.hlsl:23-55).

TPU-first design (v2 — full-width row bands, static column chunks):

  * Grid is (batch, row_band). Each band DMAs a full-width window of input
    rows HBM->VMEM (double-buffered across bands). Row-only windows need no
    x offset, so there is no lane-alignment slack anywhere: the gather
    matmuls run at their minimal inner dimension.
  * Inside the kernel a *static* Python loop walks 128-column chunks. All
    slicing is static, so Mosaic sees fixed shapes: per chunk the 12-tap
    gather is two one-hot matmul-gathers on the MXU (rows, then columns
    against a ~Kc-wide input sub-window). Texels are integer-valued and
    <= 255, hence bf16-exact: bf16 one-hot matmuls with f32 accumulation
    reproduce the gather bit-exactly, and the UNORM decode (k * 1/255)
    happens after the gather, matching utils.frames.to_planar. (10-bit
    inputs exceed bf16 integer range and use f32 HIGHEST matmuls instead.)
  * Stage-1 output is quantized and parked in a bf16 band scratch (codes
    are integers, bf16-exact); a second chunk loop decodes 5-tap slices and
    applies RCAS — the EASU->RCAS handoff never leaves VMEM.
  * The foveation circle is evaluated per 16x16 group exactly like the HLSL
    (integer centre/radius math); whole 128x128 chunks skip the EASU
    matmuls / bilinear / RCAS via a per-chunk class (0=all outside,
    1=mixed, 2=all inside) — the TPU analog of the reference's
    whole-workgroup branch.

Bit-exactness vs the NumPy oracle on real TPU was verified for the v1
tiled variant of this kernel and is asserted by tests/test_kernels_fsr.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..core import foveation as fov
from ..ops.easu import easu_core, easu_index_maps, TAP_ORDER
from ..ops.rcas import rcas_core

__all__ = ["build_fsr_fused"]

F32 = np.float32

# dy row-block order inside the stacked one-hot row-gather matrix.
_DYS = (-1, 0, 1, 2)
_DX_FULL = (0, 1)      # dx needing all 4 dy blocks (8 of the 12 taps)
_DX_MID = (-1, 2)      # dx needing only dy in {0, 1} (the other 4)

CHUNK = 128            # output-column chunk width (lane-exact)

_FORCE_HIGHEST = False  # debug: force f32 HIGHEST-precision matmul-gathers
_SKIP_STAGE1 = False    # debug/profiling: skip the EASU/bilinear chunk loop
_SKIP_RCAS = False      # debug/profiling: write quantized stage-1 directly


def _round_up(x, m):
    return -(-int(x) // m) * m


def _bilinear_axis(out_n, in_n):
    """Float32-faithful copy of ops.bilinear maps for u = arange(n)/n
    (fsr_easu.hlsl:34 fallback sampling; ops/bilinear.py:56-62)."""
    u = np.arange(out_n, dtype=np.float32) / F32(out_n)
    t = u * F32(in_n) - F32(0.5)
    i0 = np.floor(t)
    return i0.astype(np.int32), (t - i0).astype(np.float32)


def _expand_rows(arrs, n_out, tile, tile_e, grid):
    """Per-band expanded row maps: entry [g, t] = arr[clip(g*tile - 1 + t)]."""
    idx = np.clip(np.arange(grid)[:, None] * tile - 1 + np.arange(tile_e)[None, :],
                  0, n_out - 1)
    return [np.ascontiguousarray(a[idx]) for a in arrs]


def _pad_cols(arrs, n, n_pad):
    """Pad per-column maps to the chunked width with edge values."""
    return [np.concatenate([a, np.repeat(a[-1:], n_pad - n)]).copy()
            if n_pad > n else a for a in arrs]


def build_fsr_fused(batch, in_h, in_w, out_w, out_h, *, sharpness,
                    centres, color_bits=8, debug=False, band_rows=128,
                    interpret=False):
    """Build the fused stereo FSR kernel for a fixed shape/config.

    Args:
      batch, in_h, in_w, out_w, out_h: static sizes (out > in: EASU upscales).
      sharpness: the [0,1] config slider (PostProcessor.cpp:420-421 mapping).
      centres: (B, 5) int array per batch entry: cx1, cy1, cx2, cy2,
        radius_sq — the reference's imageCentre/radius cbuffer payload
        (PostProcessor.cpp:298-305).
      color_bits: 8 (RGBA8) or 10 (R10G10B10A2 passthrough).
      debug: out-of-radius tint 1-(0, .3, .3) (fsr_rcas.hlsl:46).
      band_rows: output rows per grid step (multiple of 8, or >= out_h).

    Returns fn(img) -> rgb where img is (B, 3, in_h, in_w) float32 holding
    *integer* texel values (0..2^bits-1) and rgb is (B, 3, out_h, out_w)
    float32 in [0, 1].
    """
    B = int(batch)
    H, W, OH, OW = int(in_h), int(in_w), int(out_h), int(out_w)
    TH = OH if OH <= int(band_rows) else int(band_rows)
    TH_E = TH + 2
    GY = -(-OH // TH)
    NCHUNK = -(-OW // CHUNK)
    OWP = NCHUNK * CHUNK
    TOTAL = B * GY

    cmax = F32((1 << color_bits) - 1)
    inv_cmax = F32(1.0) / cmax
    exact_bf16 = color_bits <= 8 and not _FORCE_HIGHEST  # ints <= 255: bf16-exact
    sharp_lin = C.fsr_rcas_con(C.rcas_stops_from_slider(sharpness))
    tint = (F32(0.7), F32(0.7)) if debug else None  # g,b multipliers

    in_dtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    row_align = 16 if exact_bf16 else 8  # HBM tiling: (16,128) bf16, (8,128) f32
    HP = _round_up(H, row_align)         # row-sliced DMA: rows align to sublane
    WP = _round_up(W, 128)               # ...and the full copy width to lanes

    # --- host-side static maps ------------------------------------------------
    con = C.fsr_easu_con(W, H, W, H, OW, OH)
    fxi, fyi, ppx, ppy = easu_index_maps(W, H, OW, OH, np.asarray(con[0], F32))
    bx0, fbx = _bilinear_axis(OW, W)
    by0, fby = _bilinear_axis(OH, H)
    fyi_e, ppy_e, by0_e, fby_e = _expand_rows(
        [fyi.astype(np.int32), ppy, by0, fby], OH, TH, TH_E, GY)
    fxi_p, ppx_p, bx0_p, fbx_p = _pad_cols(
        [fxi.astype(np.int32), ppx, bx0, fbx], OW, OWP)

    # per-band input row windows (rows only — full width, no x alignment)
    lo = np.minimum(np.clip(fyi_e[:, 0] - 1, 0, H - 1),
                    np.clip(by0_e[:, 0], 0, H - 1))
    hi = np.maximum(np.clip(fyi_e[:, -1] + 2, 0, H - 1),
                    np.clip(by0_e[:, -1] + 1, 0, H - 1))
    lo_a = (lo // row_align) * row_align
    IH = min(_round_up(int((hi - lo_a + 1).max()), row_align), HP)
    oy_all = np.minimum(lo_a, HP - IH).astype(np.int32)

    # per-chunk static input column windows (indices clip to [0, W-1])
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

    # per-(batch, band, chunk) foveation class over 16x16 groups covering the
    # chunk plus the RCAS halo ring
    centres = np.asarray(centres, np.int64).reshape(B, 5)
    cls = np.zeros((B, GY, NCHUNK), np.int32)
    for bi in range(B):
        cl = (centres[bi, 0], centres[bi, 1])
        cr = (centres[bi, 2], centres[bi, 3])
        gm = fov.tile_mask(OW, OH, (16, 16), (cl, cr), int(centres[bi, 4]))
        for i in range(GY):
            g0 = max(0, i * TH - 1) // 16
            g1 = min(OH - 1, i * TH + TH) // 16
            for k in range(NCHUNK):
                h0 = max(0, k * CHUNK - 1) // 16
                h1 = min(OW - 1, k * CHUNK + CHUNK) // 16
                sub = gm[g0:g1 + 1, h0:h1 + 1]
                cls[bi, i, k] = 2 if sub.all() else (1 if sub.any() else 0)
    cls_flat = cls.reshape(-1)
    cen_i32 = np.minimum(centres, np.int64(2**31 - 1)).astype(np.int32).reshape(-1)

    mm_dtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    mm_prec = None if exact_bf16 else jax.lax.Precision.HIGHEST

    def _mm(a, b):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            precision=mm_prec, preferred_element_type=jnp.float32)

    def kernel(oy_ref, cen_ref, cls_ref,
               img, fyi_r, ppy_r, by0_r, fby_r, fxi_r, ppx_r, bx0_r, fbx_r,
               out_ref, inbuf, s_easu, s_bil, qband, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i

        def dma(slot, bb, ii):
            return pltpu.make_async_copy(
                img.at[bb, :, pl.ds(pl.multiple_of(oy_ref[ii], row_align), IH)],
                inbuf.at[slot], sems.at[slot])

        @pl.when(step == 0)
        def _():
            dma(0, b, i).start()

        @pl.when(step + 1 < TOTAL)
        def _():
            dma((step + 1) % 2, (step + 1) // GY, (step + 1) % GY).start()

        slot = jax.lax.rem(step, 2)
        dma(slot, b, i).wait()

        band = inbuf[slot]  # (3, IH, W) integer texels

        def inp(c, w0):  # (IH, KC) integer-texel window of channel c
            return band[c, :, w0:w0 + KC]

        oy = oy_ref[i]
        fyi_t = fyi_r[0]          # (TH_E, 1) i32, global floor rows
        ppy_t = ppy_r[0]          # (TH_E, 1) f32

        iota_ih = jax.lax.broadcasted_iota(jnp.int32, (TH_E, IH), 1)
        iota_kc = jax.lax.broadcasted_iota(jnp.int32, (KC, CHUNK), 0)

        def row_onehot(rows):  # (TH_E, 1) global rows -> (TH_E, IH)
            return ((jnp.clip(rows, 0, H - 1) - oy) == iota_ih).astype(mm_dtype)

        # stacked one-hot row-gather matrices, shared by every chunk of the
        # band: EASU blocks [dy=-1, 0, 1, 2] and bilinear blocks [y0, y1]
        r_easu = jnp.concatenate([row_onehot(fyi_t + dy) for dy in _DYS], axis=0)
        r_bil = jnp.concatenate(
            [row_onehot(by0_r[0]), row_onehot(by0_r[0] + 1)], axis=0)

        # foveation mask per chunk (16x16 groups, i32 circle test —
        # fsr_easu.hlsl:41-45; signed i32 is exact, see core/foveation.py)
        gy_c = i * TH - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH_E, CHUNK), 0)
        gx_b = jax.lax.broadcasted_iota(jnp.int32, (TH_E, CHUNK), 1)
        gcy = (gy_c // 16) * 16 + 8

        def chunk_mask(c0):
            gx = c0 + gx_b
            gcx = (gx // 16) * 16 + 8
            d0, d1 = cen_ref[b * 5 + 0] - gcx, cen_ref[b * 5 + 1] - gcy
            d2, d3 = cen_ref[b * 5 + 2] - gcx, cen_ref[b * 5 + 3] - gcy
            rsq = cen_ref[b * 5 + 4]
            m = (d0 * d0 + d1 * d1 <= rsq) | (d2 * d2 + d3 * d3 <= rsq)
            return m, (gy_c >= 0) & (gy_c < OH) & (gx < OW)

        # ---- chunk loop 1: EASU / bilinear -> quantized band scratch --------
        for k in ([] if _SKIP_STAGE1 else range(NCHUNK)):
            c0 = k * CHUNK
            w0 = cw0[k]
            tcls = cls_ref[step * NCHUNK + k]
            fxi_c = fxi_r[k]                     # (1, CHUNK) global floor cols
            ppx_c = ppx_r[k]

            def col_onehot(cols):  # (1, CHUNK) global cols -> (KC, CHUNK)
                return (iota_kc == (jnp.clip(cols, 0, W - 1) - w0)).astype(mm_dtype)

            @pl.when(tcls > 0)
            def _(k=k, c0=c0, w0=w0, fxi_c=fxi_c, ppx_c=ppx_c,
                  col_onehot=col_onehot):
                s_cols = {dx: col_onehot(fxi_c + dx) for dx in (-1, 0, 1, 2)}
                taps = {}
                for c in range(3):
                    g = _mm(r_easu, inp(c, w0))             # (4*TH_E, KC) f32
                    for dx in _DX_FULL:
                        t = _mm(g, s_cols[dx])
                        for kk, dy in enumerate(_DYS):
                            if (dx, dy) in TAP_ORDER:
                                taps.setdefault((dx, dy), []).append(
                                    t[kk * TH_E:(kk + 1) * TH_E])
                    gmid = g[TH_E:3 * TH_E]
                    for dx in _DX_MID:
                        t = _mm(gmid, s_cols[dx])
                        for kk, dy in enumerate((0, 1)):
                            if (dx, dy) in TAP_ORDER:
                                taps.setdefault((dx, dy), []).append(
                                    t[kk * TH_E:(kk + 1) * TH_E])
                taps = {kk: jnp.stack(v, 0) * inv_cmax for kk, v in taps.items()}
                s_easu[:] = easu_core(taps, ppx_c, ppy_t)

            @pl.when(tcls < 2)
            def _(k=k, c0=c0, w0=w0, col_onehot=col_onehot):
                sb0 = col_onehot(bx0_r[k])
                sb1 = col_onehot(bx0_r[k] + 1)
                fx = fbx_r[k]
                fy = fby_r[0]
                one = F32(1.0)
                rows = []
                for c in range(3):
                    gb = _mm(r_bil, inp(c, w0))             # (2*TH_E, KC) f32
                    t0 = _mm(gb, sb0) * inv_cmax
                    t1 = _mm(gb, sb1) * inv_cmax
                    top = t0[:TH_E] * (one - fx) + t1[:TH_E] * fx
                    bot = t0[TH_E:] * (one - fx) + t1[TH_E:] * fx
                    rows.append(top * (one - fy) + bot * fy)
                s_bil[:] = jnp.stack(rows, 0)

            m_c, valid_c = chunk_mask(c0)
            stage1 = jnp.where(m_c[None], s_easu[:], s_bil[:])
            # UNORM round-trip between the dispatches (PostProcessor.cpp:527);
            # codes are integers <= cmax -> bf16-exact band storage
            q = jnp.round(jnp.clip(stage1, F32(0.0), F32(1.0)) * cmax)
            q = jnp.where(valid_c[None], q, F32(0.0))
            qband[:, :, c0:c0 + CHUNK] = q.astype(qband.dtype)

        # ---- chunk loop 2: RCAS + foveated passthrough ----------------------
        if _SKIP_RCAS:
            out_ref[0] = qband[:, 1:1 + TH, :OW].astype(jnp.float32) * inv_cmax
            return
        qv_band = qband[:].astype(jnp.float32) * inv_cmax  # (3, TH_E, OWP)
        padl = jnp.zeros((3, TH_E, 1), jnp.float32)
        for k in range(NCHUNK):
            c0 = k * CHUNK
            wlo, whi = max(c0 - 1, 0), min(c0 + CHUNK + 1, OWP)
            qc = qv_band[:, :, wlo:whi]
            if wlo == c0:        # left image border: Load() OOB returns zero
                qc = jnp.concatenate([padl, qc], axis=2)
            if whi == c0 + CHUNK:
                qc = jnp.concatenate([qc, padl], axis=2)
            e = qc[:, 1:1 + TH, 1:1 + CHUNK]
            sh = rcas_core(
                qc[:, 0:TH, 1:1 + CHUNK], qc[:, 1:1 + TH, 0:CHUNK], e,
                qc[:, 1:1 + TH, 2:2 + CHUNK], qc[:, 2:2 + TH, 1:1 + CHUNK],
                sharp_lin)
            m_in = chunk_mask(c0)[0][1:1 + TH][None]
            if tint is not None:
                fb = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
            else:
                fb = e
            cw = min(CHUNK, OW - c0)   # last chunk may be partial
            out_ref[0, :, :, c0:c0 + cw] = jnp.where(m_in, sh, fb)[:, :, :cw]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
            pl.BlockSpec((1, TH_E, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, TH, OW), lambda b, i, *_: (b, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, IH, WP), in_dtype),
            pltpu.VMEM((3, TH_E, CHUNK), jnp.float32),
            pltpu.VMEM((3, TH_E, CHUNK), jnp.float32),
            pltpu.VMEM((3, TH_E, OWP), in_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, OH, OW), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    rowmaps = [a.reshape(GY, TH_E, 1) for a in (fyi_e, ppy_e, by0_e, fby_e)]
    colmaps = [a.reshape(NCHUNK, 1, CHUNK) for a in (fxi_p, ppx_p, bx0_p, fbx_p)]
    statics = [jnp.asarray(oy_all), jnp.asarray(cen_i32), jnp.asarray(cls_flat)] \
        + [jnp.asarray(a) for a in rowmaps + colmaps]

    def fn(img):
        img = img.astype(in_dtype)  # integer texels: exact in bf16 for 8-bit
        if HP != H or WP != W:      # pad to the HBM (sublane, lane) tiling
            img = jnp.pad(img, ((0, 0), (0, 0), (0, HP - H), (0, WP - W)))
        return call(statics[0], statics[1], statics[2], img, *statics[3:])

    return fn
