"""Fused FSR (EASU + RCAS) Pallas TPU kernel — the north-star launch.

One kernel performs, per output tile, what the reference does in two compute
dispatches plus an intermediate texture round-trip
(src/postprocess/PostProcessor.cpp:385-401, 483-496):

  1. EASU 12-tap edge-adaptive upscale (src/fsr/ffx_fsr1.h:315-437) on a
     (TILE+2)^2 expanded tile — the +1 ring is recomputed so stage 2 never
     leaves VMEM,
  2. the D3D11 UNORM8 store/load between the two dispatches (quantize to
     8-bit and back, PostProcessor.cpp:527),
  3. RCAS sharpening (ffx_fsr1.h:684-769) on the interior,
  4. the foveated-radius select with bilinear fallback + debug tint
     (src/fsr/fsr_easu.hlsl:38-64, fsr_rcas.hlsl:23-55).

TPU-first design choices:
  * The 12-tap gather is two one-hot matmul-gathers on the MXU (rows then
    columns). Input texels are integer-valued (0..255 or 0..1023), so with
    bf16 one-hot operands and f32 accumulation the selection is bit-exact;
    the UNORM decode (k * 1/255) happens after the gather, matching
    utils.frames.to_planar exactly.
  * Input windows are data-dependent (floor(op*scale+off) per tile), so the
    kernel DMAs its own input window HBM->VMEM with per-tile origins from
    scalar prefetch, double-buffered across grid steps.
  * The foveation circle is evaluated per 16x16 group exactly like the HLSL
    (integer centre/radius math), and whole tiles skip the EASU matmuls /
    bilinear path via a per-tile class (0=all outside, 1=mixed, 2=all
    inside) — the TPU analog of the reference's whole-workgroup branch.
"""

import functools

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
# which dy blocks each needed dx column-gather applies to (the 12 EASU taps:
# dy=-1:dx{0,1}  dy=0:dx{-1..2}  dy=1:dx{-1..2}  dy=2:dx{0,1})
_DX_FULL = (0, 1)      # dx needing all 4 dy blocks
_DX_MID = (-1, 2)      # dx needing only dy in {0, 1}


_FORCE_HIGHEST = False  # debug: force f32 HIGHEST-precision matmul-gathers
_DEBUG_STAGE1 = 0   # debug: emit pre-quantize stage-1 instead of the final


def _round_up(x, m):
    return -(-int(x) // m) * m


def _bilinear_axis(out_n, in_n):
    """Float32-faithful copy of ops.bilinear maps for u = arange(n)/n
    (fsr_easu.hlsl:34 fallback sampling; ops/bilinear.py:56-62)."""
    u = np.arange(out_n, dtype=np.float32) / F32(out_n)
    t = u * F32(in_n) - F32(0.5)
    i0 = np.floor(t)
    return i0.astype(np.int32), (t - i0).astype(np.float32)


def _expand_axis(arrs, n_out, tile, tile_e, grid):
    """Per-tile expanded maps: entry [g, t] = arr[clip(g*tile - 1 + t)]."""
    idx = np.clip(np.arange(grid)[:, None] * tile - 1 + np.arange(tile_e)[None, :],
                  0, n_out - 1)
    return [np.ascontiguousarray(a[idx]) for a in arrs]


def build_fsr_fused(batch, in_h, in_w, out_w, out_h, *, sharpness,
                    centres, color_bits=8, debug=False, tile=(128, 256),
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
      tile: interior output tile edge (expanded tile = tile+2).

    Returns fn(img) -> rgb where img is (B, 3, in_h, in_w) float32 holding
    *integer* texel values (0..2^bits-1) and rgb is (B, 3, out_h, out_w)
    float32 in [0, 1].
    """
    B = int(batch)
    H, W, OH, OW = int(in_h), int(in_w), int(out_h), int(out_w)
    tile_h, tile_w = (tile, tile) if isinstance(tile, int) else tile
    # Mosaic: output block dims must be multiples of (8, 128) or equal the
    # array dims — small outputs become a single whole-dim tile.
    TH = OH if OH <= tile_h else tile_h
    TW = OW if OW <= tile_w else tile_w
    TH_E, TW_E = TH + 2, TW + 2
    GY, GX = -(-OH // TH), -(-OW // TW)
    TOTAL = B * GY * GX

    cmax = F32((1 << color_bits) - 1)
    inv_cmax = F32(1.0) / cmax
    exact_bf16 = color_bits <= 8 and not _FORCE_HIGHEST  # ints <= 255: bf16-exact
    sharp_lin = C.fsr_rcas_con(C.rcas_stops_from_slider(sharpness))
    tint = (F32(0.7), F32(0.7)) if debug else None  # g,b multipliers

    # --- host-side static maps ------------------------------------------------
    con = C.fsr_easu_con(W, H, W, H, OW, OH)
    fxi, fyi, ppx, ppy = easu_index_maps(W, H, OW, OH, np.asarray(con[0], F32))
    bx0, fbx = _bilinear_axis(OW, W)
    by0, fby = _bilinear_axis(OH, H)
    fyi_e, ppy_e, by0_e, fby_e = _expand_axis(
        [fyi.astype(np.int32), ppy, by0, fby], OH, TH, TH_E, GY)
    fxi_e, ppx_e, bx0_e, fbx_e = _expand_axis(
        [fxi.astype(np.int32), ppx, bx0, fbx], OW, TW, TW_E, GX)

    # Per-tile input windows covering every clipped EASU + bilinear index.
    # Mosaic requires HBM DMA offsets provably divisible by the (8, 128)
    # tiling, so origins are aligned down and the input padded up (in `fn`).
    HP, WP = _round_up(H, 8), _round_up(W, 128)

    def _windows(idx_e, b0_e, n_in, n_pad, align):
        lo = np.minimum(np.clip(idx_e[:, 0] - 1, 0, n_in - 1),
                        np.clip(b0_e[:, 0], 0, n_in - 1))
        hi = np.maximum(np.clip(idx_e[:, -1] + 2, 0, n_in - 1),
                        np.clip(b0_e[:, -1] + 1, 0, n_in - 1))
        lo_a = (lo // align) * align
        size = min(_round_up(int((hi - lo_a + 1).max()), align), n_pad)
        org = np.minimum(lo_a, n_pad - size).astype(np.int32)
        return size, org

    IH, oy_all = _windows(fyi_e, by0_e, H, HP, 8)
    IW, ox_all = _windows(fxi_e, bx0_e, W, WP, 128)

    # per-(batch, tile) foveation class over the *expanded* tile's 16x16 groups
    centres = np.asarray(centres, np.int64).reshape(B, 5)
    cls = np.zeros((B, GY, GX), np.int32)
    for bi in range(B):
        cl = (centres[bi, 0], centres[bi, 1])
        cr = (centres[bi, 2], centres[bi, 3])
        gm = fov.tile_mask(OW, OH, (16, 16), (cl, cr), int(centres[bi, 4]))
        for i in range(GY):
            g0, g1 = max(0, i * TH - 1) // 16, min(OH - 1, i * TH + TH_E - 2) // 16
            for j in range(GX):
                h0, h1 = max(0, j * TW - 1) // 16, min(OW - 1, j * TW + TW_E - 2) // 16
                sub = gm[g0:g1 + 1, h0:h1 + 1]
                cls[bi, i, j] = 2 if sub.all() else (1 if sub.any() else 0)
    cls_flat = cls.reshape(-1)
    cen_i32 = np.minimum(centres, np.int64(2**31 - 1)).astype(np.int32).reshape(-1)

    mm_dtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    mm_prec = None if exact_bf16 else jax.lax.Precision.HIGHEST

    def _mm(a, b):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            precision=mm_prec, preferred_element_type=jnp.float32)

    def kernel(oy_ref, ox_ref, cen_ref, cls_ref,
               img, fyi_r, ppy_r, by0_r, fby_r, fxi_r, ppx_r, bx0_r, fbx_r,
               out_ref, inbuf, s_easu, s_bil, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        step = (b * GY + i) * GX + j

        def dma(slot, bb, ii, jj):
            return pltpu.make_async_copy(
                img.at[bb, :,
                       pl.ds(pl.multiple_of(oy_ref[ii], 8), IH),
                       pl.ds(pl.multiple_of(ox_ref[jj], 128), IW)],
                inbuf.at[slot], sems.at[slot])

        @pl.when(step == 0)
        def _():
            dma(0, b, i, j).start()

        @pl.when(step + 1 < TOTAL)
        def _():
            nj = (step + 1) % GX
            ni = ((step + 1) // GX) % GY
            nb = (step + 1) // (GX * GY)
            dma((step + 1) % 2, nb, ni, nj).start()

        slot = jax.lax.rem(step, 2)
        dma(slot, b, i, j).wait()
        inp = inbuf[slot]  # (3, IH, IW) f32, integer texel values

        oy, ox = oy_ref[i], ox_ref[j]
        tclass = cls_ref[step]
        fyi_t = fyi_r[0]          # (TH_E, 1) i32, global floor rows
        fxi_t = fxi_r[0]          # (1, TW_E)
        ppy_t, ppx_t = ppy_r[0], ppx_r[0]

        iota_ih = jax.lax.broadcasted_iota(jnp.int32, (TH_E, IH), 1)
        iota_iw = jax.lax.broadcasted_iota(jnp.int32, (IW, TW_E), 0)

        def row_onehot(rows):  # rows: (TH_E, 1) global -> (TH_E, IH)
            loc = jnp.clip(rows, 0, H - 1) - oy
            return (loc == iota_ih).astype(mm_dtype)

        def col_onehot(cols):  # cols: (1, TW_E) global -> (IW, TW_E)
            loc = jnp.clip(cols, 0, W - 1) - ox
            return (iota_iw == loc).astype(mm_dtype)

        # -- EASU + dering (skipped when the whole tile is outside the radius)
        @pl.when(tclass > 0)
        def _():
            r_stack = jnp.concatenate(
                [row_onehot(fyi_t + dy) for dy in _DYS], axis=0)  # (4*TH_E, IH)
            s_cols = {dx: col_onehot(fxi_t + dx) for dx in (-1, 0, 1, 2)}
            taps = {}
            for c in range(3):
                g = _mm(r_stack, inp[c])                       # (4*TH_E, IW) f32
                for dx in _DX_FULL:
                    t = _mm(g, s_cols[dx])
                    for k, dy in enumerate(_DYS):
                        if (dx, dy) in TAP_ORDER:
                            taps.setdefault((dx, dy), []).append(
                                t[k * TH_E:(k + 1) * TH_E])
                gmid = g[TH_E:3 * TH_E]
                for dx in _DX_MID:
                    t = _mm(gmid, s_cols[dx])
                    for k, dy in enumerate((0, 1)):
                        if (dx, dy) in TAP_ORDER:
                            taps.setdefault((dx, dy), []).append(
                                t[k * TH_E:(k + 1) * TH_E])
            taps = {k: jnp.stack(v, 0) * inv_cmax for k, v in taps.items()}
            s_easu[:] = easu_core(taps, ppx_t, ppy_t)

        # -- bilinear fallback (skipped when the whole tile is inside)
        @pl.when(tclass < 2)
        def _():
            rb = jnp.concatenate(
                [row_onehot(by0_r[0]), row_onehot(by0_r[0] + 1)], axis=0)
            sb0 = col_onehot(bx0_r[0])
            sb1 = col_onehot(bx0_r[0] + 1)
            fx, fy = fbx_r[0], fby_r[0]
            one = F32(1.0)
            rows = []
            for c in range(3):
                gb = _mm(rb, inp[c])                           # (2*TH_E, IW)
                t0 = _mm(gb, sb0) * inv_cmax                   # (2*TH_E, TW_E)
                t1 = _mm(gb, sb1) * inv_cmax
                top = t0[:TH_E] * (one - fx) + t1[:TH_E] * fx
                bot = t0[TH_E:] * (one - fx) + t1[TH_E:] * fx
                rows.append(top * (one - fy) + bot * fy)
            s_bil[:] = jnp.stack(rows, 0)

        # -- foveation mask: per-16x16-group integer circle test
        #    (fsr_easu.hlsl:41-45; signed i32 is exact, see core/foveation.py)
        gy = i * TH - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH_E, TW_E), 0)
        gx = j * TW - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH_E, TW_E), 1)
        gcy = (gy // 16) * 16 + 8
        gcx = (gx // 16) * 16 + 8
        c0 = cen_ref[b * 5 + 0] - gcx
        c1 = cen_ref[b * 5 + 1] - gcy
        c2 = cen_ref[b * 5 + 2] - gcx
        c3 = cen_ref[b * 5 + 3] - gcy
        rsq = cen_ref[b * 5 + 4]
        mask = ((c0 * c0 + c1 * c1 <= rsq) | (c2 * c2 + c3 * c3 <= rsq))

        stage1 = jnp.where(mask[None], s_easu[:], s_bil[:])

        # -- UNORM round-trip between the two dispatches (PostProcessor.cpp:527)
        q = jnp.round(jnp.clip(stage1, F32(0.0), F32(1.0)) * cmax)
        valid = (gy >= 0) & (gy < OH) & (gx >= 0) & (gx < OW)
        q = jnp.where(valid[None], q, F32(0.0))  # Load() OOB returns zero
        qv = q * inv_cmax

        # -- RCAS on the interior
        e = qv[:, 1:1 + TH, 1:1 + TW]
        sh = rcas_core(
            qv[:, 0:TH, 1:1 + TW], qv[:, 1:1 + TH, 0:TW], e,
            qv[:, 1:1 + TH, 2:2 + TW], qv[:, 2:2 + TH, 1:1 + TW], sharp_lin)
        m_in = mask[1:1 + TH, 1:1 + TW][None]
        if tint is not None:
            fb = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
        else:
            fb = e
        if _DEBUG_STAGE1 == 1:
            out_ref[0] = stage1[:, 1:1 + TH, 1:1 + TW]
        elif _DEBUG_STAGE1 == 2:
            out_ref[0] = qv[:, 1:1 + TH, 1:1 + TW]
        else:
            out_ref[0] = jnp.where(m_in, sh, fb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, GY, GX),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
            pl.BlockSpec((1, TH_E, 1), lambda b, i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, TW_E), lambda b, i, j, *_: (j, 0, 0)),
            pl.BlockSpec((1, 1, TW_E), lambda b, i, j, *_: (j, 0, 0)),
            pl.BlockSpec((1, 1, TW_E), lambda b, i, j, *_: (j, 0, 0)),
            pl.BlockSpec((1, 1, TW_E), lambda b, i, j, *_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, TH, TW), lambda b, i, j, *_: (b, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, IH, IW), jnp.float32),
            pltpu.VMEM((3, TH_E, TW_E), jnp.float32),
            pltpu.VMEM((3, TH_E, TW_E), jnp.float32),
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
    colmaps = [a.reshape(GX, 1, TW_E) for a in (fxi_e, ppx_e, bx0_e, fbx_e)]
    statics = [jnp.asarray(oy_all), jnp.asarray(ox_all),
               jnp.asarray(cen_i32), jnp.asarray(cls_flat)] + \
              [jnp.asarray(a) for a in rowmaps + colmaps]

    def fn(img):
        if HP != H or WP != W:  # pad to the HBM (8, 128) tiling for DMA
            img = jnp.pad(img, ((0, 0), (0, 0), (0, HP - H), (0, WP - W)))
        return call(statics[0], statics[1], statics[2], statics[3], img,
                    *statics[4:])

    return fn
