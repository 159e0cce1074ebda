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

TPU-first design (v3 — band row-gather prologue, stacked column matmuls):

  * Grid is (batch, row_band). Each band DMAs a full-width window of input
    rows HBM->VMEM (double-buffered across bands). Row-only windows need no
    x offset, so there is no lane-alignment slack anywhere: the gather
    matmuls run at their minimal inner dimension.
  * The row gather runs ONCE per band per channel, gated by band class
    (fully-outside bands gather only the bilinear blocks, fully-inside
    only the EASU blocks) — and the 4 EASU dy blocks are NOT gathered
    separately: fyi is monotone with steps <= 1, so they are derived from
    ONE extended dy=0 gather (TPX rows instead of 4*TP) as static sublane
    slices plus one per-row select, host-verified per build with a
    4-block-matmul fallback. Measured 0.34 ms/pair faster same-process.
  * Inside the kernel a *static* Python loop walks 128-column chunks. All
    slicing is static, so Mosaic sees fixed shapes: per chunk ONE matmul
    against the 4-dx-stacked column one-hot yields all 16 (dy,dx) tap
    combinations; the 12 EASU taps are vreg-aligned slices. Texels are
    integer-valued and <= 255, hence bf16-exact: bf16 one-hot matmuls with
    f32 accumulation reproduce the gather bit-exactly, and the UNORM
    decode (k * 1/255) happens after the gather, matching
    utils.frames.to_planar. (10-bit inputs exceed bf16 integer range and
    use f32 HIGHEST matmuls instead.)
  * (v4) The y-lerp, the foveated per-pixel select and the UNORM quantize
    (the reference's intermediate texture, PostProcessor.cpp:527) run
    inside the chunk loop at register-resident chunk width, writing ONE
    quantized band scratch; the band epilogue is only RCAS with
    lane-rotate horizontal taps + the inside-circle select + the packed
    UNORM store — the EASU->RCAS handoff never leaves VMEM. (The r3
    band-wide epilogue survives behind DebugKnobs.band_epilogue for A/B.)
  * The foveation circle is evaluated per 16x16 group exactly like the HLSL
    (integer centre/radius math); whole 128x128 chunks skip the EASU
    matmuls / bilinear / RCAS via a per-chunk class (0=all outside,
    1=mixed, 2=all inside) — the TPU analog of the reference's
    whole-workgroup branch.

Bit-exactness vs the NumPy oracle on real TPU was verified for the v1
tiled variant of this kernel and is asserted by tests/test_kernels_fsr.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..ops.easu import easu_core_split, easu_index_maps, TAP_ORDER
from ..ops.rcas import rcas_core
from . import _band as BD

__all__ = ["build_fsr_fused", "DebugKnobs"]

F32 = np.float32

# dy row-block order inside the stacked one-hot row-gather matrix.
_DYS = (-1, 0, 1, 2)
_DXS = (-1, 0, 1, 2)   # dx column-block order in the stacked col one-hot

_CHUNK = 128           # default output-column chunk width (lane multiple)


@dataclasses.dataclass(frozen=True)
class DebugKnobs:
    """Profiling-only kernel ablations (tools/profile_fsr.py, ab_fsr.py).

    All default False = the production kernel. Passed explicitly to
    build_fsr_fused so builds are pure functions of their arguments.
    """

    force_highest: bool = False   # force f32 HIGHEST-precision matmul-gathers
    skip_stage1: bool = False     # skip the EASU/bilinear chunk loop
    skip_rcas: bool = False       # write quantized stage-1 directly
    skip_epilogue: bool = False   # write a constant (isolates DMA)
    mm_only: bool = False         # gather matmuls without easu_core
    skip_prologue: bool = False   # skip the band row-gather matmul
    no_derive: bool = False       # force the 4-block matmul prologue
    # Derive the 4 dx column blocks from one extended dx=0 gather (the
    # column analog of the derived-rows prologue). Bit-exact, but measured
    # 1.5 ms/pair SLOWER on v5e (tools/ab_fsr.py derive_cols=True: 5.35 vs
    # 3.85 ms same-process): the column matmul is overhead-bound, not
    # width-bound, so halving its output lanes saves nothing while the
    # unaligned lane slices + selects add real VPU work. Kept opt-in for
    # re-evaluation on chips with different MXU/VPU balance.
    derive_cols: bool = False
    no_gating: bool = False       # drop pl.when chunk gating
    # Band-class-specialized epilogue (RCAS skipped on fully-outside bands).
    # Measured SLOWER than the straight-line epilogue on v5e (+0.2 ms at
    # radius 0.5, tools/ab_fsr.py): the extra pl.when regions and code
    # duplication cost more than the skipped RCAS work. Kept for
    # re-evaluation on other chips.
    epi_specialize: bool = False
    # Chunk-gated RCAS epilogue: quantized stage 1 lands in a zero-margined
    # band scratch and RCAS runs per 128-column chunk behind pl.when
    # (skipped where the chunk is fully outside the circle) — the chunk
    # analog of the reference's whole-workgroup sharpen branch. Bit-equal,
    # but a measured LOSS at radius 0.5 (+0.28 ms/pair same-process: the
    # extra band scratch round-trip exceeds the skipped RCAS work, which
    # is only ~0.3 ms for the whole band after the lane-rotate taps).
    epi_chunk_gate: bool = False
    # Disable the exact-12-tap gather split (restores the r3 16-combination
    # chunk matmul). The split pairs the dy in {0, 1} row blocks with all
    # four dx column blocks and the dy in {-1, 2} blocks with dx in {0, 1}
    # only — exactly the 12-tap EASU footprint (ffx_fsr1.h:328-348), 25%
    # fewer gather MACs, bit-identical output (gather layout change only).
    no_tap_split: bool = False
    # Restore the r3 band-wide epilogue (y-lerp + foveated select + UNORM
    # quantize as ~13 full-band passes over (3, TH_E, OWP) scratches). The
    # r4 default runs those ops per 128-column chunk inside the stage-1
    # loop (register-resident, and the select/quantize commute bit-exactly
    # with the per-pixel foveation select), writing ONE quantized band
    # scratch that the RCAS epilogue consumes directly. epi_specialize /
    # epi_chunk_gate are band-epilogue experiments and imply this knob.
    band_epilogue: bool = False
    # --- per-stage floor probes (r5, VERDICT item 1) -----------------------
    # Unlike the cumulative skip_* knife-edges above, these keep each
    # stage's *machine* (gathers, scratch traffic, rotates, selects,
    # stores) and replace only its math with a near-zero-flop consume, so
    # the gap (stage − probe) is the stage's pure math cost and the probe
    # itself is the stage's standalone floor. Output is WRONG under either.
    core_one_fma: bool = False    # easu_core -> mean of the 12 taps
    rcas_move: bool = False       # rcas_core -> 5-tap average (keeps the
                                  # scratch reads + lane rotates + select)
    # r5 VMEM-traffic experiment: emit the gather matmuls' outputs as bf16
    # instead of f32 (preferred_element_type). 8-bit texels are integers
    # <= 255 = exactly representable in bf16 (and every one-hot partial sum
    # is 0 or the texel), so the downcast is bit-exact on the packed path;
    # the tap planes then cost half the VMEM write+read bytes. The f32
    # tap value the core consumes is reconstructed by the existing
    # `* inv_cmax` promotion. No-op (f32 out) on the 10-bit/force_highest
    # paths, where texels exceed bf16's 8-bit mantissa.
    mm_bf16_out: bool = False
    # Disable the r5 band-class-gated epilogue (the production default):
    # bands fully outside the foveation circle skip the RCAS math and
    # store the quantized passthrough directly — bit-exact, since their
    # all-false inside-mask discarded the sharpened values anyway (the
    # reference wrapper likewise never runs RCAS outside the circle,
    # fsr_rcas.hlsl:44-47). Set True to A/B the unconditional epilogue.
    no_epi_band_gate: bool = False


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


def fsr_band_layout(out_w, out_h, band_rows=128, chunk=_CHUNK):
    """(TH, GY): the fused kernel's band height (after the VMEM auto-shrink
    for very wide frames) and band count — what a spatial-sharding caller
    needs to pick `band_range` splits (parallel/spatial.py)."""
    OH, OW = int(out_h), int(out_w)
    OWP_EST = BD.round_up(OW, int(chunk))
    band_rows = int(band_rows)
    while band_rows > 32 and 10 * (band_rows + 2) * OWP_EST * 4 > 24 * 2**20:
        band_rows //= 2
    TH = OH if OH <= band_rows else band_rows
    return TH, -(-OH // TH)


def build_fsr_fused(batch, in_h, in_w, out_w, out_h, *, sharpness,
                    centres, color_bits=8, debug=False, band_rows=128,
                    chunk=_CHUNK, precision="full", interpret=False,
                    knobs=None, band_range=None):
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
      precision: "full" = f32 parity with the oracle; "half" = bf16
        elementwise math — the analog of the reference's packed-fp16
        FsrEasuH/FsrRcasHx2 fast path (ffx_fsr1.h:445-594, 874+).
      knobs: optional DebugKnobs with profiling-only ablations.
      band_range: optional (g0, g1) — build a kernel for output row bands
        [g0, g1) of the FULL image only (spatial sharding: every index map
        and foveation circle is computed globally, then sliced). The
        returned fn consumes the input row strip
        [fn.in_row_base, fn.in_row_base + fn.in_rows) and produces output
        rows [g0*band, min(g1*band, out_h)); see parallel/spatial.py.

    Returns fn(img):
      8-bit: img is (B, in_h, in_w) uint32 (bitcast RGBA8 — zero-copy from
        NHWC), result is (B, out_h, out_w) uint32 packed RGBA8 with alpha
        255. Channel unpack/pack happens in-kernel with integer shifts, so
        the pipeline needs no NHWC<->planar transpose at all.
      10-bit: img is (B, 3, in_h, in_w) float32 integer texels, result
        (B, 3, out_h, out_w) float32 in [0, 1] (the original planar path).
    """
    kn = knobs or DebugKnobs()
    _SKIP_STAGE1 = kn.skip_stage1
    _SKIP_RCAS = kn.skip_rcas
    _SKIP_EPILOGUE = kn.skip_epilogue
    _MM_ONLY = kn.mm_only
    _SKIP_PROLOGUE = kn.skip_prologue
    _NO_DERIVE = kn.no_derive
    _NO_DERIVE_COLS = not kn.derive_cols
    _NO_GATING = kn.no_gating
    _EPI_SPECIALIZE = kn.epi_specialize
    _EPI_CHUNK_GATE = kn.epi_chunk_gate
    _FORCE_HIGHEST = kn.force_highest
    _CORE_ONE_FMA = kn.core_one_fma
    _RCAS_MOVE = kn.rcas_move
    _EPI_BAND_GATE = not kn.no_epi_band_gate
    # band-wide epilogue (r3 structure) — implied by its sub-experiments
    _BAND_EPI = kn.band_epilogue or kn.epi_specialize or kn.epi_chunk_gate
    # The 12-tap gather split and the derived-columns experiment both
    # re-shape the per-chunk EASU matmul; they are mutually exclusive (the
    # opt-in derive_cols keeps the r3 single-matmul layout).
    _TAP12 = not (kn.no_tap_split or kn.derive_cols)

    B = int(batch)
    H, W, OH, OW = int(in_h), int(in_w), int(out_h), int(out_w)
    # Band height after the VMEM auto-shrink for very wide frames (8K): the
    # band scratches scale with band_rows * padded-out-width, and VMEM is
    # 128 MB on v5e.
    TH, GY = fsr_band_layout(OW, OH, band_rows, chunk)
    TH_E = TH + 2
    CHUNK = int(chunk)
    NCHUNK = -(-OW // CHUNK)
    OWP = NCHUNK * CHUNK
    TOTAL = B * GY

    pol = BD.io_policy(color_bits, force_highest=_FORCE_HIGHEST)
    cmax, inv_cmax = pol.cmax, pol.inv_cmax
    exact_bf16 = pol.exact_bf16          # ints <= 255: bf16-exact
    import ml_dtypes
    core_dt = F32 if precision == "full" else ml_dtypes.bfloat16
    sharp_lin = C.fsr_rcas_con(C.rcas_stops_from_slider(sharpness))
    tint = (F32(0.7), F32(0.7)) if debug else None  # g,b multipliers

    # NOTE: packed_io keys on exact_bf16 (not color_bits) here — the
    # force_highest profiling knob must also disable the u32 fast path.
    packed_io = exact_bf16               # u32-packed RGBA8 IO fast path
    HP, WP = BD.input_padding(H, W)

    # --- host-side static maps ------------------------------------------------
    con = C.fsr_easu_con(W, H, W, H, OW, OH)
    fxi, fyi, ppx, ppy = easu_index_maps(W, H, OW, OH, np.asarray(con[0], F32))
    bx0, fbx = _bilinear_axis(OW, W)
    by0, fby = _bilinear_axis(OH, H)
    fyi_e, ppy_e, by0_e, fby_e = _expand_rows(
        [fyi.astype(np.int32), ppy, by0, fby], OH, TH, TH_E, GY)
    fxi_p, ppx_p, bx0_p, fbx_p = _pad_cols(
        [fxi.astype(np.int32), ppx, bx0, fbx], OW, OWP)

    # --- derived-rows prologue structure -------------------------------------
    # The 4 EASU dy row blocks are views of ONE extended dy=0 gather: fyi is
    # monotone with steps <= 1 (upscaling), so row t of block dy equals the
    # extended gather at j = t + 2 + s with a canonical shift s that takes
    # one of two values per dy, selected by a host mask. This shrinks the
    # band row-gather matmul from 4*TP to TPX rows; the blocks become static
    # sublane slices + one select each. Host-verified per build (live rows
    # only — out-of-image rows are discarded downstream via mask state 2);
    # falls back to the 4-block matmul when the shift structure doesn't hold.
    EXT = TH_E + 5                       # j = t + 2 + s, s in [-2, 3]
    TPX = BD.round_up(EXT, 8)
    rows_ext_g = np.clip(np.arange(GY)[:, None] * TH - 3
                         + np.arange(EXT)[None, :], 0, OH - 1)
    fyi_x = fyi.astype(np.int32)[rows_ext_g]          # (GY, EXT)
    row_live = ((np.arange(GY)[:, None] * TH - 1
                 + np.arange(TH_E)[None, :] >= 0)
                & (np.arange(GY)[:, None] * TH - 1
                   + np.arange(TH_E)[None, :] < OH))
    _SHIFTS = {-1: (-1, -2), 1: (1, 2), 2: (2, 3)}
    derive_ok = not _NO_DERIVE
    dymasks = np.zeros((GY, 3, TH_E, 1), np.float32)  # dy -1, 1, 2: 1 = s1
    for i in range(GY):
        for mi, dy in enumerate((-1, 1, 2)):
            s1, s2 = _SHIFTS[dy]
            tgt = np.clip(fyi_e[i] + dy, 0, H - 1)
            v1 = np.clip(fyi_x[i, 2 + s1:2 + s1 + TH_E], 0, H - 1)
            v2 = np.clip(fyi_x[i, 2 + s2:2 + s2 + TH_E], 0, H - 1)
            m1 = v1 == tgt
            if not ((m1 | (v2 == tgt)) | ~row_live[i]).all():
                derive_ok = False
            dymasks[i, mi, :, 0] = m1

    # per-band input row windows (rows only — full width, no x alignment)
    lo = np.minimum(np.clip(fyi_e[:, 0] - 1, 0, H - 1),
                    np.clip(by0_e[:, 0], 0, H - 1))
    hi = np.maximum(np.clip(fyi_e[:, -1] + 2, 0, H - 1),
                    np.clip(by0_e[:, -1] + 1, 0, H - 1))
    if derive_ok:  # the extended gather may reach one row further out
        lo = np.minimum(lo, np.clip(fyi_x[:, 0], 0, H - 1))
        hi = np.maximum(hi, np.clip(fyi_x[:, -1], 0, H - 1))
    IH, oy_all = BD.row_windows(lo, hi, HP)

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

    # --- derived-columns structure (mirror of the derived-rows prologue) ----
    # fxi is monotone with steps <= 1 (EASU always upscales here), so the 4
    # dx column blocks of each chunk are views of ONE extended dx=0 gather:
    # the dx tap at output column c equals the extended gather at lane
    # j = c + 2 + s with a canonical shift s taking one of two values per
    # dx, selected by a host mask. The per-chunk EASU column matmul output
    # shrinks from 4*CHUNK to EXTC_P (= 2*CHUNK) lanes; the dx != 0 taps
    # become static (unaligned) lane slices + one select. Host-verified per
    # build on live columns; falls back to the 4-block layout otherwise.
    EXTC = CHUNK + 5                     # j = c + 2 + s, s in [-2, 3]
    EXTC_P = BD.round_up(EXTC, 128)
    _CSHIFTS = {-1: (-1, -2), 1: (1, 2), 2: (2, 3)}
    derive_cols_ok = not _NO_DERIVE_COLS
    cmasks = np.zeros((NCHUNK, 3, 1, CHUNK), np.float32)  # dx -1,1,2: 1 = s1
    fxi_ext = np.zeros((NCHUNK, EXTC), np.int64)
    for k in range(NCHUNK):
        js = np.clip(np.arange(k * CHUNK - 2, k * CHUNK - 2 + EXTC),
                     0, OWP - 1)
        fxi_ext[k] = fxi_p[js]
        col_live = np.arange(k * CHUNK, (k + 1) * CHUNK) < OW
        for mi, dx in enumerate((-1, 1, 2)):
            s1, s2 = _CSHIFTS[dx]
            tgt = np.clip(fxi_p[k * CHUNK:(k + 1) * CHUNK] + dx,
                          0, W - 1) - cw0[k]
            v1 = np.clip(fxi_ext[k, 2 + s1:2 + s1 + CHUNK], 0, W - 1) - cw0[k]
            v2 = np.clip(fxi_ext[k, 2 + s2:2 + s2 + CHUNK], 0, W - 1) - cw0[k]
            m1 = v1 == tgt
            if not ((m1 | (v2 == tgt)) | ~col_live).all():
                derive_cols_ok = False
            cmasks[k, mi, 0] = m1

    # Host-side foveation: the 16x16-group circle test (fsr_easu.hlsl:41-45)
    # depends only on static centres, so the whole per-pixel mask state is
    # precomputed: 0 = outside radius, 1 = inside, 2 = out of image (zero
    # per the RCAS Load() rule). Expanded per band incl. the +-1 halo rows;
    # per-chunk classes inspect the +-1 column halo (the chunk EASU math
    # reads neighbor columns).
    rows_g = np.clip(np.arange(GY)[:, None] * TH - 1 + np.arange(TH_E)[None, :],
                     0, OH - 1)
    row_ok = ((np.arange(GY)[:, None] * TH - 1 + np.arange(TH_E)[None, :] >= 0)
              & (np.arange(GY)[:, None] * TH - 1 + np.arange(TH_E)[None, :] < OH))
    mstate, cls_flat, band_cls = BD.mask_state(
        B, centres, OW, OH, OWP, (16, 16), rows_g, row_ok,
        chunk=CHUNK, col_halo=True)

    mm_dtype = pol.mm_dtype
    mm_prec = pol.mm_prec

    # The gather one-hots are fully static — build them on the host.
    # v3 layout: every row block is padded to TP (= TH_E rounded up to the
    # 8-sublane tile) so the per-tap output slices land vreg-aligned, and
    # the row gather runs ONCE per band per channel (6 blocks stacked) into
    # a G scratch; per chunk a single matmul against the stacked column
    # one-hot then produces ALL tap combinations at once.
    TP = BD.round_up(TH_E, 8)
    N_EASU = 4 * TP          # dy in _DYS
    N_BIL = 2 * TP           # bilinear y0, y1
    N_ROW = N_EASU + N_BIL
    iota_ih_np = np.arange(IH)[None, :]
    def _row_oh(rows, band, pad):  # rows: (n,) global -> (pad, IH) padded
        loc = np.clip(rows, 0, H - 1) - oy_all[band]
        oh = np.zeros((pad, IH), np.float32)
        oh[:len(rows)] = (loc[:, None] == iota_ih_np)
        return oh
    if derive_ok:
        # [extended dy=0 gather | bilinear y0 | bilinear y1]
        N_RIN = TPX + N_BIL
        rstack = np.zeros((GY, N_RIN, IH), np.float32)
        for i in range(GY):
            blocks = [_row_oh(np.clip(fyi_x[i], 0, H - 1), i, TPX),
                      _row_oh(by0_e[i], i, TP), _row_oh(by0_e[i] + 1, i, TP)]
            rstack[i] = np.concatenate(blocks, axis=0)
    else:
        N_RIN = N_ROW
        rstack = np.zeros((GY, N_RIN, IH), np.float32)
        for i in range(GY):
            blocks = [_row_oh(fyi_e[i] + dy, i, TP) for dy in _DYS]
            blocks += [_row_oh(by0_e[i], i, TP), _row_oh(by0_e[i] + 1, i, TP)]
            rstack[i] = np.concatenate(blocks, axis=0)
    # Cols per chunk. Derived layout: [extended dx=0 EASU gather (EXTC_P) |
    # bilin x0 | bilin x1]; fallback: [dx=-1,0,1,2 | bilin x0 | bilin x1].
    # One-hot rows whose index falls outside the chunk window are all-zero;
    # such extended lanes are never selected (host-verified above).
    iota_kc_np = np.arange(KC)[:, None]
    S_E_COLS = EXTC_P if derive_cols_ok else 4 * CHUNK
    sstack = np.zeros((NCHUNK, KC, S_E_COLS + 2 * CHUNK), np.float32)
    for k in range(NCHUNK):
        cs = slice(k * CHUNK, k * CHUNK + CHUNK)
        if derive_cols_ok:
            ext_idx = np.full(EXTC_P, -1, np.int64)
            ext_idx[:EXTC] = np.clip(fxi_ext[k], 0, W - 1) - cw0[k]
            blocks = [ext_idx]
        else:
            blocks = [np.clip(fxi_p[cs] + dx, 0, W - 1) - cw0[k]
                      for dx in (-1, 0, 1, 2)]
        blocks += [np.clip(bx0_p[cs], 0, W - 1) - cw0[k],
                   np.clip(bx0_p[cs] + 1, 0, W - 1) - cw0[k]]
        sstack[k] = (iota_kc_np == np.concatenate(blocks)[None, :])

    # --- spatial strip slicing (band_range) ----------------------------------
    # Every map above was computed for the FULL image, so a strip build is
    # pure slicing along the band axis: rebased DMA origins, strip-local
    # grid/out rows, re-flattened per-step class tables. base/in_rows stay
    # ROW_ALIGN-aligned because row_windows aligns all origins.
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

    # --- G-scratch EASU row-block layout --------------------------------------
    # _TAP12 (production): the EASU region is grouped by tap footprint so the
    # per-chunk gather can skip the 4 (dy, dx) combinations EASU never reads
    # (ffx_fsr1.h:328-348 — dy in {-1, 2} only pairs with dx in {0, 1}):
    #   region A rows [0, 6*TP):        3 channels x (dy=0, dy=1)
    #   region B rows [6*TP, 12*TP):    3 channels x (dy=-1, dy=2)
    # Region A multiplies against all 4 dx column blocks, region B against
    # the middle 2 only — 36 instead of 48 block MACs (25% fewer), output
    # bit-identical (pure gather-layout change). Legacy layout (no_tap_split
    # / derive_cols): 3 channels x (dy=-1, 0, 1, 2) contiguous per channel.
    _RB = 6 * TP
    _DYI = {dy: j for j, dy in enumerate(_DYS)}

    def _eoff(c, dy):
        """G-scratch row offset of channel c's dy row block."""
        if _TAP12:
            if dy in (0, 1):
                return c * 2 * TP + dy * TP
            return _RB + c * 2 * TP + (0 if dy == -1 else TP)
        return c * N_EASU + _DYI[dy] * TP

    # Gather-matmul output dtype: bf16 under the mm_bf16_out experiment on
    # the exact path (integers <= 255 round-trip bf16 exactly), f32 else.
    # Mosaic requires the matmul ACCUMULATOR to stay 32-bit
    # (preferred_element_type=bf16 fails kernel verification), so the
    # narrowing is an explicit convert on the f32 result — the stored
    # tap arrays are bf16, the accumulate is untouched. The knob-off path
    # emits no convert at all so its jaxpr (and compile cache) is
    # unchanged. Exactness note: the matmul outputs are gathered integer
    # texels <= 255, so the bf16 round-trip is value-exact; on CPU
    # interpret the two variants still flip ~1e-5 of texels by 1 LSB
    # because XLA:CPU fuses/contracts the two (different) jaxprs
    # differently (the cross-jaxpr FMA noise documented in
    # tests/test_kernels_fsr.py's header) — the authoritative bitwise
    # check is tools/ab_fsr.py --check on the TPU chip.
    _mm_narrow = kn.mm_bf16_out and pol.exact_bf16

    def _mm(a, b):
        r = jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            precision=mm_prec, preferred_element_type=jnp.float32)
        return r.astype(jnp.bfloat16) if _mm_narrow else r

    def _mm2(a, b):  # operands already mm_dtype (G scratch / col one-hots)
        r = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=mm_prec, preferred_element_type=jnp.float32)
        return r.astype(jnp.bfloat16) if _mm_narrow else r

    def kernel(oy_ref, cls_ref, bcls_ref,
               img, mst_r, rst_r, sst_r, ppy_r, fby_r, ppx_r, fbx_r, dym_r,
               cmk_r, out_ref, inbuf, g_rows, *extra):
        s_easu = s_bilx = s_q = s_qv = None
        if _BAND_EPI:
            if _EPI_CHUNK_GATE:
                s_easu, s_bilx, s_q, sems = extra
            else:
                s_easu, s_bilx, sems = extra
        else:
            # r4 default: ONE quantized stage-1 band scratch (the
            # reference's intermediate texture) written per chunk
            s_qv, sems = extra
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=packed_io, ih=IH, gy=GY,
                                total=TOTAL)
        # unpack RGBA8-in-u32 once per band (little-endian: R low byte)
        chans = BD.band_channels(inbuf, slot, packed_io, 3)

        def inp_full(c):  # (IH, WP) integer texels of channel c
            return chans[c]

        ppy_t = ppy_r[0]          # (TH_E, 1) f32

        # foveation/validity state is a precomputed host input:
        # mst_r[0, 0] is (TH_E, OWP) i8 — 0 outside, 1 inside, 2 invalid

        one = F32(1.0)

        # ---- band prologue: ONE row-gather matmul per channel ---------------
        # (816, IH) one-hot x (IH, WP) texels -> all 6 row blocks (4 EASU dy
        # + 2 bilinear) for the whole band width, stored as mm_dtype so the
        # per-chunk column matmuls consume it directly. Texels are integers
        # <= cmax, so the bf16 round-trip is exact (8-bit path).
        # Gated by band class: bands fully outside the circle gather only
        # the 2 bilinear blocks (a third of the matmul rows), fully-inside
        # bands only the 4 EASU blocks — this matmul is the dominant term
        # of the per-band floor (tools/profile_fsr.py "dma+write only").
        # G scratch layout is channel-major per REGION: the 3 channels'
        # EASU blocks are contiguous ([c*N_EASU, ...)), then the 3 bilinear
        # blocks ([3*N_EASU + c*N_BIL, ...)) — so each chunk needs ONE
        # column matmul per path covering all channels (measured: the many
        # small per-channel chunk matmuls paid ~2-4x their compute in
        # launch overhead, tools/ab_fsr.py _MM_ONLY).
        r_all = rst_r[0]                                # (N_RIN, IH)

        if derive_ok:
            # derived prologue: ONE TPX-row dy=0 gather per channel; the 4
            # dy blocks are sublane slices of it (+ one select for the
            # two-shift dys). Pad rows TH_E..TP of each block stay stale —
            # matmul row i only affects output row i, never read.
            def _gather_easu():
                m = dym_r[0]                            # (3, TH_E, 1) f32
                for c in range(3):
                    g0 = _mm(r_all[:TPX], inp_full(c)).astype(g_rows.dtype)
                    o = _eoff(c, -1)
                    g_rows[o:o + TH_E] = jnp.where(
                        m[0] > F32(0.5), g0[1:1 + TH_E], g0[0:TH_E])
                    o = _eoff(c, 0)
                    g_rows[o:o + TH_E] = g0[2:2 + TH_E]
                    o = _eoff(c, 1)
                    g_rows[o:o + TH_E] = jnp.where(
                        m[1] > F32(0.5), g0[3:3 + TH_E], g0[4:4 + TH_E])
                    o = _eoff(c, 2)
                    g_rows[o:o + TH_E] = jnp.where(
                        m[2] > F32(0.5), g0[4:4 + TH_E], g0[5:5 + TH_E])

            def _gather_bil():
                for c in range(3):
                    g = _mm(r_all[TPX:], inp_full(c))
                    g_rows[3 * N_EASU + c * N_BIL:
                           3 * N_EASU + (c + 1) * N_BIL] = \
                        g.astype(g_rows.dtype)

            def _gather_all():
                _gather_easu()
                _gather_bil()
        else:
            def _gather_rows(lo, hi):
                for c in range(3):
                    g = _mm(r_all[lo:hi], inp_full(c))  # (hi-lo, WP) f32
                    gl = g.astype(g_rows.dtype)
                    if lo < N_EASU:
                        # scatter per dy block (the matmul output keeps the
                        # one-hot's dy = -1, 0, 1, 2 order; destinations
                        # follow the _eoff layout)
                        for j, dy in enumerate(_DYS):
                            b0, b1 = j * TP, (j + 1) * TP
                            s0, s1 = max(lo, b0), min(hi, b1)
                            if s0 < s1:
                                d0 = _eoff(c, dy) + (s0 - b0)
                                g_rows[d0:d0 + (s1 - s0)] = gl[s0 - lo:s1 - lo]
                    if hi > N_EASU:
                        lb = max(lo, N_EASU)
                        g_rows[3 * N_EASU + c * N_BIL + lb - N_EASU:
                               3 * N_EASU + c * N_BIL + hi - N_EASU] = \
                            gl[lb - lo:]

            def _gather_easu():
                _gather_rows(0, N_EASU)

            def _gather_bil():
                _gather_rows(N_EASU, N_ROW)

            def _gather_all():
                _gather_rows(0, N_ROW)

        if _SKIP_PROLOGUE:   # profiling only: stale scratch downstream
            pass
        elif _NO_GATING:
            _gather_all()
        else:
            bcls0 = bcls_ref[step]
            pl.when(bcls0 == 1)(_gather_all)
            pl.when(bcls0 == 2)(_gather_easu)
            pl.when(bcls0 == 0)(_gather_bil)

        # ---- chunk loop: one column matmul per path + per-chunk EASU core ---
        # The (3ch x 4dy)-stacked rows against the (4dx)-stacked column
        # one-hot yield all 16 (dy,dx) combinations in ONE matmul; the 12
        # EASU taps are vreg-aligned slices of it (TP and CHUNK multiples).
        # Keeping the EASU math per 128-column chunk is deliberate: at
        # (TH_E, 128) the intermediates stay register-resident (measured 2x
        # faster than band-wide (TH_E, OWP) arrays, tools/microbench.py v3).
        dyi = {dy: j for j, dy in enumerate(_DYS)}

        def _easu_vals(k, c0, w0, ppx_c):
            """Stage-1 EASU values for chunk k as [r, g, b] f32 planes of
            (TH_E, CHUNK); under _MM_ONLY, the (0, 0) taps instead."""
            taps = {}
            if _TAP12:
                # exact-12-tap split: region A (dy 0/1) against all 4 dx
                # blocks, region B (dy -1/2) against the middle 2 only —
                # 25% fewer gather MACs than the 16-combination matmul,
                # bit-identical (layout change only). Both column slices
                # are 128-lane aligned.
                s_e = sst_r[k]                          # (KC, S_E + 2*CHUNK)
                t_a = _mm2(g_rows[:_RB, w0:w0 + KC],
                           s_e[:, :4 * CHUNK])          # (6*TP, 4*CHUNK)
                t_b = _mm2(g_rows[_RB:2 * _RB, w0:w0 + KC],
                           s_e[:, CHUNK:3 * CHUNK])     # (6*TP, 2*CHUNK)
                for (dx, dy) in TAP_ORDER:
                    if dy in (0, 1):
                        src, coff, rb = t_a, (dx + 1) * CHUNK, 0
                    else:
                        src, coff, rb = t_b, dx * CHUNK, _RB
                    taps[(dx, dy)] = [
                        src[_eoff(c, dy) - rb:_eoff(c, dy) - rb + TH_E,
                            coff:coff + CHUNK] * inv_cmax
                        for c in range(3)]
            else:
                s_e = sst_r[k, :, :S_E_COLS]            # (KC, S_E_COLS)
                ge = g_rows[:3 * N_EASU, w0:w0 + KC]
                t = _mm2(ge, s_e)                       # (3*4*TP, S_E_COLS)
                if derive_cols_ok:
                    cm = cmk_r[k]                       # (3, 1, CHUNK) f32
                    cmi = {-1: 0, 1: 1, 2: 2}
                    for (dx, dy) in TAP_ORDER:
                        rows = [slice(c * N_EASU + dyi[dy] * TP,
                                      c * N_EASU + dyi[dy] * TP + TH_E)
                                for c in range(3)]
                        if dx == 0:
                            taps[(dx, dy)] = [
                                t[r, 2:2 + CHUNK] * inv_cmax for r in rows]
                        else:
                            s1, s2 = _CSHIFTS[dx]
                            m = cm[cmi[dx]] > F32(0.5)
                            taps[(dx, dy)] = [
                                jnp.where(m, t[r, 2 + s1:2 + s1 + CHUNK],
                                          t[r, 2 + s2:2 + s2 + CHUNK])
                                * inv_cmax
                                for r in rows]
                else:
                    for (dx, dy) in TAP_ORDER:
                        taps[(dx, dy)] = [
                            t[c * N_EASU + dyi[dy] * TP:
                              c * N_EASU + dyi[dy] * TP + TH_E,
                              (dx + 1) * CHUNK:(dx + 2) * CHUNK] * inv_cmax
                            for c in range(3)]
            if _MM_ONLY:  # profiling: isolate the gather-matmul cost
                return [taps[(0, 0)][c] for c in range(3)]
            if _CORE_ONE_FMA:
                # stage-1 machine floor probe: consume every tap (so no
                # gather matmul can be elided) with a 12-term mean instead
                # of the EASU weight math
                acc = [taps[TAP_ORDER[0]][c] for c in range(3)]
                for od in TAP_ORDER[1:]:
                    for c in range(3):
                        acc[c] = acc[c] + taps[od][c]
                return [a * F32(1.0 / 12.0) for a in acc]
            # channel-split core: no (3, TH_E, CHUNK) stacks materialize.
            # exact_div: the resolve's true division is the one op whose
            # TPU rounding drifts from IEEE (numerics_probe) — corrected
            # so stage 1 is bit-exact vs the oracle, which also keeps
            # RCAS's inputs (the quantized stage-1) exact downstream.
            res = easu_core_split(taps, ppx_c, ppy_t, dt=core_dt,
                                  exact_div=precision == "full")
            return [res[c].astype(jnp.float32) for c in range(3)]

        def _bil_xl(k, c0, w0):
            """x-lerped bilinear rows for chunk k: {(c, yb): (TH_E, CHUNK)}.
            The y-lerp happens band-wide in the r3 band epilogue and
            per-chunk in the r4 default path — identical op order."""
            s_b = sst_r[k, :, S_E_COLS:]                # (KC, 2*CHUNK)
            fxc = fbx_r[k]                              # (1, CHUNK)
            gb = g_rows[3 * N_EASU:, w0:w0 + KC]
            t = _mm2(gb, s_b)                           # (3*2*TP, 2*CHUNK)
            xl = {}
            for c in range(3):
                for yb in range(2):                     # y0 and y1 rows
                    ty = t[c * N_BIL + yb * TP:c * N_BIL + yb * TP + TH_E]
                    t0 = ty[:, :CHUNK] * inv_cmax
                    t1 = ty[:, CHUNK:] * inv_cmax
                    xl[(c, yb)] = t0 * (one - fxc) + t1 * fxc
            return xl

        if _BAND_EPI:
            def _easu_chunk(k, c0, w0, ppx_c):
                vals = _easu_vals(k, c0, w0, ppx_c)
                for c in range(3):
                    s_easu[c, :, c0:c0 + CHUNK] = vals[c]

            def _bil_chunk(k, c0, w0, mixed=False):
                xl = _bil_xl(k, c0, w0)
                for c in range(3):
                    for yb in range(2):
                        s_bilx[c, yb * TH_E:(yb + 1) * TH_E,
                               c0:c0 + CHUNK] = xl[(c, yb)]
        else:
            # r4 chunk-resident epilogue head: the y-lerp, the foveated
            # per-pixel select and the UNORM quantize run here per chunk
            # (register-resident) instead of as band-wide passes. Bit-exact
            # vs the r3 band epilogue: quantize and dead-zeroing commute
            # with the per-pixel select (identical elementwise ops applied
            # to whichever arm the select keeps).
            def _qv_of(vals, dead):
                # UNORM round-trip between the reference's two dispatches
                # (PostProcessor.cpp:527) + the Load() zero rule for
                # out-of-image texels
                return [jnp.where(dead, F32(0.0), jnp.round(jnp.clip(
                    v, F32(0.0), F32(1.0)) * cmax)) * inv_cmax
                    for v in vals]

            def _easu_chunk(k, c0, w0, ppx_c):
                # i8 vector compares are unsupported on TPU — widen first
                msk = mst_r[0, 0, :, c0:c0 + CHUNK].astype(jnp.int32)
                qv = _qv_of(_easu_vals(k, c0, w0, ppx_c), msk == 2)
                for c in range(3):
                    s_qv[c, :, c0:c0 + CHUNK] = qv[c]

            def _bil_chunk(k, c0, w0, mixed=False):
                xl = _bil_xl(k, c0, w0)
                fyc = fby_r[0]                          # (TH_E, 1)
                vals = [xl[(c, 0)] * (one - fyc) + xl[(c, 1)] * fyc
                        for c in range(3)]
                msk = mst_r[0, 0, :, c0:c0 + CHUNK].astype(jnp.int32)
                qv = _qv_of(vals, msk == 2)
                if mixed:
                    # mixed chunk: the EASU branch wrote this chunk just
                    # before (or never ran — then no pixel has state 1 and
                    # the stale read is never selected)
                    ins = msk == 1
                    for c in range(3):
                        s_qv[c, :, c0:c0 + CHUNK] = jnp.where(
                            ins, s_qv[c, :, c0:c0 + CHUNK], qv[c])
                else:
                    for c in range(3):
                        s_qv[c, :, c0:c0 + CHUNK] = qv[c]

        def _chunk_loop(mode):
            # mode: "bil" (band fully outside the circle), "easu" (fully
            # inside), "both" (mixed — per-chunk pl.when gating),
            # "bil_mixed" (ungated ablation: keep EASU values per pixel)
            for k in ([] if _SKIP_STAGE1 else range(NCHUNK)):
                c0 = k * CHUNK
                w0 = cw0[k]
                ppx_c = ppx_r[k]
                if mode == "bil":
                    _bil_chunk(k, c0, w0)
                elif mode == "bil_mixed":
                    _bil_chunk(k, c0, w0, mixed=True)
                elif mode == "easu":
                    _easu_chunk(k, c0, w0, ppx_c)
                else:
                    tcls = cls_ref[step * NCHUNK + k]
                    pl.when(tcls > 0)(
                        lambda k=k, c0=c0, w0=w0, p=ppx_c:
                        _easu_chunk(k, c0, w0, p))
                    pl.when(tcls < 2)(
                        lambda k=k, c0=c0, w0=w0:
                        _bil_chunk(k, c0, w0, mixed=True))

        if _NO_GATING:
            # timing-only ablation must stay bit-identical to production:
            # in the r4 chunk-resident path the bil pass writes the shared
            # s_qv scratch, so it must keep the EASU values where the
            # per-pixel mask selects them (mixed=True); the band-epilogue
            # path selects in the epilogue and ignores the flag.
            _chunk_loop("easu")
            _chunk_loop("bil" if _BAND_EPI else "bil_mixed")
        else:
            # Scalar-core branches cost ~1 us each; a band fully outside or
            # fully inside the circle (the common case at small/huge radii)
            # runs an unconditional loop variant behind ONE band-level branch
            # instead of 2 branches per chunk.
            bcls = bcls_ref[step]
            pl.when(bcls == 0)(lambda: _chunk_loop("bil"))
            pl.when(bcls != 0)(lambda: _chunk_loop("both"))

        if _SKIP_EPILOGUE:  # profiling only: constant write, DMA still runs
            if packed_io:
                out_ref[0] = (inbuf[slot, :TH, :OW]
                              if IH >= TH and WP >= OW else
                              jnp.zeros((TH, OW), jnp.uint32))
            else:
                out_ref[0] = jnp.zeros((3, TH, OW), jnp.float32)
            return

        # ---- band epilogue: y-lerp, foveated select, UNORM, RCAS ------------
        # Specialized per band class: fully-outside bands never run RCAS
        # (the reference wrapper only copies/tints outside the circle,
        # fsr_rcas.hlsl:44-47), fully-inside bands skip the bilinear lerp
        # and the foveation select. Exactly one branch writes out_ref.
        def _store(res):
            if packed_io:
                # final UNORM store (from_planar semantics: clip, *255, RNE;
                # alpha constant 255 — the float4(rgb, 1) UAV store)
                BD.pack_store_u32(out_ref, res, None, cmax, OW)
            else:
                out_ref[0] = res[:, :, :OW]

        def _epilogue(mode):
            ms = mst_r[0, 0].astype(jnp.int32)              # (TH_E, OWP)
            if mode == "bil":
                stage1 = (s_bilx[:, :TH_E] * (one - fby_r[0])
                          + s_bilx[:, TH_E:] * fby_r[0])
            elif mode == "easu":
                stage1 = s_easu[:]
            else:
                bil = (s_bilx[:, :TH_E] * (one - fby_r[0])
                       + s_bilx[:, TH_E:] * fby_r[0])
                stage1 = jnp.where((ms == 1)[None], s_easu[:], bil)
            # UNORM round-trip between the dispatches (PostProcessor.cpp:527)
            q = jnp.round(jnp.clip(stage1, F32(0.0), F32(1.0)) * cmax)
            qv = jnp.where((ms != 2)[None], q, F32(0.0)) * inv_cmax

            if mode == "bil":
                # whole band outside the circle: RCAS never runs, only the
                # pass-through (+ optional debug tint)
                e = qv[:, 1:1 + TH]
                if tint is not None:
                    e = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
                _store(e)
                return
            # Load() zero-OOB horizontal taps via lane rotates (measured
            # 0.3 ms faster than concat+slice at band scale,
            # tools/microbench.py v3 case D): the wrapped-in lane is a
            # zeroed pad column whenever OWP > OW; masked explicitly
            # otherwise.
            e = qv[:, 1:1 + TH]
            if _SKIP_RCAS:  # profiling only
                sh = e
            else:
                d_t, f_t = BD.htaps_zero_oob(e, OWP, OW)
                sh = rcas_core(
                    qv[:, 0:TH], d_t, e, f_t, qv[:, 2:2 + TH],
                    sharp_lin, dt=core_dt).astype(jnp.float32)
            # state-2 (out-of-image) pixels must not show sharpened values;
            # in "easu" bands every in-image pixel is inside the circle
            m_in = (ms[1:1 + TH] == 1)[None]
            if tint is not None:
                fb = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
            else:
                fb = e
            _store(jnp.where(m_in, sh, fb))

        def _epilogue_chunk_gated():
            # Quantized stage 1 lands in a zero-margined band scratch; RCAS
            # then runs per chunk behind pl.when — fully-outside chunks
            # write the passthrough only (the chunk analog of the
            # reference's whole-workgroup sharpen branch, fsr_rcas.hlsl:44).
            # The 128-lane zero margins give the Load() zero-OOB rule to
            # every static neighbor slice with no edge cases.
            ms = mst_r[0, 0].astype(jnp.int32)
            bil = (s_bilx[:, :TH_E] * (one - fby_r[0])
                   + s_bilx[:, TH_E:] * fby_r[0])
            stage1 = jnp.where((ms == 1)[None], s_easu[:], bil)
            q = jnp.round(jnp.clip(stage1, F32(0.0), F32(1.0)) * cmax)
            qv = jnp.where((ms != 2)[None], q, F32(0.0)) * inv_cmax
            s_q[:, :, :128] = jnp.zeros((3, TH_E, 128), jnp.float32)
            s_q[:, :, 128 + OWP:] = jnp.zeros((3, TH_E, 128), jnp.float32)
            s_q[:, :, 128:128 + OWP] = qv
            m_in_all = ms == 1
            for k in range(NCHUNK):
                c0 = k * CHUNK
                sl = slice(128 + c0, 128 + c0 + CHUNK)
                e_k = s_q[:, 1:1 + TH, sl]
                if tint is not None:
                    fb_k = jnp.stack(
                        [e_k[0], e_k[1] * tint[0], e_k[2] * tint[1]], 0)
                else:
                    fb_k = e_k

                def _with_rcas(k=k, c0=c0, sl=sl, e_k=e_k, fb_k=fb_k):
                    d_t = s_q[:, 1:1 + TH, 128 + c0 - 1:128 + c0 - 1 + CHUNK]
                    f_t = s_q[:, 1:1 + TH, 128 + c0 + 1:128 + c0 + 1 + CHUNK]
                    sh = rcas_core(s_q[:, 0:TH, sl], d_t, e_k, f_t,
                                   s_q[:, 2:2 + TH, sl], sharp_lin,
                                   dt=core_dt).astype(jnp.float32)
                    m_k = m_in_all[1:1 + TH, c0:c0 + CHUNK][None]
                    s_bilx[:, :TH, c0:c0 + CHUNK] = jnp.where(m_k, sh, fb_k)

                def _without(c0=c0, fb_k=fb_k):
                    s_bilx[:, :TH, c0:c0 + CHUNK] = fb_k

                tcls = cls_ref[step * NCHUNK + k]
                pl.when(tcls > 0)(_with_rcas)
                pl.when(tcls == 0)(_without)
            _store(s_bilx[:, :TH])

        def _epilogue_qv():
            # r4 default: the chunk loop already wrote the quantized,
            # foveation-selected stage 1 into s_qv — only RCAS, the final
            # inside-circle select and the UNORM pack remain band-wide.
            ms = mst_r[0, 0].astype(jnp.int32)          # (TH_E, OWP)
            e = s_qv[:, 1:1 + TH]
            if _SKIP_RCAS:  # profiling only
                sh = e
            elif _RCAS_MOVE:
                # epilogue machine-floor probe: keep the scratch reads,
                # lane rotates, select and store; RCAS math -> 5-tap mean
                d_t, f_t = BD.htaps_zero_oob(e, OWP, OW)
                sh = (((s_qv[:, 0:TH] + d_t) + (f_t + s_qv[:, 2:2 + TH]))
                      + e) * F32(0.2)
            else:
                d_t, f_t = BD.htaps_zero_oob(e, OWP, OW)
                sh = rcas_core(
                    s_qv[:, 0:TH], d_t, e, f_t, s_qv[:, 2:2 + TH],
                    sharp_lin, dt=core_dt).astype(jnp.float32)
            m_in = (ms[1:1 + TH] == 1)[None]
            if tint is not None:
                fb = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
            else:
                fb = e
            _store(jnp.where(m_in, sh, fb))

        def _epilogue_qv_outside():
            # r5 band-class fast path: a band fully outside the circle has
            # an all-false inside-mask, so RCAS and the select are dead —
            # store the quantized passthrough (+ tint) directly
            e = s_qv[:, 1:1 + TH]
            if tint is not None:
                e = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
            _store(e)

        if not _BAND_EPI:
            if _EPI_BAND_GATE and not (_SKIP_EPILOGUE or _NO_GATING):
                bcls_e = bcls_ref[step]
                pl.when(bcls_e == 0)(_epilogue_qv_outside)
                pl.when(bcls_e != 0)(_epilogue_qv)
            else:
                _epilogue_qv()
        elif _EPI_CHUNK_GATE and not _NO_GATING:
            _epilogue_chunk_gated()
        elif _NO_GATING or not _EPI_SPECIALIZE:
            _epilogue("both")
        else:
            bcls2 = bcls_ref[step]
            pl.when(bcls2 == 0)(lambda: _epilogue("bil"))
            pl.when(bcls2 == 1)(lambda: _epilogue("both"))
            pl.when(bcls2 == 2)(lambda: _epilogue("easu"))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
            pl.BlockSpec((1, 1, TH_E, OWP), lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, N_RIN, IH), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((NCHUNK, KC, S_E_COLS + 2 * CHUNK),
                         lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH_E, 1), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((NCHUNK, 1, CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((1, 3, TH_E, 1), lambda b, i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((NCHUNK, 3, 1, CHUNK), lambda b, i, *_: (0, 0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, TH, OW), lambda b, i, *_: (b, i, 0))
                   if packed_io else
                   pl.BlockSpec((1, 3, TH, OW), lambda b, i, *_: (b, 0, i, 0))),
        scratch_shapes=[
            (pltpu.VMEM((2, IH, WP), jnp.uint32) if packed_io
             else pltpu.VMEM((2, 3, IH, WP), jnp.float32)),
            pltpu.VMEM((3 * N_ROW, WP), mm_dtype),        # row-gathered G
        ] + (
            [pltpu.VMEM((3, TH_E, OWP), jnp.float32),     # EASU band
             pltpu.VMEM((3, 2 * TH_E, OWP), jnp.float32)]  # bilinear x-lerp
            + ([pltpu.VMEM((3, TH_E, OWP + 256), jnp.float32)]
               if kn.epi_chunk_gate else [])
            if _BAND_EPI else
            [pltpu.VMEM((3, TH_E, OWP), jnp.float32)]     # quantized stage-1
        ) + [
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, OH, OW), jnp.uint32)
                   if packed_io else
                   jax.ShapeDtypeStruct((B, 3, OH, OW), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    rowmaps = [a.reshape(GY, TH_E, 1) for a in (ppy_e, fby_e)]
    colmaps = [a.reshape(NCHUNK, 1, CHUNK) for a in (ppx_p, fbx_p)]
    onehots = [jnp.asarray(rstack, mm_dtype), jnp.asarray(sstack, mm_dtype)]
    statics = [jnp.asarray(oy_all), jnp.asarray(cls_flat),
               jnp.asarray(band_cls), jnp.asarray(mstate)] \
        + onehots + [jnp.asarray(a) for a in rowmaps + colmaps] \
        + [jnp.asarray(dymasks), jnp.asarray(cmasks)]

    io_h, io_hp = (H, HP) if band_range is None else (in_rows, in_rows)
    fn = BD.make_io_fn(
        lambda img: call(statics[0], statics[1], statics[2], img,
                         *statics[3:]),
        io_h, W, io_hp, WP, packed_io,
        geom=dict(batch=B, gy=GY, ih=IH, th=TH, out_h=OH, out_w=OW,
                  oy=np.asarray(oy_all)))
    if band_range is not None:
        fn.band_range = (int(band_range[0]), int(band_range[1]))
        fn.in_row_base = in_row_base   # first global input row of the strip
        fn.in_rows = in_rows           # strip height incl. DMA halo/align
        fn.out_rows = OH               # strip output rows
    return fn
