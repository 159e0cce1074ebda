"""NVIDIA Image Scaling Pallas TPU kernels.

NVSharpen (this file, sharpen-only / renderScale == 1):
  The reference NVSharpen (src/nis/NIS_Scaler.h:876-971) reads a 5x5 luma
  support around each pixel at *identity* positions, so on TPU the whole
  kernel is shift arithmetic — no gathers at all. Per row band:

    1. decode the integer band, compute the SDR luma plane
       (getY, NIS_Scaler.h:160-169),
    2. build the 25 clamped-shift neighbor planes (the HLSL shared-memory
       tile with edge clamping),
    3. directional USM with the fixed [-0.6001, 1.2002, -0.6001] profile
       blended by the 3x3 edge map (NIS_Scaler.h:790-871),
    4. the foveated-radius select: outside the circle the input passes
       through with the optional debug tint (src/nis/NIS_Sharpen.hlsl:85-105;
       blocks are 32x32 there — the mask state input encodes that).

The math core is shared with ops/nis.py so the f32 op ordering matches the
oracle by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import foveation as fov
from ..core.constants import NisConfig
from ..ops import nis as N
from . import _band as BD

__all__ = ["build_nvsharpen", "build_nvscaler", "NisDebugKnobs"]


import dataclasses


@dataclasses.dataclass(frozen=True)
class NisDebugKnobs:
    """Profiling-only NVScaler ablations (mirrors kernels/fsr.DebugKnobs)."""

    skip_stage1: bool = False     # skip the scaler/fallback chunk loop
    no_inside_fast: bool = False  # route all-inside bands through the
                                  # gated loop (A/B the ungated variant)
    no_vmem_shrink: bool = False  # profiling: skip the band auto-shrink
    vmem_limit_mb: int = 100      # profiling: scoped-VMEM limit override
    # Restore the round-3 many-small-matmuls layout: 24 per-chunk luma
    # column gathers (8 dx blocks x 3 splits) instead of 3 merged ones,
    # and the 144 per-band circulant sandwich matmuls (Boh @ Circ_j per
    # split) instead of the host-precomputed V = Circ @ Aoh static with
    # one (TH, 64) x (64, 72*CHUNK) matmul per chunk per diagonal. Both
    # layouts are bit-identical (one-hot gathers select single values, so
    # merge order cannot change bits); the merged form exists because
    # small per-chunk matmuls pay 2-4x their compute in launch overhead
    # (tools/ab_fsr.py _MM_ONLY; tools/ab_nis.py --merge-ab).
    no_mm_merge: bool = False
    # Profiling-only stage ablations for the NVScaler chunk body (output is
    # WRONG under any of these — they exist to knife-edge the per-stage cost
    # on-chip, mirroring kernels/fsr.DebugKnobs.mm_only/skip_rcas):
    mm_only: bool = False         # luma gather matmuls + block merge only
    skip_normal: bool = False     # FilterNormal -> p[2,2] passthrough
    skip_f0f90: bool = False      # axial filters f0/f90 -> pixel_n
    skip_diag: bool = False       # diagonal filters + circulant machinery
    skip_edge: bool = False       # 4-corner edge map -> constant weights
    # Opt-in r5 derived-rows luma gather: the 8 luma row blocks (6 dy taps
    # + eA/eB edge rows) are views of ONE extended gather — pyi is monotone
    # with steps <= 1 (NIS only downs-to-upscales, NIS_Config.h:226), so
    # block row t equals the extended gather at t + 3 + s with a 2-valued
    # per-block shift s, selected by a host mask (the kernels/fsr.py
    # derived-rows prologue, applied to BOTH the row gather and the row
    # dim of the per-chunk column matmul: 8*TH -> TH+8 rows, ~7x fewer
    # gather MACs). Bit-identical on the cropped output: one-hot gathers
    # select single values and the split-sum commutes with slicing.
    # Default OFF: measured 53 ms/pair vs 7.7 legacy on-chip at headline
    # geometry (r5 session) — the per-dy sublane slices + mask selects on
    # the f32 matmul output relayout-bound the kernel; the gather-MAC
    # saving is irrelevant because the column matmuls are not the
    # bottleneck. Kept as a knob for the floor-attribution A/B
    # (tools/ab_nis.py --derive-rows) and as the starting point for a
    # shift-as-one-hot-matmul variant.
    derive_rows: bool = False
    # timing-only isolation probes for the derived-rows machine (outputs
    # WRONG): drop the two-shift mask selects / force 8-aligned sublane
    # slice starts, to attribute its measured cost between select ops and
    # unaligned-slice relayouts
    derive_noselect: bool = False
    derive_aligned: bool = False


F32 = np.float32



def _get_y(r, g, b, hdr_mode):
    """getY (NIS_Scaler.h:160-169) on decoded [0,1] planes: SDR BT.709,
    HDR linear = sqrt(luma)*kHDRCompressionFactor, PQ = Rec.2020 weights.
    (UNORM texture inputs put HDR-linear data off its natural fp16 range,
    but the math is range-agnostic and matches the oracle bitwise.)"""
    if hdr_mode == 2:
        return F32(0.262) * r + F32(0.678) * g + F32(0.0593) * b
    lin = F32(0.2126) * r + F32(0.7152) * g + F32(0.0722) * b
    if hdr_mode == 1:
        return jnp.sqrt(lin) * N.KHDR_COMPRESSION
    return lin


def _col_shift_clamp(plane, dx, wp):
    """plane[:, (x+dx).clip] — columns clamp at the image border, which
    coincides with the plane edge (the band is edge-replicated to wp).
    Concat+slice, computed ONCE per dx on the full band plane; row taps are
    then cheap sublane slices of the result. (pltpu.roll + edge-mask was
    measured SLOWER for this clamp pattern — 2.0 vs 1.8 ms NVSharpen — the
    edge-replicating concat fuses better than rotate+where; the roll form
    only wins for the zero-OOB pattern, see kernels/fsr.py epilogue.)"""
    if dx == 0:
        return plane
    if dx < 0:
        reps = [plane[:, :1]] * (-dx) + [plane[:, :wp + dx]]
    else:
        reps = [plane[:, dx:]] + [plane[:, wp - 1:wp]] * dx
    return jnp.concatenate(reps, axis=1)


def build_nvsharpen(batch, h, w, *, nis_cfg: NisConfig, centres, color_bits=8,
                    debug=False, band_rows=256, precision="full",
                    interpret=False):
    """Build the NVSharpen kernel.

    precision: "full" = f32 oracle parity; "half" = bf16 USM/LTI math, the
    NIS_USE_HALF_PRECISION analog (NIS_Scaler.h:141-148). Edge-map weights
    stay f32 (they are pure comparisons, unsupported on the VPU in bf16).

    8-bit: fn(img) with img (B, h, w) uint32 (bitcast RGBA8) -> (B, h, w)
    uint32 packed RGBA8 (no transposes). 10-bit: planar f32 in/out."""
    import ml_dtypes
    dt = F32 if precision == "full" else ml_dtypes.bfloat16
    B, H, W = int(batch), int(h), int(w)
    TH = H if H <= int(band_rows) else int(band_rows)
    TH_E = TH + 4                     # +-2 luma support rows
    GY = -(-H // TH)
    TOTAL = B * GY

    pol = BD.io_policy(color_bits)
    cmax, inv_cmax, inv_amax = pol.cmax, pol.inv_cmax, pol.inv_amax
    exact_bf16 = pol.exact_bf16
    tint = (F32(0.7), F32(0.7)) if debug else None
    cfg = nis_cfg

    packed_io = pol.packed_io
    mm_dtype = pol.mm_dtype
    HP, WP = BD.input_padding(H, W)

    rows_e = np.clip(np.arange(GY)[:, None] * TH - 2
                     + np.arange(TH_E)[None, :], 0, H - 1)
    IH, oy_all = BD.row_windows(rows_e[:, 0], rows_e[:, -1], HP)

    rstack = np.zeros((GY, TH_E, IH), np.float32)
    for i in range(GY):
        rstack[i] = (rows_e[i] - oy_all[i])[:, None] == np.arange(IH)[None, :]

    # mask state per band over NIS 32x32 sharpen blocks
    # (NIS_Sharpen.hlsl:93-105): 0 outside, 1 inside, 2 out-of-image
    rows_o = np.clip(np.arange(GY)[:, None] * TH + np.arange(TH)[None, :],
                     0, H - 1)
    row_ok = ((np.arange(GY)[:, None] * TH + np.arange(TH)[None, :]) < H)
    mstate, _, _ = BD.mask_state(B, centres, W, H, WP, fov.TILE_NIS_SHARPEN,
                                 rows_o, row_ok)

    _mm, _ = BD.mm_fns(pol)

    def kernel(oy_ref, img, mst_r, rst_r, out_ref, inbuf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=packed_io, ih=IH, gy=GY,
                                total=TOTAL)
        band = BD.band_channels(inbuf, slot, packed_io, 4)
        rsel = rst_r[0]                          # (TH_E, IH)

        # row-select the +-2 band (one-hot matmul — integer texels, exact)
        sel = [_mm(rsel, band[c]) for c in range(4)]      # 4 x (TH_E, WP)
        dec = [s * inv_cmax for s in sel[:3]] + [sel[3] * inv_amax]
        y01 = _get_y(dec[0], dec[1], dec[2], cfg.hdr_mode)  # (TH_E, WP)

        yk = y01 if dt is F32 else y01.astype(jnp.bfloat16)
        cols = [_col_shift_clamp(yk, jx - 2, WP) for jx in range(5)]
        p = [[cols[jx][iy:iy + TH] for jx in range(5)] for iy in range(5)]

        scale_y = dt(1.0) - N._sat_dt((p[2][2] - dt(cfg.kSharpStartY))
                                      * dt(cfg.kSharpScaleY), dt)
        strength = scale_y * dt(cfg.kSharpStrengthScale) + dt(cfg.kSharpStrengthMin)
        limit = (scale_y * dt(cfg.kSharpLimitScale)
                 + dt(cfg.kSharpLimitMin)) * p[2][2]

        half = dt(0.5)
        d0 = N._eval_usm_jax([p[iy][2] for iy in range(5)], strength, limit,
                             cfg, dt)
        d90 = N._eval_usm_jax([p[2][iy] for iy in range(5)], strength, limit,
                              cfg, dt)
        d45 = N._eval_usm_jax(
            [p[1][1], N.hlsl_lerp(p[2][1], p[1][2], half), p[2][2],
             N.hlsl_lerp(p[3][2], p[2][3], half), p[3][3]], strength, limit,
            cfg, dt)
        d135 = N._eval_usm_jax(
            [p[3][1], N.hlsl_lerp(p[3][2], p[2][1], half), p[2][2],
             N.hlsl_lerp(p[2][3], p[1][2], half), p[1][3]], strength, limit,
            cfg, dt)

        # edge-map weights are comparison trees — evaluated in f32 always
        # (bf16 compares are unsupported on the VPU; more accurate anyway)
        pc = {(iy, jx): p[iy + 1][jx + 1].astype(jnp.float32)
              for iy in range(3) for jx in range(3)}
        wgt = N._edge_weights_jax(*N._edge_grads(pc), cfg)
        usm_y = (d0.astype(jnp.float32) * wgt[0]
                 + d90.astype(jnp.float32) * wgt[1]
                 + d45.astype(jnp.float32) * wgt[2]
                 + d135.astype(jnp.float32) * wgt[3])

        ms = mst_r[0, 0].astype(jnp.int32)               # (TH, WP)
        m_in = (ms == 1)[None]
        rgb_in = jnp.stack([d[2:2 + TH] for d in dec[:3]], 0)
        if cfg.hdr_mode == 1:   # multiplicative luma fix (NIS_Scaler.h:951-959)
            k_eps = F32(1e-4) * N.KHDR_COMPRESSION * N.KHDR_COMPRESSION
            old_y = y01[2:2 + TH]
            new_y = jnp.maximum(old_y + usm_y, F32(0.0))
            corrm = (new_y * new_y + k_eps) / (old_y * old_y + k_eps)
            sharp = rgb_in * corrm[None]
        else:                   # SDR and PQ: additive (:961-963)
            sharp = rgb_in + usm_y[None]
        if tint is not None:
            fb = jnp.stack([rgb_in[0], rgb_in[1] * tint[0],
                            rgb_in[2] * tint[1]], 0)
        else:
            fb = rgb_in
        rgb = jnp.where(m_in, sharp, fb)
        # pipeline semantics: sharpened pixels keep the source alpha, the
        # out-of-radius DirectCopy writes alpha 1 (api/pipeline.py nis_sh)
        alpha_src = dec[3][2:2 + TH][None]
        alpha = jnp.where(m_in, alpha_src, F32(1.0))
        if packed_io:
            BD.pack_store_u32(out_ref, rgb, alpha[0], cmax, W)
        else:
            out_ref[0] = jnp.concatenate([rgb, alpha], axis=0)[:, :, :W]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, TH, WP), lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, TH_E, IH), lambda b, i, *_: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, TH, W), lambda b, i, *_: (b, i, 0))
                   if packed_io else
                   pl.BlockSpec((1, 4, TH, W), lambda b, i, *_: (b, 0, i, 0))),
        scratch_shapes=[
            (pltpu.VMEM((2, IH, WP), jnp.uint32) if packed_io
             else pltpu.VMEM((2, 4, IH, WP), jnp.float32)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.uint32)
                   if packed_io else
                   jax.ShapeDtypeStruct((B, 4, H, W), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    statics = [jnp.asarray(oy_all), jnp.asarray(mstate),
               jnp.asarray(rstack, mm_dtype)]

    def fn(img):
        if img.shape[-2:] not in ((H, W), (HP, WP)):
            # a frame whose geometry matches neither the build shape nor
            # the pre-padded pitch is a caller mistake — fail loudly
            # (the pre-padded branch would silently overwrite its columns)
            raise ValueError(
                f"frame shape {img.shape[-2:]} matches neither the build "
                f"shape {(H, W)} nor the pre-padded pitch {(HP, WP)}")
        if not packed_io:
            img = img.astype(jnp.float32)
        if img.shape[-2:] == (HP, WP):
            # Caller pre-padded to fn.pad_to (the device-ring serving
            # format). Its pad content is unspecified (the ring zero-pads),
            # but the clamped column shifts read columns W..WP-1, so
            # rebuild the edge-replicate columns in place.
            if WP != W:
                img = img.at[..., W:].set(img[..., W - 1:W])
        elif packed_io:
            if WP != W:   # edge-replicate so column shifts clamp correctly
                img = jnp.pad(img, ((0, 0), (0, 0), (0, WP - W)), mode="edge")
            if HP != H:
                img = jnp.pad(img, ((0, 0), (0, HP - H), (0, 0)))
        else:
            if WP != W:
                img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, WP - W)),
                              mode="edge")
            if HP != H:
                img = jnp.pad(img, ((0, 0), (0, 0), (0, HP - H), (0, 0)))
        return call(statics[0], img, statics[1], statics[2])

    fn.pad_to = (HP, WP)
    fn.dma_geometry = dict(batch=B, gy=GY, ih=IH, th=TH, out_h=H, out_w=W,
                           oy=np.asarray(oy_all), hp=HP, wp=WP,
                           packed=packed_io)
    return fn


# =============================================================================
# NVScaler (upscale, renderScale != 1)
# =============================================================================
#
# Reference: NVScaler, src/nis/NIS_Scaler.h:589-770. Per output pixel it reads
# a 6x6 luma support at floor(src)+{-2..3}, computes a separable 6-tap filter
# (FilterNormal) plus 4 directional filters with a 64-phase coefficient LUT
# (GetDirFilters/EvalPoly6), blends them by a bilinearly interpolated
# 3x3-Sobel edge map (GetEdgeMap), and adds the luma correction to a bilinear
# RGBA tap.
#
# TPU-native mapping:
#   * All gathers are one-hot matmul-gathers (like kernels/fsr.py). The luma
#     plane is f32 (not integer) so it is split into three bf16 terms
#     (8+8+8 mantissa bits) that gather exactly and reconstruct by exact f32
#     addition.
#   * The per-pixel 64-phase LUT for the diagonal filters: the phase is
#     trunc of (64*fx[c] +/- 64*fy[r]) — an outer f32 sum of static per-axis
#     values — so the looked-up coefficient plane is
#     C[r,c] = T[(a[c] + b[r] + carry) % 64] with carry in {0,1}. That is a
#     circulant sandwich  Boh @ Circ(T) @ Aoh  of static one-hot matrices
#     around the 64x64 circulant of each table column. The carry picks
#     between the circulant and its rolled variant via a per-pixel compare
#     against the exactly recomputed f32 phase. Table values are bf16
#     3-split for exactness.
#   * Horizontal/vertical filter phases are static per axis and arrive as
#     packed row/column coefficient maps.
#   * Foveation gates the expensive path per 128-column chunk; the
#     out-of-radius DirectCopy bilinear fallback (NIS_Upscale.hlsl:77-107,
#     32x24 block granularity baked into the mask-state input) is gated the
#     other way.

_NIS_DYS = (-2, -1, 0, 1, 2, 3)


def _split3(x):
    """Exact 3-way bf16 split of f32 (hi + mid + lo == x for normal values)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _split3_np(x):
    import ml_dtypes
    x = np.asarray(x, np.float32)
    hi = x.astype(ml_dtypes.bfloat16)
    r = x - hi.astype(np.float32)
    mid = r.astype(ml_dtypes.bfloat16)
    lo = (r - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return (hi.astype(np.float32), mid.astype(np.float32),
            lo.astype(np.float32))


def build_nvscaler(batch, in_h, in_w, out_w, out_h, *, nis_cfg: NisConfig,
                   centres, color_bits=8, debug=False, band_rows=128,
                   chunk=128, precision="full", interpret=False, knobs=None):
    """Build the NVScaler kernel.

    precision: "full" = f32 oracle parity; "half" = the
    NIS_USE_HALF_PRECISION analog (NIS_Scaler.h:141-148): the per-pixel
    filter evaluation (FilterNormal, EvalPoly6/LTI, directional
    interpolation trees) runs in bf16, while gathers, phases, the edge map
    (comparison trees) and the final bilinear+correction stay f32.

    8-bit: fn(img) with img (B, in_h, in_w) uint32 (bitcast RGBA8) ->
    (B, out_h, out_w) uint32 packed RGBA8. 10-bit: planar f32 in/out."""
    from ..core.nis_tables import COEF_SCALE, COEF_USM
    from ..ops.nis import (eval_poly6_core, _edge_weights_jax, _edge_grads,
                           nis_source_maps)
    from ..ops.bilinear import bilinear_axis_maps
    from ..ops.common import hlsl_lerp

    kn = knobs or NisDebugKnobs()
    _SKIP_STAGE1 = kn.skip_stage1
    _MM_ONLY = kn.mm_only
    _SKIP_NORMAL = kn.skip_normal
    _SKIP_F0F90 = kn.skip_f0f90
    _SKIP_DIAG = kn.skip_diag
    _SKIP_EDGE = kn.skip_edge

    B = int(batch)
    H, W, OH, OW = int(in_h), int(in_w), int(out_h), int(out_w)
    CHUNK = int(chunk)
    NCHUNK = -(-OW // CHUNK)
    OWP = NCHUNK * CHUNK
    pol = BD.io_policy(color_bits)
    # Resident circulant-columns gate (the vstack below), sized with the
    # ACTUAL matmul element width: mm_dtype is f32 for 10-bit builds, so
    # the resident V is 2x the bf16 size there (advisor r4 finding).
    _NCIRC = 72     # 2 carry variants x 2 tables x 6 taps x 3 bf16 splits
    mm_merge = not kn.no_mm_merge
    vstack_bytes = (NCHUNK * 64 * _NCIRC * CHUNK
                    * np.dtype(pol.mm_dtype).itemsize)
    use_vstatic = mm_merge and vstack_bytes <= 24 * 2**20
    # VMEM auto-shrink (mirrors kernels/fsr.py): the kernel's scoped-VMEM
    # stack scales ~linearly with band_rows x padded width (per-chunk luma/
    # coefficient temporaries + the band scratches). The flagship geometry
    # (band 128, OWP 2304) is measured to fit the 100 MB limit; wider
    # outputs (the 8K stretch aspect) halve the band until the linear
    # estimate fits. The resident vstack is band-independent, so it joins
    # the estimate as a constant term.
    while not kn.no_vmem_shrink and band_rows > 16 and \
            70.0 * (band_rows / 128.0) * (OWP / 2304.0) \
            + (vstack_bytes / 2**20 if use_vstatic else 0.0) > 80.0:
        band_rows = int(band_rows) // 2
    TH = OH if OH <= int(band_rows) else int(band_rows)
    GY = -(-OH // TH)
    TOTAL = B * GY
    cfg = nis_cfg
    cmax, inv_cmax, inv_amax = pol.cmax, pol.inv_cmax, pol.inv_amax
    exact_bf16 = pol.exact_bf16
    tint = (F32(0.7), F32(0.7)) if debug else None
    import ml_dtypes
    dt = F32 if precision == "full" else ml_dtypes.bfloat16
    cast = (lambda x: x) if dt is F32 else (lambda x: x.astype(jnp.bfloat16))

    packed_io = pol.packed_io
    # one-hots and split-luma planes are bf16-exact, but the raw RGB band
    # planes fed to the bilinear-tap gathers are integer texels: exact in
    # bf16 only up to 8 bits. 10-bit texels need f32 operands (+ HIGHEST).
    mm_dtype = pol.mm_dtype
    mm_prec = pol.mm_prec
    HP, WP = BD.input_padding(H, W)

    # ---- static per-axis maps ------------------------------------------------
    pxi, pyi, fx1d, fy1d = nis_source_maps(OW, OH, cfg)
    fx_int = np.clip((fx1d * F32(64)).astype(np.int32), 0, 63)
    fy_int = np.clip((fy1d * F32(64)).astype(np.int32), 0, 63)
    # NVScaler bilinear tap (NIS_Scaler.h:747-761): u = (x+0.5)*kDstNorm
    uo = (np.arange(OW, dtype=np.float32) + F32(0.5)) * cfg.kDstNormX
    vo = (np.arange(OH, dtype=np.float32) + F32(0.5)) * cfg.kDstNormY
    ox0, ofx = bilinear_axis_maps(uo * F32(W) - F32(0.5))
    oy0, ofy = bilinear_axis_maps(vo * F32(H) - F32(0.5))
    # DirectCopy fallback (NIS_Upscale.hlsl:77-90): u = x/outW
    fx0, ffx = bilinear_axis_maps(
        np.arange(OW, dtype=np.float32) / F32(OW) * F32(W) - F32(0.5))
    fy0, ffy = bilinear_axis_maps(
        np.arange(OH, dtype=np.float32) / F32(OH) * F32(H) - F32(0.5))

    def _pad(a):
        a = np.asarray(a)
        return (np.concatenate([a, np.repeat(a[-1:], OWP - OW)])
                if OWP > OW else a)

    pxi_p, fx_int_p, ox0_p, ofx_p, fx0_p, ffx_p, fx1d_p = map(
        _pad, (pxi, fx_int, ox0, ofx, fx0, ffx, fx1d))

    # ---- per-band input row windows -------------------------------------------
    rows_out = np.clip(np.arange(GY)[:, None] * TH + np.arange(TH)[None, :],
                       0, OH - 1)
    ylo = np.minimum.reduce([
        np.clip(pyi[rows_out[:, 0]] - 2, 0, H - 1),
        np.clip(oy0[rows_out[:, 0]], 0, H - 1),
        np.clip(fy0[rows_out[:, 0]], 0, H - 1)])
    yhi = np.maximum.reduce([
        np.clip(pyi[rows_out[:, -1]] + 3, 0, H - 1),
        np.clip(oy0[rows_out[:, -1]] + 1, 0, H - 1),
        np.clip(fy0[rows_out[:, -1]] + 1, 0, H - 1)])

    # ---- derived-rows structure (the kernels/fsr.py prologue trick) ----------
    # pyi is monotone with steps <= 1 (scale in [0.5, 1), NIS_Config.h:226),
    # so each of the 8 luma row blocks (6 dy taps + the eA/eB edge-clamp
    # rows) is a view of ONE extended gather ext[j] = clip(pyi[g*TH-3+j]):
    # block row t == ext[t + 3 + s] with a per-block shift s taking one of
    # two host-verified values, selected by a host mask. The row gather AND
    # the row dimension of the per-chunk column matmul shrink from 8*TH to
    # TH+8 — ~7x fewer gather MACs, bit-identical output (one-hot gathers
    # select single values; the 3-split sum commutes with row slicing).
    EXT_R = TH + 8                       # j = t + 3 + s, s in [-3, 4]
    EXT_RP = BD.round_up(EXT_R, 8)
    rows_ext = np.clip(np.arange(GY)[:, None] * TH - 3
                       + np.arange(EXT_R)[None, :], 0, OH - 1)
    extc = np.clip(pyi[rows_ext], 0, H - 1)            # (GY, EXT_R)
    r_all = rows_out
    _tgts = [np.clip(pyi[r_all] + dy, 0, H - 1) for dy in _NIS_DYS]
    _tgts += [np.clip(np.clip(pyi[r_all], 0, H - 1) + 1, 0, H - 1),
              np.clip(np.clip(pyi[r_all] + 1, 0, H - 1) - 1, 0, H - 1)]

    # Rows at band*TH + t >= OH are clamp-duplicated padding (GY*TH rounds
    # OH up); they are cropped from the output, so the shift match is only
    # required on real rows — without this exemption the last band's
    # clamped tail makes e.g. the dy=-2 block underivable and the whole
    # machine silently falls back (the r5 "neutral" A/B artifact measured
    # legacy vs legacy for exactly this reason).
    _rows_valid = (np.arange(GY)[:, None] * TH
                   + np.arange(TH)[None, :]) < OH        # (GY, TH)

    def _find_shifts(tgt):
        """Global (s1, s2, mask) with extc[:, 3+s : 3+s+TH] == tgt under
        mask-selected s1 else s2 on all non-padding rows, or None if no
        2-shift pair covers."""
        match = {s: extc[:, 3 + s:3 + s + TH] == tgt for s in range(-3, 5)}
        svals = sorted((s for s in match if match[s].any()),
                       key=lambda s: -int(match[s].sum()))
        for s1 in svals:
            for s2 in svals:
                if (match[s1] | match[s2] | ~_rows_valid).all():
                    return s1, s2, match[s1]
        return None

    _rmeta, dmask = [], np.zeros((GY, 8, TH, 1), np.float32)
    derive_rows = mm_merge and kn.derive_rows
    for blk, tgt in enumerate(_tgts):
        found = _find_shifts(tgt) if derive_rows else None
        if found is None:
            derive_rows = False
            break
        s1, s2, m1 = found
        _rmeta.append((int(s1), int(s2), s1 != s2))
        dmask[:, blk, :, 0] = m1
    if derive_rows:  # the extended gather may reach a few rows further out
        ylo = np.minimum(ylo, extc.min(axis=1))
        yhi = np.maximum(yhi, extc.max(axis=1))
    IH, oy_all = BD.row_windows(ylo, yhi, HP)

    # ---- per-chunk input column windows ----------------------------------------
    cw0, cKc = [], 0
    for k in range(NCHUNK):
        c0, c1 = k * CHUNK, k * CHUNK + CHUNK - 1
        klo = min(int(np.clip(pxi_p[c0] - 2, 0, W - 1)),
                  int(np.clip(ox0_p[c0], 0, W - 1)),
                  int(np.clip(fx0_p[c0], 0, W - 1)))
        khi = max(int(np.clip(pxi_p[c1] + 3, 0, W - 1)),
                  int(np.clip(ox0_p[c1] + 1, 0, W - 1)),
                  int(np.clip(fx0_p[c1] + 1, 0, W - 1)))
        cw0.append(klo)
        cKc = max(cKc, khi - klo + 1)
    KC = min(cKc, W)
    cw0 = [min(w0, W - KC) for w0 in cw0]

    # ---- one-hot gather stacks ------------------------------------------------
    # rows: [dy=-2..3 (6 blocks), eA=clip(clip(p)+1), eB=clip(clip(p+1)-1),
    #        y0op, y1op, y0fb, y1fb] -> (GY, 12*TH, IH)
    #
    # eA/eB are the edge-map clamp-composition blocks: the reference
    # evaluates the edge map inside an edge-clamped shared-memory tile
    # (NIS_Scaler.h:630-668), so the 3x3 neighborhood of corner pixel
    # q = clip(p+ci) reads rows clip(q +- 1) — which differs from the tap
    # clamp clip(p+ci+-1) exactly when p == -1 (eA vs dy=+1) or p == H-1
    # (eB vs dy=0). With these two blocks (and the column analogs) the
    # kernel is exact at texture borders with no XLA patching.
    #
    # (A round-3 experiment derived all 12 blocks from one extended gather
    # per RGBA channel — bit-equal but a measured ~2
    # ms/pair LOSS on v5e: moving the luma computation after the gather
    # multiplies the VPU getY work by the tap count, and the stacked
    # per-channel chunk matmuls outweigh the smaller row-gather. The
    # 3-split luma structure below is the measured-faster design.)
    def _row_oh(rows, band):
        loc = np.clip(rows, 0, H - 1) - oy_all[band]
        return loc[:, None] == np.arange(IH)[None, :]

    if derive_rows:
        # [extended luma gather (EXT_RP) | y0op | y1op | y0fb | y1fb]
        N_RSTK = EXT_RP + 4 * TH
        rstack = np.zeros((GY, N_RSTK, IH), np.float32)
        for i in range(GY):
            ext_oh = np.zeros((EXT_RP, IH), np.float32)
            ext_oh[:EXT_R] = _row_oh(extc[i], i)
            blocks = [ext_oh,
                      _row_oh(oy0[rows_out[i]], i),
                      _row_oh(oy0[rows_out[i]] + 1, i),
                      _row_oh(fy0[rows_out[i]], i),
                      _row_oh(fy0[rows_out[i]] + 1, i)]
            rstack[i] = np.concatenate(blocks, axis=0)
    else:
        N_RSTK = 12 * TH
        rstack = np.zeros((GY, N_RSTK, IH), np.float32)
        for i in range(GY):
            r = rows_out[i]
            blocks = [_row_oh(pyi[r] + dy, i) for dy in _NIS_DYS]
            blocks += [_row_oh(np.clip(pyi[r], 0, H - 1) + 1, i),
                       _row_oh(np.clip(pyi[r] + 1, 0, H - 1) - 1, i)]
            blocks += [_row_oh(oy0[r], i), _row_oh(oy0[r] + 1, i),
                       _row_oh(fy0[r], i), _row_oh(fy0[r] + 1, i)]
            rstack[i] = np.concatenate(blocks, axis=0)

    sstack = np.zeros((NCHUNK, KC, 12 * CHUNK), np.float32)
    for k in range(NCHUNK):
        cs_ = slice(k * CHUNK, k * CHUNK + CHUNK)
        blocks = [np.clip(pxi_p[cs_] + dx, 0, W - 1) - cw0[k] for dx in _NIS_DYS]
        blocks += [np.clip(np.clip(pxi_p[cs_], 0, W - 1) + 1, 0, W - 1) - cw0[k],
                   np.clip(np.clip(pxi_p[cs_] + 1, 0, W - 1) - 1, 0, W - 1)
                   - cw0[k]]
        blocks += [np.clip(ox0_p[cs_], 0, W - 1) - cw0[k],
                   np.clip(ox0_p[cs_] + 1, 0, W - 1) - cw0[k],
                   np.clip(fx0_p[cs_], 0, W - 1) - cw0[k],
                   np.clip(fx0_p[cs_] + 1, 0, W - 1) - cw0[k]]
        sstack[k] = (np.arange(KC)[:, None] == np.concatenate(blocks)[None, :])

    # ---- circulant LUT blocks -----------------------------------------------
    # index j = ((v*2 + t)*6 + i)*3 + s  for variant v (carry), table t
    # (scale/usm), tap i, split s; Circ[m, k] = split_s(T_t[(m+k+v) % 64, i])
    mgrid = np.arange(64)[:, None] + np.arange(64)[None, :]
    circs = []
    for v in (0, 1):
        for tab in (COEF_SCALE, COEF_USM):
            for i in range(6):
                col = np.asarray(tab[:, i], np.float32)
                circs.extend(_split3_np(col[(mgrid + v) % 64]))
    NCIRC = len(circs)  # 72
    circ_stack = np.stack(circs, 0)

    # ---- host-precomputed circulant columns: V = Circ @ Aoh -------------------
    # cc = (Boh @ Circ_j) @ Aoh == Boh @ (Circ_j @ Aoh), and Circ_j @ Aoh is
    # fully static: V[k][m, j*CHUNK + c] = Circ_j[m, fx_int[k*CHUNK + c]].
    # One (TH, 64) x (64, NCIRC*CHUNK) matmul per chunk per diagonal then
    # replaces the 2*NCIRC per-band sandwich matmuls — identical MACs and
    # bit-identical values (one-hot gathers select single bf16-exact split
    # values), ~150 fewer matmul launches per band. Falls back to the
    # sandwich when the resident V would blow the VMEM budget (very wide
    # outputs, e.g. the 8K aspect).
    assert NCIRC == _NCIRC, (NCIRC, _NCIRC)   # gate above sized with _NCIRC
    vstack = None
    if use_vstatic:
        vstack = np.zeros((NCHUNK, 64, NCIRC * CHUNK), np.float32)
        for k in range(NCHUNK):
            a = fx_int_p[k * CHUNK:k * CHUNK + CHUNK]
            for j in range(NCIRC):
                vstack[k, :, j * CHUNK:(j + 1) * CHUNK] = circ_stack[j][:, a]

    # phase one-hots: 45deg uses b = trunc(64*fy); 135deg uses 63 - b
    b45 = fy_int[rows_out]
    boh45 = np.zeros((GY, TH, 64), np.float32)
    boh135 = np.zeros((GY, TH, 64), np.float32)
    for i in range(GY):
        boh45[i] = b45[i][:, None] == np.arange(64)[None, :]
        boh135[i] = (63 - b45[i])[:, None] == np.arange(64)[None, :]
    aoh = np.zeros((NCHUNK, 64, CHUNK), np.float32)
    for k in range(NCHUNK):
        aoh[k] = (np.arange(64)[:, None]
                  == fx_int_p[k * CHUNK:k * CHUNK + CHUNK][None, :])

    # ---- packed static per-row / per-column maps -------------------------------
    # layout (18 slots): 0 f, 1 64f, 2 phase-int, 3..8 COEF_SCALE[ph]
    # (= FilterNormal coef = f0/f90 scale coef), 9..14 COEF_USM[ph],
    # 15 lo-mask(ph<=32), 16 op-bilinear frac, 17 fallback frac
    def _coefs(tab, ph):
        return [np.asarray(tab[:, i].take(ph), np.float32) for i in range(6)]

    rowpack = np.zeros((GY, 18, TH, 1), np.float32)
    for i in range(GY):
        r = rows_out[i]
        ph = fy_int[r]
        cols = ([fy1d[r], F32(64) * fy1d[r], ph.astype(np.float32)]
                + _coefs(COEF_SCALE, ph) + _coefs(COEF_USM, ph)
                + [(ph <= 32).astype(np.float32), ofy[r], ffy[r]])
        rowpack[i] = np.stack(cols, 0)[:, :, None]

    colpack = np.zeros((NCHUNK, 18, 1, CHUNK), np.float32)
    for k in range(NCHUNK):
        cs_ = slice(k * CHUNK, k * CHUNK + CHUNK)
        ph = fx_int_p[cs_]
        cols = ([fx1d_p[cs_], F32(64) * fx1d_p[cs_], ph.astype(np.float32)]
                + _coefs(COEF_SCALE, ph) + _coefs(COEF_USM, ph)
                + [(ph <= 32).astype(np.float32), ofx_p[cs_], ffx_p[cs_]])
        colpack[k] = np.stack(cols, 0)[:, None, :]

    # ---- mask state over 32x24 scaler blocks (NIS_Upscale.hlsl:95-107) ----------
    row_ok = (np.arange(GY)[:, None] * TH + np.arange(TH)[None, :]) < OH
    mstate, cls_flat, band_cls = BD.mask_state(
        B, centres, OW, OH, OWP, fov.TILE_NIS_SCALER, rows_out, row_ok,
        chunk=CHUNK)

    _mm, _ = BD.mm_fns(pol)

    def kernel(oy_ref, cls_ref, bcls_ref,
               img, mst_r, rst_r, sst_r, boh45_r, boh135_r, *rest):
        rest = list(rest)
        dmk_r = rest.pop(0) if derive_rows else None
        if use_vstatic:
            vst_r, rowp_r, colp_r, out_ref, inbuf, s_nis, s_fb, sems = rest
            aoh_r = circ_r = None
        else:
            (aoh_r, circ_r, rowp_r, colp_r, out_ref,
             inbuf, s_nis, s_fb, sems) = rest
            vst_r = None
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=packed_io, ih=IH, gy=GY,
                                total=TOTAL)
        band = BD.band_channels(inbuf, slot, packed_io, 4)

        if derive_rows:
            r_ext = rst_r[0][:EXT_RP]   # ONE extended luma row gather
            r_taps = None
            r_op = rst_r[0][EXT_RP:EXT_RP + 2 * TH]
            r_fb = rst_r[0][EXT_RP + 2 * TH:]
        else:
            r_taps = rst_r[0][:8 * TH]  # 6 dy blocks + eA + eB (edge rows)
            r_op = rst_r[0][8 * TH:10 * TH]
            r_fb = rst_r[0][10 * TH:]

        rp = rowp_r[0]                           # (18, TH, 1)
        fy, fy64 = rp[0], rp[1]
        byi = rp[2].astype(jnp.int32)
        cy = [rp[3 + j] for j in range(6)]
        cuy = [rp[9 + j] for j in range(6)]
        loy = rp[15] > F32(0.5)
        ofy_t, ffy_t = rp[16], rp[17]

        one = F32(1.0)
        n255 = F32(255.0)

        def _fb_chunk(k, c0, w0, ffx_c):
            for c in range(3):
                gb = _mm(r_fb, band[c][:, w0:w0 + KC])
                if mm_merge:
                    t01 = _mm(gb, sst_r[k][:, 10 * CHUNK:]) * inv_cmax
                    t0, t1 = t01[:, :CHUNK], t01[:, CHUNK:]
                else:
                    t0 = _mm(gb, sst_r[k][:, 10 * CHUNK:11 * CHUNK]) * inv_cmax
                    t1 = _mm(gb, sst_r[k][:, 11 * CHUNK:]) * inv_cmax
                top = t0[:TH] * (one - ffx_c) + t1[:TH] * ffx_c
                bot = t0[TH:] * (one - ffx_c) + t1[TH:] * ffx_c
                s_fb[c, :, c0:c0 + CHUNK] = top * (one - ffy_t) + bot * ffy_t

        def _loop_mixed(gated=True):
            # scaler-only band prologue: the exact 3-split luma plane (getY,
            # NIS_Scaler.h:167) and the circulant stage 1
            # W[j] = Boh @ Circ_j — skipped entirely for fully-outside bands.
            # gated=False is the fully-inside band variant: the per-chunk
            # pl.when pairs (2 scheduling barriers each) disappear
            y01b = _get_y(band[0].astype(jnp.float32) * inv_cmax,
                          band[1].astype(jnp.float32) * inv_cmax,
                          band[2].astype(jnp.float32) * inv_cmax,
                          cfg.hdr_mode)
            ysp = _split3(y01b)
            if use_vstatic or _SKIP_DIAG:
                w45 = w135 = None      # per-chunk Boh @ V replaces the sandwich
            else:
                w45 = jnp.concatenate([_mm(boh45_r[0], circ_r[j])
                                       for j in range(NCIRC)], axis=0)
                w135 = jnp.concatenate([_mm(boh135_r[0], circ_r[j])
                                        for j in range(NCIRC)], axis=0)
            for k in ([] if _SKIP_STAGE1 else range(NCHUNK)):
                c0 = k * CHUNK
                w0 = cw0[k]
                cp = colp_r[k]                       # (18, 1, CHUNK)

                def _scale_chunk(k=k, c0=c0, w0=w0, cp=cp):
                    fx, fx64 = cp[0], cp[1]
                    axi = cp[2].astype(jnp.int32)
                    cx = [cp[3 + j] for j in range(6)]
                    cux = [cp[9 + j] for j in range(6)]
                    lox = cp[15] > F32(0.5)
                    ofx_c = cp[16]

                    sall = sst_r[k]
                    # ---- 6x6 luma taps (3 exact bf16 splits) -------------------
                    # g rows: 6 dy tap blocks + the eA/eB edge rows (indices
                    # 6, 7); col blocks 6, 7 are the eA'/eB' edge columns.
                    # Edge-only taps are materialized just for the (row, col)
                    # pairs the 4 corner 3x3 neighborhoods read.
                    p01 = {}
                    if derive_rows:
                        # r5: the extended gather carries TH+8 rows instead
                        # of 8*TH; each of the 8 row blocks is ONE static
                        # sublane slice (+ one mask select for two-shift
                        # blocks) of the summed column-matmul output, taken
                        # at FULL 8*CHUNK width so the per-dx extraction
                        # below is pure 128-aligned lane slicing (a free
                        # view, no relayout). Summing the 3 bf16 splits
                        # before slicing is bit-identical (slicing commutes
                        # with the adds). First cut sliced per (dy, dx) —
                        # ~44 sublane-rotate relayouts per chunk, measured
                        # 55 ms/pair vs 7.7 legacy on-chip; this form keeps
                        # it to 8 per chunk.
                        ge = [_mm(r_ext, ysp[s][:, w0:w0 + KC])
                              for s in range(3)]
                        t3 = [_mm(gs, sall[:, :8 * CHUNK]) for gs in ge]
                        tme = (t3[0] + t3[1]) + t3[2]   # (EXT_RP, 8*CHUNK)

                        blk = {}
                        for dyk in range(8):
                            s1, s2, need = _rmeta[dyk]
                            st1, st2 = 3 + s1, 3 + s2
                            if kn.derive_aligned:       # timing probe only
                                st1, st2 = st1 & ~7, st2 & ~7
                            a = tme[st1:st1 + TH]
                            if need and not kn.derive_noselect:
                                b = tme[st2:st2 + TH]
                                a = jnp.where(dmk_r[0, dyk] > F32(0.5),
                                              a, b)
                            blk[dyk] = a                # (TH, 8*CHUNK)

                        for dxk in range(8):
                            dyks = ((range(6) if dxk in (0, 5) else range(8))
                                    if dxk < 6 else (1, 2, 3, 4, 6, 7))
                            cs3 = slice(dxk * CHUNK, (dxk + 1) * CHUNK)
                            for dyk in dyks:
                                p01[dyk, dxk] = blk[dyk][:, cs3]
                    elif mm_merge:
                        # ONE column matmul per split over all 8 dx blocks
                        # (24 -> 3 launches; identical MACs — the old form
                        # already computed every row for each block)
                        g = [_mm(r_taps, ysp[s][:, w0:w0 + KC])
                             for s in range(3)]
                        tm = [_mm(gs, sall[:, :8 * CHUNK]) for gs in g]
                        for dxk in range(8):
                            dyks = ((range(6) if dxk in (0, 5) else range(8))
                                    if dxk < 6 else (1, 2, 3, 4, 6, 7))
                            cs3 = slice(dxk * CHUNK, (dxk + 1) * CHUNK)
                            for dyk in dyks:
                                sl = slice(dyk * TH, (dyk + 1) * TH)
                                p01[dyk, dxk] = ((tm[0][sl, cs3]
                                                  + tm[1][sl, cs3])
                                                 + tm[2][sl, cs3])
                    else:
                        g = [_mm(r_taps, ysp[s][:, w0:w0 + KC])
                             for s in range(3)]
                        for dxk in range(8):
                            scol = sall[:, dxk * CHUNK:(dxk + 1) * CHUNK]
                            t = [_mm(gs, scol) for gs in g]
                            if dxk < 6:
                                dyks = range(6) if dxk in (0, 5) else range(8)
                            else:      # eA'/eB' columns: edge-map rows only
                                dyks = (1, 2, 3, 4, 6, 7)
                            for dyk in dyks:
                                sl = slice(dyk * TH, (dyk + 1) * TH)
                                p01[dyk, dxk] = (t[0][sl] + t[1][sl]) + t[2][sl]
                    p = {k2: cast(v * n255) for k2, v in p01.items()
                         if k2[0] < 6 and k2[1] < 6}
                    if _MM_ONLY:   # profiling: gather + merge cost only
                        acc = (p[2, 2] + p[3, 3]).astype(jnp.float32)
                        for c in range(4):
                            s_nis[c, :, c0:c0 + CHUNK] = acc
                        return

                    # half mode: filter math below runs in dt — coefficient
                    # maps and lerp fractions get dt views (compares stay on
                    # the f32 originals; the VPU has no bf16 compare)
                    fxd, fyd = cast(fx), cast(fy)
                    cxd, cuxd = [cast(c) for c in cx], [cast(c) for c in cux]
                    cyd, cuyd = [cast(c) for c in cy], [cast(c) for c in cuy]

                    # ---- FilterNormal (NIS_Scaler.h:436-453) -------------------
                    if _SKIP_NORMAL:  # profiling
                        pixel_n = p[2, 2]
                    else:
                        pixel_n = None
                        for j in range(6):
                            v_acc = p[0, j] * cyd[0]
                            for ii in range(1, 6):
                                v_acc = v_acc + p[ii, j] * cyd[ii]
                            term = v_acc * cxd[j]
                            pixel_n = (term if pixel_n is None
                                       else pixel_n + term)

                    # ---- f0 / f90 ----------------------------------------------
                    if _SKIP_F0F90:  # profiling
                        f0 = f90 = pixel_n
                    else:
                        interp0 = [hlsl_lerp(p[ii, 2], p[ii, 3], fxd)
                                   for ii in range(6)]
                        f0 = eval_poly6_core(interp0, cyd, cuyd, loy, cfg, dt)
                        interp90 = [hlsl_lerp(p[2, ii], p[3, ii], fyd)
                                    for ii in range(6)]
                        f90 = eval_poly6_core(interp90, cxd, cuxd, lox,
                                              cfg, dt)

                    # ---- diagonal phases + circulant coefficient planes --------
                    if _SKIP_DIAG:   # profiling
                        pass
                    elif use_vstatic:
                        # Boh @ V: (TH, 64) x (64, NCIRC*CHUNK) — one matmul
                        # per diagonal, j blocks along lanes
                        cc45 = _mm(boh45_r[0], vst_r[k])
                        cc135 = _mm(boh135_r[0], vst_r[k])

                        def coefs(cc, v, t):
                            out = []
                            for ii in range(6):
                                j0 = ((v * 2 + t) * 6 + ii) * 3
                                out.append(
                                    (cc[:, j0 * CHUNK:(j0 + 1) * CHUNK]
                                     + cc[:, (j0 + 1) * CHUNK:(j0 + 2) * CHUNK])
                                    + cc[:, (j0 + 2) * CHUNK:(j0 + 3) * CHUNK])
                            return out
                    else:
                        cc45 = _mm(w45, aoh_r[k])    # (72*TH, CHUNK)
                        cc135 = _mm(w135, aoh_r[k])

                        def coefs(cc, v, t):
                            out = []
                            for ii in range(6):
                                j0 = (((v * 2 + t) * 6 + ii) * 3)
                                out.append((cc[j0 * TH:(j0 + 1) * TH]
                                            + cc[(j0 + 1) * TH:(j0 + 2) * TH])
                                           + cc[(j0 + 2) * TH:(j0 + 3) * TH])
                            return out

                    if _SKIP_DIAG:   # profiling
                        f45 = f135 = pixel_n
                    else:
                        s45 = fx64 + fy64
                        s45 = jnp.where(s45 >= F32(64.0), s45 - F32(64.0), s45)
                        ph45 = s45.astype(jnp.int32)
                        base45 = axi + byi
                        base45 = jnp.where(base45 >= 64, base45 - 64, base45)
                        cr45 = (ph45 != base45)[None]
                        cs45 = [cast(jnp.where(cr45[0], a, b)) for a, b in
                                zip(coefs(cc45, 1, 0), coefs(cc45, 0, 0))]
                        cu45 = [cast(jnp.where(cr45[0], a, b)) for a, b in
                                zip(coefs(cc45, 1, 1), coefs(cc45, 0, 1))]

                        s135 = F32(64.0) + (fx64 - fy64)
                        s135 = jnp.where(s135 >= F32(64.0), s135 - F32(64.0), s135)
                        ph135 = s135.astype(jnp.int32)
                        base135 = axi - byi + 63
                        base135 = jnp.where(base135 >= 64, base135 - 64, base135)
                        cs135 = [cast(jnp.where((ph135 != base135), a, b))
                                 for a, b in
                                 zip(coefs(cc135, 1, 0), coefs(cc135, 0, 0))]
                        cu135 = [cast(jnp.where((ph135 != base135), a, b))
                                 for a, b in
                                 zip(coefs(cc135, 1, 1), coefs(cc135, 0, 1))]

                        # ---- diagonal interpolation trees (NIS_Scaler.h:483-583) ---
                        b45f = F32(0.5) + F32(0.5) * (fx - fy)
                        hi45 = b45f >= F32(0.5)
                        b45v = cast(b45f)
                        b45p = cast(jnp.where(hi45, b45f - F32(0.5),
                                              F32(0.5) - b45f))
                        t45 = [None] * 7
                        t45[1] = hlsl_lerp(p[2, 1], p[1, 2], b45v)
                        t45[3] = hlsl_lerp(p[3, 2], p[2, 3], b45v)
                        t45[5] = hlsl_lerp(p[4, 3], p[3, 4], b45v)
                        t45[0] = jnp.where(hi45, hlsl_lerp(p[1, 1], p[0, 2], b45p),
                                           hlsl_lerp(p[1, 1], p[2, 0], b45p))
                        t45[2] = jnp.where(hi45, hlsl_lerp(p[2, 2], p[1, 3], b45p),
                                           hlsl_lerp(p[2, 2], p[3, 1], b45p))
                        t45[4] = jnp.where(hi45, hlsl_lerp(p[3, 3], p[2, 4], b45p),
                                           hlsl_lerp(p[3, 3], p[4, 2], b45p))
                        t45[6] = jnp.where(hi45, hlsl_lerp(p[4, 4], p[3, 5], b45p),
                                           hlsl_lerp(p[4, 4], p[5, 3], b45p))
                        wrap = (fx + fy) >= F32(1.0)
                        interp45 = [jnp.where(wrap, t45[ii + 1], t45[ii])
                                    for ii in range(6)]
                        f45 = eval_poly6_core(interp45, cs45, cu45, ph45 <= 32,
                                              cfg, dt)

                        b135f = F32(0.5) * (fx + fy)
                        hi135 = b135f >= F32(0.5)
                        b135v = cast(b135f)
                        b135p = cast(jnp.where(hi135, b135f - F32(0.5),
                                               F32(0.5) - b135f))
                        t135 = [None] * 7
                        t135[1] = hlsl_lerp(p[3, 1], p[4, 2], b135v)
                        t135[3] = hlsl_lerp(p[2, 2], p[3, 3], b135v)
                        t135[5] = hlsl_lerp(p[1, 3], p[2, 4], b135v)
                        t135[0] = jnp.where(hi135, hlsl_lerp(p[4, 1], p[5, 2], b135p),
                                            hlsl_lerp(p[4, 1], p[3, 0], b135p))
                        t135[2] = jnp.where(hi135, hlsl_lerp(p[3, 2], p[4, 3], b135p),
                                            hlsl_lerp(p[3, 2], p[2, 1], b135p))
                        t135[4] = jnp.where(hi135, hlsl_lerp(p[2, 3], p[3, 4], b135p),
                                            hlsl_lerp(p[2, 3], p[1, 2], b135p))
                        t135[6] = jnp.where(hi135, hlsl_lerp(p[1, 4], p[2, 5], b135p),
                                            hlsl_lerp(p[1, 4], p[0, 3], b135p))
                        wrap = (F32(1.0) + (fx - fy)) >= F32(1.0)
                        interp135 = [jnp.where(wrap, t135[ii + 1], t135[ii])
                                     for ii in range(6)]
                        f135 = eval_poly6_core(interp135, cs135, cu135,
                                               ph135 <= 32, cfg, dt)

                    # ---- edge map at the 4 corners, from the same luma taps ----
                    # corner q = clip(p+ci) reads rows clip(q-1), q, clip(q+1)
                    # (shared-memory clamp composition): ci=0 -> blocks
                    # (dy=-1, dy=0, eA); ci=1 -> (eB, dy=+1, dy=+2); columns
                    # likewise — exact at borders, identical to the tap
                    # blocks everywhere else.
                    if _SKIP_EDGE:   # profiling
                        wk = [F32(0.25) * n255] * 4
                    else:
                        esel = ((1, 2, 6), (7, 3, 4))
                        ws = []
                        for ci in (0, 1):
                            for cj in (0, 1):
                                p3 = {(rr, cc2):
                                      p01[esel[ci][rr], esel[cj][cc2]]
                                      for rr in range(3) for cc2 in range(3)}
                                ws.append(
                                    _edge_weights_jax(*_edge_grads(p3), cfg))
                        wk = []
                        for k4 in range(4):
                            h0 = hlsl_lerp(ws[0][k4], ws[1][k4], fx)
                            h1 = hlsl_lerp(ws[2][k4], ws[3][k4], fx)
                            wk.append(hlsl_lerp(h0, h1, fy) * n255)

                    op_y = (f0 * wk[0] + f90 * wk[1] + f45 * wk[2] + f135 * wk[3]
                            + pixel_n * (n255 - wk[0] - wk[1] - wk[2] - wk[3])
                            ) * F32(1.0 / 255.0)

                    # ---- NVScaler bilinear RGBA tap + luma correction ----------
                    op = []
                    for c in range(4):
                        sc = inv_cmax if c < 3 else inv_amax
                        gb = _mm(r_op, band[c][:, w0:w0 + KC])
                        if mm_merge:
                            t01 = _mm(gb, sall[:, 8 * CHUNK:10 * CHUNK]) * sc
                            t0, t1 = t01[:, :CHUNK], t01[:, CHUNK:]
                        else:
                            t0 = _mm(gb, sall[:, 8 * CHUNK:9 * CHUNK]) * sc
                            t1 = _mm(gb, sall[:, 9 * CHUNK:10 * CHUNK]) * sc
                        # bilinear_sample_jax form: c00*(1-fx) + c10*fx
                        top = t0[:TH] * (one - ofx_c) + t1[:TH] * ofx_c
                        bot = t0[TH:] * (one - ofx_c) + t1[TH:] * ofx_c
                        op.append(top * (one - ofy_t) + bot * ofy_t)
                    if cfg.hdr_mode == 1:  # multiplicative (NIS_Scaler.h:749-756)
                        k_eps = F32(1e-4)
                        k_norm = np.divide(
                            F32(1.0), n255 * N.KHDR_COMPRESSION,
                            dtype=np.float32)
                        op_yn = jnp.maximum(op_y, F32(0.0)) * k_norm
                        lin = (F32(0.2126) * op[0] + F32(0.7152) * op[1]
                               + F32(0.0722) * op[2])      # getYLinear
                        corr = (op_yn * op_yn + k_eps) / (
                            jnp.maximum(lin, F32(0.0)) + k_eps)
                        s_nis[0, :, c0:c0 + CHUNK] = op[0] * corr
                        s_nis[1, :, c0:c0 + CHUNK] = op[1] * corr
                        s_nis[2, :, c0:c0 + CHUNK] = op[2] * corr
                    else:                  # SDR / PQ: additive (:758-761)
                        corr = op_y * F32(1.0 / 255.0) - _get_y(
                            op[0], op[1], op[2], cfg.hdr_mode)
                        s_nis[0, :, c0:c0 + CHUNK] = op[0] + corr
                        s_nis[1, :, c0:c0 + CHUNK] = op[1] + corr
                        s_nis[2, :, c0:c0 + CHUNK] = op[2] + corr
                    s_nis[3, :, c0:c0 + CHUNK] = op[3]

                if gated:
                    tcls = cls_ref[step * NCHUNK + k]
                    pl.when(tcls > 0)(_scale_chunk)
                    pl.when(tcls < 2)(
                        lambda k=k, c0=c0, w0=w0, cp=cp:
                        _fb_chunk(k, c0, w0, cp[17]))
                else:
                    _scale_chunk()


        def _loop_fb():
            for k in range(NCHUNK):
                _fb_chunk(k, k * CHUNK, cw0[k], colp_r[k][17])

        # band-level fast paths (see kernels/fsr.py): fully-outside bands
        # run an unconditional fallback loop, fully-inside bands the
        # ungated scaler loop — each behind one band-level branch
        bcls = bcls_ref[step]
        pl.when(bcls == 0)(_loop_fb)
        if kn.no_inside_fast:
            pl.when(bcls != 0)(lambda: _loop_mixed(True))
        else:
            pl.when(bcls == 1)(lambda: _loop_mixed(True))
            pl.when(bcls == 2)(lambda: _loop_mixed(False))

        # ---- band-wide select ------------------------------------------------
        ms = mst_r[0, 0].astype(jnp.int32)
        m_in = (ms == 1)[None]
        if tint is not None:
            fbv = jnp.stack([s_fb[0], s_fb[1] * tint[0], s_fb[2] * tint[1]], 0)
        else:
            fbv = s_fb[:]
        rgb = jnp.where(m_in, s_nis[:3], fbv)
        alpha = jnp.where(m_in, s_nis[3:4], F32(1.0))
        if packed_io:
            BD.pack_store_u32(out_ref, rgb, alpha[0], cmax, OW)
        else:
            out_ref[0] = jnp.concatenate([rgb, alpha], axis=0)[:, :, :OW]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, TH, OWP), lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, N_RSTK, IH), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((NCHUNK, KC, 12 * CHUNK), lambda b, i, *_: (0, 0, 0)),
            pl.BlockSpec((1, TH, 64), lambda b, i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH, 64), lambda b, i, *_: (i, 0, 0)),
        ] + ([pl.BlockSpec((1, 8, TH, 1), lambda b, i, *_: (i, 0, 0, 0))]
             if derive_rows else []) \
          + ([pl.BlockSpec((NCHUNK, 64, NCIRC * CHUNK),
                           lambda b, i, *_: (0, 0, 0))]
             if use_vstatic else
             [pl.BlockSpec((NCHUNK, 64, CHUNK), lambda b, i, *_: (0, 0, 0)),
              pl.BlockSpec((NCIRC, 64, 64), lambda b, i, *_: (0, 0, 0))]) + [
            pl.BlockSpec((1, 18, TH, 1), lambda b, i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((NCHUNK, 18, 1, CHUNK), lambda b, i, *_: (0, 0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, TH, OW), lambda b, i, *_: (b, i, 0))
                   if packed_io else
                   pl.BlockSpec((1, 4, TH, OW), lambda b, i, *_: (b, 0, i, 0))),
        scratch_shapes=[
            (pltpu.VMEM((2, IH, WP), jnp.uint32) if packed_io
             else pltpu.VMEM((2, 4, IH, WP), jnp.float32)),
            pltpu.VMEM((4, TH, OWP), jnp.float32),
            pltpu.VMEM((3, TH, OWP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, OH, OW), jnp.uint32)
                   if packed_io else
                   jax.ShapeDtypeStruct((B, 4, OH, OW), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kn.vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )

    statics = [jnp.asarray(oy_all), jnp.asarray(cls_flat),
               jnp.asarray(band_cls), jnp.asarray(mstate),
               jnp.asarray(rstack, mm_dtype), jnp.asarray(sstack, mm_dtype),
               jnp.asarray(boh45, mm_dtype), jnp.asarray(boh135, mm_dtype)] \
        + ([jnp.asarray(dmask)] if derive_rows else []) \
        + ([jnp.asarray(vstack, mm_dtype)] if use_vstatic else
           [jnp.asarray(aoh, mm_dtype), jnp.asarray(circ_stack, mm_dtype)]) \
        + [jnp.asarray(rowpack), jnp.asarray(colpack)]

    fn = BD.make_io_fn(
        lambda img: call(statics[0], statics[1], statics[2], img,
                         *statics[3:]),
        H, W, HP, WP, packed_io,
        geom=dict(batch=B, gy=GY, ih=IH, th=TH, out_h=OH, out_w=OW,
                  oy=np.asarray(oy_all)))
    # Published so tests/tools can assert the derived-rows gather engaged
    # (it silently falls back to the legacy 8*TH row gather whenever a luma
    # row block is not a 2-shift view of the extended gather).
    fn.derive_rows = derive_rows
    return fn
