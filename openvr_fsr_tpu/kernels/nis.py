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

__all__ = ["build_nvsharpen"]

F32 = np.float32


def _round_up(x, m):
    return -(-int(x) // m) * m


def _shift_clamp(plane, dy, dx, th, wp):
    """plane[(y+dy).clip, (x+dx).clip] for a (rows, wp) plane holding rows
    [-2, th+2) of the image band (already row-clamped by the gather); columns
    clamp at the image border which coincides with the plane edge."""
    rows = plane[2 + dy:2 + dy + th]
    if dx == 0:
        return rows
    if dx < 0:
        edge = rows[:, :1]
        reps = [edge] * (-dx) + [rows[:, :wp + dx]]
    else:
        edge = rows[:, wp - 1:wp]
        reps = [rows[:, dx:]] + [edge] * dx
    return jnp.concatenate(reps, axis=1)


def build_nvsharpen(batch, h, w, *, nis_cfg: NisConfig, centres, color_bits=8,
                    debug=False, band_rows=256, interpret=False):
    """Build the NVSharpen kernel. fn(img) -> rgba, img (B, 4, h, w) float32
    integer texels, result (B, 4, h, w) f32 in [0, 1] (rgb sharpened)."""
    B, H, W = int(batch), int(h), int(w)
    TH = H if H <= int(band_rows) else int(band_rows)
    TH_E = TH + 4                     # +-2 luma support rows
    GY = -(-H // TH)
    TOTAL = B * GY

    cmax = F32((1 << color_bits) - 1)
    inv_cmax = F32(1.0) / cmax
    exact_bf16 = color_bits <= 8
    tint = (F32(0.7), F32(0.7)) if debug else None
    cfg = nis_cfg

    in_dtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    mm_dtype = in_dtype
    mm_prec = None if exact_bf16 else jax.lax.Precision.HIGHEST
    row_align = 16 if exact_bf16 else 8
    HP = _round_up(H, row_align)
    WP = _round_up(W, 128)

    rows_e = np.clip(np.arange(GY)[:, None] * TH - 2
                     + np.arange(TH_E)[None, :], 0, H - 1)
    lo_a = (rows_e[:, 0] // row_align) * row_align
    IH = min(_round_up(int((rows_e[:, -1] - lo_a + 1).max()), row_align), HP)
    oy_all = np.minimum(lo_a, HP - IH).astype(np.int32)

    rstack = np.zeros((GY, TH_E, IH), np.float32)
    for i in range(GY):
        rstack[i] = (rows_e[i] - oy_all[i])[:, None] == np.arange(IH)[None, :]

    # mask state per band over NIS 32x32 sharpen blocks
    # (NIS_Sharpen.hlsl:93-105): 0 outside, 1 inside, 2 out-of-image
    centres = np.asarray(centres, np.int64).reshape(B, 5)
    row_ok = ((np.arange(GY)[:, None] * TH + np.arange(TH)[None, :]) < H)
    mstate = np.zeros((B, GY, TH, WP), np.int8)
    for bi in range(B):
        pm = fov.pixel_mask(W, H, fov.TILE_NIS_SHARPEN,
                            ((centres[bi, 0], centres[bi, 1]),
                             (centres[bi, 2], centres[bi, 3])),
                            int(centres[bi, 4]))
        pm_p = np.zeros((H, WP), bool)
        pm_p[:, :W] = pm
        for i in range(GY):
            st = pm_p[np.clip(np.arange(TH) + i * TH, 0, H - 1)].astype(np.int8)
            st[~row_ok[i]] = 2
            st[:, W:] = 2
            mstate[bi, i] = st

    # W-edge clamp note: the padded region [W, WP) must replicate column W-1
    # for the column shifts; handled by overwriting pad columns at trace time
    # is not possible in-kernel, so the shifts below treat WP-1 as the edge.
    # To keep clamping exact we instead pad the *input* with edge values.

    def _mm(a, b):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype), (((1,), (0,)), ((), ())),
            precision=mm_prec, preferred_element_type=jnp.float32)

    def kernel(oy_ref, img, mst_r, rst_r, out_ref, inbuf, sems):
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
        band = inbuf[slot]                       # (4, IH, WP) integer texels
        rsel = rst_r[0]                          # (TH_E, IH)

        # row-select the +-2 band (one-hot matmul — integer texels, exact)
        sel = [_mm(rsel, band[c]) for c in range(4)]      # 4 x (TH_E, WP)
        dec = [s * inv_cmax for s in sel]
        y01 = (F32(0.2126) * dec[0] + F32(0.7152) * dec[1]
               + F32(0.0722) * dec[2])                    # (TH_E, WP)

        p = [[_shift_clamp(y01, iy - 2, jx - 2, TH, WP)
              for jx in range(5)] for iy in range(5)]

        scale_y = F32(1.0) - N.sat((p[2][2] - cfg.kSharpStartY) * cfg.kSharpScaleY)
        strength = scale_y * cfg.kSharpStrengthScale + cfg.kSharpStrengthMin
        limit = (scale_y * cfg.kSharpLimitScale + cfg.kSharpLimitMin) * p[2][2]

        half = F32(0.5)
        d0 = N._eval_usm_jax([p[iy][2] for iy in range(5)], strength, limit, cfg)
        d90 = N._eval_usm_jax([p[2][iy] for iy in range(5)], strength, limit, cfg)
        d45 = N._eval_usm_jax(
            [p[1][1], N.hlsl_lerp(p[2][1], p[1][2], half), p[2][2],
             N.hlsl_lerp(p[3][2], p[2][3], half), p[3][3]], strength, limit, cfg)
        d135 = N._eval_usm_jax(
            [p[3][1], N.hlsl_lerp(p[3][2], p[2][1], half), p[2][2],
             N.hlsl_lerp(p[2][3], p[1][2], half), p[1][3]], strength, limit, cfg)

        pc = {(iy, jx): p[iy + 1][jx + 1] for iy in range(3) for jx in range(3)}
        wgt = N._edge_weights_jax(*N._edge_grads(pc), cfg)
        usm_y = d0 * wgt[0] + d90 * wgt[1] + d45 * wgt[2] + d135 * wgt[3]

        ms = mst_r[0, 0].astype(jnp.int32)               # (TH, WP)
        m_in = (ms == 1)[None]
        rgb_in = jnp.stack([d[2:2 + TH] for d in dec[:3]], 0)
        sharp = rgb_in + usm_y[None]
        if tint is not None:
            fb = jnp.stack([rgb_in[0], rgb_in[1] * tint[0],
                            rgb_in[2] * tint[1]], 0)
        else:
            fb = rgb_in
        rgb = jnp.where(m_in, sharp, fb)[:, :, :W]
        # pipeline semantics: sharpened pixels keep the source alpha, the
        # out-of-radius DirectCopy writes alpha 1 (api/pipeline.py nis_sh)
        alpha_src = dec[3][2:2 + TH][None]
        alpha = jnp.where(m_in, alpha_src, F32(1.0))[:, :, :W]
        out_ref[0] = jnp.concatenate([rgb, alpha], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, GY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, TH, WP), lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, TH_E, IH), lambda b, i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, TH, W), lambda b, i, *_: (b, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, IH, WP), in_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    statics = [jnp.asarray(oy_all), jnp.asarray(mstate),
               jnp.asarray(rstack, mm_dtype)]

    def fn(img):
        img = img.astype(in_dtype)
        if WP != W:   # edge-replicate pad so column shifts clamp correctly
            img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, WP - W)),
                          mode="edge")
        if HP != H:
            img = jnp.pad(img, ((0, 0), (0, 0), (0, HP - H), (0, 0)))
        return call(statics[0], img, statics[1], statics[2])

    return fn
