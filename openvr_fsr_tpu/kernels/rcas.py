"""Sharpen-only RCAS Pallas TPU kernel (renderScale == 1).

The reference runs only the sharpen dispatch when renderScale is 1.0 —
for FSR that is fsr_rcas.hlsl over the game's own render target
(src/postprocess/PostProcessor.cpp:530-535, 591-594). This kernel fuses:

  1. RCAS (src/fsr/ffx_fsr1.h:684-769) over the full frame,
  2. the foveated-radius select: outside the circle the input pixel passes
     through with the optional debug tint (fsr_rcas.hlsl:23-55); alpha is 1
     inside the circle and the source alpha outside (matching the XLA
     pipeline stage and the float4(rgb, 1) UAV store).

Design mirrors kernels/fsr.py's row bands: the grid is (batch, band), each
band DMAs a full-width window of input rows (double-buffered), row selection
(+-1 halo with the Load() zero-fill rule) is a host-built one-hot matmul,
and everything elementwise runs band-wide. Texels are integer-valued, so
bf16 one-hot matmuls with f32 accumulation are bit-exact for 8-bit frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..core import foveation as fov
from ..ops.rcas import rcas_core

__all__ = ["build_rcas_sharpen"]

F32 = np.float32


def _round_up(x, m):
    return -(-int(x) // m) * m


def build_rcas_sharpen(batch, h, w, *, sharpness, centres, color_bits=8,
                       debug=False, band_rows=256, precision="full",
                       interpret=False):
    """Build the sharpen-only kernel for a fixed shape/config.

    precision: "full" = f32 oracle parity; "half" = bf16 elementwise RCAS
    math, the packed-fp16 FsrRcasHx2 analog (ffx_fsr1.h:874-1177).

    Returns fn(img):
      8-bit: img (B, h, w) uint32 (bitcast RGBA8), result (B, h, w) uint32
        packed RGBA8 — channel unpack/pack in-kernel, no transposes.
      10-bit: img (B, 4, h, w) float32 integer texels, result f32 in [0,1].
    """
    import ml_dtypes
    core_dt = F32 if precision == "full" else ml_dtypes.bfloat16
    B, H, W = int(batch), int(h), int(w)
    TH = H if H <= int(band_rows) else int(band_rows)
    TH_E = TH + 2
    GY = -(-H // TH)
    TOTAL = B * GY

    cmax = F32((1 << color_bits) - 1)
    inv_cmax = F32(1.0) / cmax
    # R10G10B10A2: the alpha texel is 2-bit (decode a/3, utils.frames)
    alpha_bits = 8 if color_bits == 8 else 2
    amax = F32((1 << alpha_bits) - 1)
    inv_amax = F32(1.0) / amax
    exact_bf16 = color_bits <= 8
    sharp_lin = C.fsr_rcas_con(C.rcas_stops_from_slider(sharpness))
    tint = (F32(0.7), F32(0.7)) if debug else None

    packed_io = exact_bf16
    mm_dtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    mm_prec = None if exact_bf16 else jax.lax.Precision.HIGHEST
    row_align = 8
    HP = _round_up(H, row_align)
    WP = _round_up(W, 128)

    # per-band input row windows covering rows [i*TH - 1, i*TH + TH + 1)
    rows_e = np.clip(np.arange(GY)[:, None] * TH - 1
                     + np.arange(TH_E)[None, :], 0, H - 1)
    lo_a = (rows_e[:, 0] // row_align) * row_align
    IH = min(_round_up(int((rows_e[:, -1] - lo_a + 1).max()), row_align), HP)
    oy_all = np.minimum(lo_a, HP - IH).astype(np.int32)

    # host one-hot row selectors (identity + edge clip) per band
    rstack = np.zeros((GY, TH_E, IH), np.float32)
    for i in range(GY):
        rstack[i] = (rows_e[i] - oy_all[i])[:, None] == np.arange(IH)[None, :]

    # mask state per band: 0 outside radius, 1 inside, 2 out-of-image
    centres = np.asarray(centres, np.int64).reshape(B, 5)
    row_ok = ((np.arange(GY)[:, None] * TH - 1 + np.arange(TH_E)[None, :] >= 0)
              & (np.arange(GY)[:, None] * TH - 1
                 + np.arange(TH_E)[None, :] < H))
    mstate = np.zeros((B, GY, TH_E, WP), np.int8)
    for bi in range(B):
        pm = fov.pixel_mask(W, H, fov.TILE_FSR,
                            ((centres[bi, 0], centres[bi, 1]),
                             (centres[bi, 2], centres[bi, 3])),
                            int(centres[bi, 4]))
        pm_p = np.zeros((H, WP), bool)
        pm_p[:, :W] = pm
        for i in range(GY):
            st = pm_p[rows_e[i]].astype(np.int8)
            st[~row_ok[i]] = 2
            st[:, W:] = 2
            mstate[bi, i] = st

    def _mm(a, b):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype), (((1,), (0,)), ((), ())),
            precision=mm_prec, preferred_element_type=jnp.float32)

    def kernel(oy_ref, img, mst_r, rst_r, out_ref, inbuf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i

        def dma(slot, bb, ii):
            if packed_io:
                src = img.at[bb, pl.ds(pl.multiple_of(oy_ref[ii], row_align),
                                       IH)]
            else:
                src = img.at[bb, :, pl.ds(
                    pl.multiple_of(oy_ref[ii], row_align), IH)]
            return pltpu.make_async_copy(src, inbuf.at[slot], sems.at[slot])

        @pl.when(step == 0)
        def _():
            dma(0, b, i).start()

        @pl.when(step + 1 < TOTAL)
        def _():
            dma((step + 1) % 2, (step + 1) // GY, (step + 1) % GY).start()

        slot = jax.lax.rem(step, 2)
        dma(slot, b, i).wait()
        rsel = rst_r[0]                          # (TH_E, IH) one-hot rows

        if packed_io:
            raw = inbuf[slot].astype(jnp.int32)  # (IH, WP)
            band = [jnp.bitwise_and(
                jax.lax.shift_right_logical(raw, 8 * c), 255
            ).astype(jnp.bfloat16) for c in range(4)]
        else:
            band4 = inbuf[slot]                  # (4, IH, WP) integer texels
            band = [band4[c] for c in range(4)]

        ms = mst_r[0, 0].astype(jnp.int32)       # (TH_E, WP)
        gathered = jnp.stack([_mm(rsel, band[c]) for c in range(4)], 0)
        masked = jnp.where((ms != 2)[None], gathered, F32(0.0))
        if inv_amax == inv_cmax:     # 8-bit: one fused scalar multiply
            dec = masked * inv_cmax
        else:                        # 10-bit: 2-bit alpha decodes a/3
            dec = jnp.concatenate(
                [masked[:3] * inv_cmax, masked[3:] * inv_amax], axis=0)

        qv = dec[:3]
        # Load() zero-OOB horizontal taps via lane rotates (see
        # kernels/fsr.py epilogue): wrapped lanes land on zeroed pad
        # columns when WP > W, masked explicitly otherwise.
        e = qv[:, 1:1 + TH]
        d_t = pltpu.roll(e, 1, 2)
        f_t = pltpu.roll(e, WP - 1, 2)
        if WP == W:
            lane = jax.lax.broadcasted_iota(jnp.int32, e.shape, 2)
            d_t = jnp.where(lane == 0, F32(0.0), d_t)
            f_t = jnp.where(lane == WP - 1, F32(0.0), f_t)
        sh = rcas_core(
            qv[:, 0:TH], d_t, e, f_t, qv[:, 2:2 + TH], sharp_lin,
            dt=core_dt).astype(jnp.float32)
        m_in = (ms[1:1 + TH] == 1)[None]
        if tint is not None:
            fb = jnp.stack([e[0], e[1] * tint[0], e[2] * tint[1]], 0)
        else:
            fb = e
        rgb = jnp.where(m_in, sh, fb)
        # int+slice mixed indexing lowers to an unsupported gather in Mosaic:
        # keep it slices-only
        alpha_src = dec[3:4][:, 1:1 + TH]
        alpha = jnp.where(m_in, F32(1.0), alpha_src)
        if packed_io:
            q8 = jnp.round(jnp.clip(rgb, F32(0.0), F32(1.0)) * cmax
                           ).astype(jnp.int32)
            qa = jnp.round(jnp.clip(alpha[0], F32(0.0), F32(1.0)) * cmax
                           ).astype(jnp.int32)
            packed = (q8[0] + jax.lax.shift_left(q8[1], 8)
                      + jax.lax.shift_left(q8[2], 16)
                      + jax.lax.shift_left(qa, 24))
            out_ref[0] = packed.astype(jnp.uint32)[:, :W]
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
        if packed_io:
            if HP != H or WP != W:
                img = jnp.pad(img, ((0, 0), (0, HP - H), (0, WP - W)))
        else:
            img = img.astype(jnp.float32)
            if HP != H or WP != W:
                img = jnp.pad(img, ((0, 0), (0, 0), (0, HP - H), (0, WP - W)))
        return call(statics[0], img, statics[1], statics[2])

    return fn
