"""Sharpen-only RCAS Pallas TPU kernel (renderScale == 1).

The reference runs only the sharpen dispatch when renderScale is 1.0 —
for FSR that is fsr_rcas.hlsl over the game's own render target
(src/postprocess/PostProcessor.cpp:530-535, 591-594). This kernel fuses:

  1. RCAS (src/fsr/ffx_fsr1.h:684-769) over the full frame,
  2. the foveated-radius select: outside the circle the input pixel passes
     through with the optional debug tint (fsr_rcas.hlsl:23-55); alpha is 1
     inside the circle and the source alpha outside (matching the XLA
     pipeline stage and the float4(rgb, 1) UAV store).

The outer machine (row-band grid, double-buffered DMA ring, packed-u32
unpack/pack, mask state, zero-OOB lane-rotate taps) is the shared
band-pipeline scaffold — see kernels/_band.py; this file is just the
row-gather layout plus the RCAS math.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..core import foveation as fov
from ..ops.rcas import rcas_core
from . import _band as BD

__all__ = ["build_rcas_sharpen"]

F32 = np.float32


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

    pol = BD.io_policy(color_bits)
    sharp_lin = C.fsr_rcas_con(C.rcas_stops_from_slider(sharpness))
    tint = (F32(0.7), F32(0.7)) if debug else None
    HP, WP = BD.input_padding(H, W)

    # per-band input row windows covering rows [i*TH - 1, i*TH + TH + 1)
    rows_e = np.clip(np.arange(GY)[:, None] * TH - 1
                     + np.arange(TH_E)[None, :], 0, H - 1)
    IH, oy_all = BD.row_windows(rows_e[:, 0], rows_e[:, -1], HP)

    # host one-hot row selectors (identity + edge clip) per band
    rstack = np.zeros((GY, TH_E, IH), np.float32)
    for i in range(GY):
        rstack[i] = (rows_e[i] - oy_all[i])[:, None] == np.arange(IH)[None, :]

    # mask state per band: 0 outside radius, 1 inside, 2 out-of-image
    row_ok = ((np.arange(GY)[:, None] * TH - 1 + np.arange(TH_E)[None, :] >= 0)
              & (np.arange(GY)[:, None] * TH - 1
                 + np.arange(TH_E)[None, :] < H))
    mstate, _, _ = BD.mask_state(B, centres, W, H, WP, fov.TILE_FSR,
                                 rows_e, row_ok)

    _mm, _ = BD.mm_fns(pol)
    inv_cmax, inv_amax, cmax = pol.inv_cmax, pol.inv_amax, pol.cmax

    def kernel(oy_ref, img, mst_r, rst_r, out_ref, inbuf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=pol.packed_io, ih=IH, gy=GY,
                                total=TOTAL)
        rsel = rst_r[0]                          # (TH_E, IH) one-hot rows
        band = BD.band_channels(inbuf, slot, pol.packed_io, 4)

        ms = mst_r[0, 0].astype(jnp.int32)       # (TH_E, WP)
        gathered = jnp.stack([_mm(rsel, band[c]) for c in range(4)], 0)
        masked = jnp.where((ms != 2)[None], gathered, F32(0.0))
        if inv_amax == inv_cmax:     # 8-bit: one fused scalar multiply
            dec = masked * inv_cmax
        else:                        # 10-bit: 2-bit alpha decodes a/3
            dec = jnp.concatenate(
                [masked[:3] * inv_cmax, masked[3:] * inv_amax], axis=0)

        qv = dec[:3]
        e = qv[:, 1:1 + TH]
        d_t, f_t = BD.htaps_zero_oob(e, WP, W)
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
