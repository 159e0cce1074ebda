"""Shared band-pipeline scaffold for the Pallas TPU kernels.

Every compute kernel in this package (kernels/fsr.py, rcas.py, cas.py,
nis.py) runs the same outer machine: a (batch, row_band) grid where each
band DMAs a full-width window of input rows HBM->VMEM double-buffered
across grid steps, unpacks RGBA8-in-u32 texels in-register, gathers rows
through host-built one-hot matmuls, and stores a UNORM-packed u32 band.
This module is that machine, factored once:

  * IoPolicy          — the 8/10-bit UNORM + bf16-exactness dtype policy
  * mm_fns            — the one-hot gather matmul helpers
  * input_padding / row_windows — HBM tiling + per-band DMA row windows
  * dma_wait_slot     — the double-buffered DMA ring (start next, wait cur)
  * band_channels     — packed-u32 unpack (or planar passthrough)
  * pack_store_u32    — clip/round/shift UNORM store of a packed band
  * mask_state        — per-band foveation/validity state + chunk classes
  * htaps_zero_oob    — Load() zero-OOB horizontal taps via lane rotates
  * make_io_fn        — the host-facing pad-and-call wrapper

A new kernel needs only its math core plus the gather layout it wants;
see kernels/rcas.py for the smallest complete consumer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import foveation as fov

F32 = np.float32

ROW_ALIGN = 8          # (8, 128) HBM tiling: DMA row offsets align to this


def round_up(x, m):
    return -(-int(x) // m) * m


@dataclasses.dataclass(frozen=True)
class IoPolicy:
    """UNORM scale factors and matmul dtype policy for one build.

    Texels are integer-valued; up to 8 bits they are bf16-exact, so bf16
    one-hot matmuls with f32 accumulation reproduce gathers bit-exactly
    and the kernel uses packed-u32 IO. 10-bit texels exceed bf16's integer
    range and use f32 HIGHEST matmuls over planar IO instead.
    """

    color_bits: int
    cmax: np.float32
    inv_cmax: np.float32
    alpha_bits: int
    amax: np.float32
    inv_amax: np.float32
    exact_bf16: bool
    packed_io: bool
    mm_dtype: object
    mm_prec: object


def io_policy(color_bits, force_highest=False):
    cmax = F32((1 << color_bits) - 1)
    alpha_bits = 8 if color_bits == 8 else 2
    amax = F32((1 << alpha_bits) - 1)
    exact_bf16 = color_bits <= 8 and not force_highest
    return IoPolicy(
        color_bits=int(color_bits), cmax=cmax, inv_cmax=F32(1.0) / cmax,
        alpha_bits=alpha_bits, amax=amax, inv_amax=F32(1.0) / amax,
        exact_bf16=exact_bf16, packed_io=color_bits <= 8,
        mm_dtype=jnp.bfloat16 if exact_bf16 else jnp.float32,
        mm_prec=None if exact_bf16 else jax.lax.Precision.HIGHEST)


def mm_fns(pol):
    """(_mm, _mm2): one-hot gather matmuls with f32 accumulation. _mm casts
    its operands to the policy dtype; _mm2 takes already-cast operands
    (e.g. a gathered scratch and the prefetched one-hot stacks)."""

    def _mm(a, b):
        return jax.lax.dot_general(
            a.astype(pol.mm_dtype), b.astype(pol.mm_dtype),
            (((1,), (0,)), ((), ())),
            precision=pol.mm_prec, preferred_element_type=jnp.float32)

    def _mm2(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=pol.mm_prec, preferred_element_type=jnp.float32)

    return _mm, _mm2


def input_padding(h, w, row_align=ROW_ALIGN):
    """(HP, WP): input rows to the DMA sublane alignment, width to lanes."""
    return round_up(h, row_align), round_up(w, 128)


def row_windows(lo, hi, hp, row_align=ROW_ALIGN):
    """Per-band DMA windows from first/last needed input rows (inclusive).

    lo, hi: (GY,) arrays. Returns (IH, oy_all): one static window height
    (max over bands, sublane-aligned, capped at HP) and the per-band
    aligned start offsets, clamped so every window stays in [0, HP)."""
    lo_a = (np.asarray(lo) // row_align) * row_align
    ih = min(round_up(int((np.asarray(hi) - lo_a + 1).max()), row_align), hp)
    return ih, np.minimum(lo_a, hp - ih).astype(np.int32)


def dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i, *, packed_io,
                  ih, gy, total, row_align=ROW_ALIGN):
    """The double-buffered band DMA ring. Starts the first copy on step 0,
    prefetches step+1's band, waits on this step's copy; returns the
    VMEM slot index holding this band's input rows."""

    def dma(slot, bb, ii):
        if packed_io:
            src = img.at[bb, pl.ds(pl.multiple_of(oy_ref[ii], row_align), ih)]
        else:
            src = img.at[bb, :, pl.ds(
                pl.multiple_of(oy_ref[ii], row_align), ih)]
        return pltpu.make_async_copy(src, inbuf.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _():
        dma(0, b, i).start()

    @pl.when(step + 1 < total)
    def _():
        dma((step + 1) % 2, (step + 1) // gy, (step + 1) % gy).start()

    slot = jax.lax.rem(step, 2)
    dma(slot, b, i).wait()
    return slot


def band_channels(inbuf, slot, packed_io, n):
    """The band's first n channel planes as a list. Packed mode unpacks
    RGBA8-in-u32 (little-endian, R low byte) to bf16 integer texels —
    exact, since texels are <= 255; planar mode returns the slot's
    planes unchanged."""
    if packed_io:
        raw = inbuf[slot].astype(jnp.int32)
        return [jnp.bitwise_and(
            jax.lax.shift_right_logical(raw, 8 * c) if c else raw, 255
        ).astype(jnp.bfloat16) for c in range(n)]
    band = inbuf[slot]
    return [band[c] for c in range(n)]


def pack_store_u32(out_ref, rgb, alpha, cmax, out_w):
    """UNORM store of a packed-u32 band (from_planar semantics: clip, *cmax,
    round-nearest-even). rgb: (3, TH, >=out_w) f32 in [0,1] (stacked or a
    list of planes); alpha: (TH, >=out_w) f32 in [0,1], or None for the
    constant 255 (the float4(rgb, 1) UAV store)."""
    q8 = [jnp.round(jnp.clip(rgb[c], F32(0.0), F32(1.0)) * cmax
                    ).astype(jnp.int32) for c in range(3)]
    if alpha is None:
        a_term = jnp.int32(-16777216)            # alpha 255 << 24
    else:
        qa = jnp.round(jnp.clip(alpha, F32(0.0), F32(1.0)) * cmax
                       ).astype(jnp.int32)
        a_term = jax.lax.shift_left(qa, 24)
    packed = (q8[0] + jax.lax.shift_left(q8[1], 8)
              + jax.lax.shift_left(q8[2], 16) + a_term)
    out_ref[0] = packed.astype(jnp.uint32)[:, :out_w]


def mask_state(batch, centres, out_w, out_h, w_pad, tile, rows, row_ok=None,
               chunk=None, col_halo=False):
    """Host-precomputed per-band foveation/validity state.

    The per-16x16-group (or NIS-block) circle test depends only on static
    centres, so the whole per-pixel state is precomputed: 0 = outside the
    radius, 1 = inside, 2 = out of image (the Load() zero rule / padded
    columns). rows: (GY, R) clipped output-row map per band (R includes
    any halo); row_ok: (GY, R) validity of those rows (None = all valid);
    chunk: when set, also classify each CHUNK-column tile (0 = all
    outside, 1 = mixed, 2 = all inside-or-dead) with col_halo extending
    the inspected window by +-1 column (kernels whose chunk math reads
    neighbor columns). Returns (mstate int8 (B, GY, R, w_pad), cls_flat,
    band_cls_flat) — the latter two None when chunk is None.
    """
    centres = np.asarray(centres, np.int64).reshape(batch, 5)
    gy, r = rows.shape
    nchunk = (w_pad // chunk) if chunk else 0
    mstate = np.zeros((batch, gy, r, w_pad), np.int8)
    cls = np.zeros((batch, gy, nchunk), np.int32) if chunk else None
    for bi in range(batch):
        pm = fov.pixel_mask(out_w, out_h, tile,
                            ((centres[bi, 0], centres[bi, 1]),
                             (centres[bi, 2], centres[bi, 3])),
                            int(centres[bi, 4]))
        pm_p = np.zeros((out_h, w_pad), bool)
        pm_p[:, :out_w] = pm
        for i in range(gy):
            st = pm_p[rows[i]].astype(np.int8)
            if row_ok is not None:
                st[~row_ok[i]] = 2
            st[:, out_w:] = 2
            mstate[bi, i] = st
            for k in range(nchunk):
                if col_halo:
                    h0 = max(0, k * chunk - 1)
                    h1 = min(w_pad - 1, k * chunk + chunk)
                    sub = st[:, h0:h1 + 1]
                else:
                    sub = st[:, k * chunk:(k + 1) * chunk]
                ins = sub == 1
                # state-2 (out-of-image) pixels are zeroed downstream
                # regardless, so they don't block the all-inside fast class
                cls[bi, i, k] = (2 if (ins | (sub == 2)).all()
                                 else (1 if ins.any() else 0))
    if chunk is None:
        return mstate, None, None
    band_cls = np.where((cls == 0).all(-1), 0,
                        np.where((cls == 2).all(-1), 2, 1)).astype(np.int32)
    return mstate, cls.reshape(-1), band_cls.reshape(-1)


def htaps_zero_oob(e, w_pad, w_live):
    """RCAS/CAS horizontal neighbor taps with the Load() zero-OOB rule via
    lane rotates (measured faster than concat+slice at band scale): the
    wrapped-in lane is a zeroed pad column whenever w_pad > w_live;
    masked explicitly otherwise. Returns (left, right) neighbors of e."""
    d_t = pltpu.roll(e, 1, e.ndim - 1)
    f_t = pltpu.roll(e, w_pad - 1, e.ndim - 1)
    if w_pad == w_live:
        lane = jax.lax.broadcasted_iota(jnp.int32, e.shape, e.ndim - 1)
        d_t = jnp.where(lane == 0, F32(0.0), d_t)
        f_t = jnp.where(lane == w_pad - 1, F32(0.0), f_t)
    return d_t, f_t


def make_io_fn(call, h, w, hp, wp, packed_io, geom=None):
    """The host-facing wrapper: pads the input to the (sublane, lane) HBM
    tiling unless the caller pre-padded to fn.pad_to (the device-ring
    storage format), then invokes the pallas call.

    geom: optional DMA-geometry dict (batch, gy, ih, th, out_h, out_w, oy)
    published as fn.dma_geometry — kernels/sol.build_dma_floor consumes it
    to build the kernel's memory speed-of-light probe."""

    def fn(img):
        # Only two geometries are legal: the build shape (h, w) or the
        # pre-padded device-ring pitch (hp, wp). Anything else is a caller
        # geometry mistake — fail loudly instead of silently mis-padding.
        if img.shape[-2:] not in ((h, w), (hp, wp)):
            raise ValueError(
                f"frame shape {img.shape[-2:]} matches neither the build "
                f"shape {(h, w)} nor the pre-padded pitch {(hp, wp)}")
        if packed_io:
            if img.shape[-2:] == (hp, wp):       # caller pre-padded
                pass
            elif hp != h or wp != w:
                img = jnp.pad(img, ((0, 0), (0, hp - h), (0, wp - w)))
        else:
            img = img.astype(jnp.float32)
            if img.shape[-2:] == (hp, wp):
                pass
            elif hp != h or wp != w:
                img = jnp.pad(img,
                              ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        return call(img)

    fn.pad_to = (hp, wp)
    if geom is not None:
        fn.dma_geometry = dict(geom, hp=hp, wp=wp, packed=packed_io)
    return fn
