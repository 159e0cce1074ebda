"""Memory speed-of-light (DMA-floor) probe for the band-pipeline kernels.

Round 3 stamped every published kernel time with a "memory speed-of-light"
derived from XLA reduce/fill bandwidth probes (utils.timing.hbm_calibration).
The fused FSR kernel *beat* that yardstick by 5-17% — impossible against a
true bound — so the probes underestimate achievable bandwidth and the
saturation claim was unfalsifiable.

This module is the honest yardstick. `build_dma_floor` consumes the DMA
geometry a compute kernel publishes (`fn.dma_geometry`) and builds a Pallas
kernel with the *identical outer machine* — the same (batch, row_band)
grid, the same per-band input row windows DMA'd HBM->VMEM through the same
double-buffered ring (kernels/_band.py dma_wait_slot), and the same
packed-u32 output band stores — but **no compute at all**: each band writes
a scalar read from the freshly-DMA'd input (so the store depends on the
load and nothing can be elided). Its wall time is the time this chip's
memory system needs to move the kernel's exact input/output traffic with
perfect overlap; it is a *lower bound* on any kernel with that traffic,
so `vs_sol = floor / kernel_time <= 1` by construction when both are
measured in the same session with the same methodology.

Reference analog: the debug-mode GPU timestamp ring around the two compute
dispatches (src/postprocess/PostProcessor.cpp:601-628) is the reference's
measurement mechanism; this probe adds the bound that mechanism lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _band as BD

__all__ = ["build_dma_floor", "build_vpu_rate", "build_vmem_rate",
           "build_mxu_rate", "vpu_cycle"]


def build_dma_floor(geom, interpret=False):
    """Build the DMA-floor probe for one compute kernel's published geometry.

    geom: the `fn.dma_geometry` dict a kernel builder attaches via
      kernels/_band.make_io_fn — keys: batch, gy (row bands), ih (DMA window
      rows), hp/wp (padded input plane), th (output band rows), out_h,
      out_w, oy ((gy,) int32 per-band aligned DMA row origins), packed
      (True = u32 RGBA8 IO; planar f32 paths publish packed=False and are
      not probed — all serving paths are packed).

    Returns fn(img): img is the SAME pre-padded (B, hp, wp) uint32 buffer
    the compute kernel consumes in ring mode; result is (B, out_h, out_w)
    uint32 whose content is meaningless (a broadcast scalar per band) but
    whose production moves exactly the compute kernel's HBM traffic.
    """
    if not geom.get("packed", True):
        raise ValueError("DMA-floor probe covers the packed-u32 serving "
                         "paths only (planar 10-bit IO publishes no probe)")
    B, GY = int(geom["batch"]), int(geom["gy"])
    IH, WP = int(geom["ih"]), int(geom["wp"])
    TH, OH, OW = int(geom["th"]), int(geom["out_h"]), int(geom["out_w"])
    HP = int(geom["hp"])
    oy = np.asarray(geom["oy"], np.int32)
    TOTAL = B * GY

    def kernel(oy_ref, img, out_ref, inbuf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        step = b * GY + i
        slot = BD.dma_wait_slot(img, inbuf, sems, oy_ref, step, b, i,
                                packed_io=True, ih=IH, gy=GY, total=TOTAL)
        # Store depends on the DMA'd band (one scalar) so neither the read
        # nor the write can be elided; the content is irrelevant to DMA cost.
        out_ref[0] = jnp.broadcast_to(inbuf[slot, 0:1, 0:1], (TH, OW))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, GY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # img stays in HBM
        out_specs=pl.BlockSpec((1, TH, OW), lambda b, i, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, IH, WP), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OH, OW), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    oy_dev = jnp.asarray(oy)

    def fn(img):
        assert img.shape == (B, HP, WP), (img.shape, (B, HP, WP))
        return call(oy_dev, img)

    fn.pad_to = (HP, WP)
    # The traffic this floor represents (bytes), for effective-GB/s reports.
    fn.read_bytes = TOTAL * IH * WP * 4
    fn.write_bytes = B * OH * OW * 4
    return fn


def vpu_cycle(streams, x):
    """One op-mix cycle of the VPU-rate probe, applied to 8 independent
    f32 streams (ILP 8, like the core's independent tap/weight planes).

    The mix approximates the EASU core's measured jaxpr distribution
    (tools/vpu_audit.py: ~45% mul, ~30% add, rest sub/min/max/abs), with
    mul->add adjacency so Mosaic can fuse FMAs exactly where the core's
    weight polynomials do. Kept as a pure jnp function so the audit tool
    counts its ops with the SAME jaxpr meter it runs over easu_core_split
    — any counting bias cancels in the efficiency ratio.
    """
    c1, c2 = np.float32(1.0009765625), np.float32(-0.4990234375)
    out = []
    for j, s in enumerate(streams):
        if j % 4 == 0:
            s = s * c1 + x            # fma
            s = s * c2 + x            # fma
        elif j % 4 == 1:
            s = jnp.minimum(s * c1, x) + s
        elif j % 4 == 2:
            s = jnp.maximum(jnp.abs(s - x) * c2, x)
        else:
            s = (s - x) * c1 + (x * c2)
        out.append(s)
    return out


def build_vpu_rate(k, th_e=130, chunk=128, steps=256, interpret=False):
    """Sustained VPU elementwise-throughput probe at band-kernel shapes.

    Each grid step runs `k` vpu_cycle passes on (th_e, chunk) f32 planes —
    the exact shape the fused-FSR core computes per chunk — off one VMEM
    seed block, storing only an (8, chunk) reduction so stores stay
    negligible. Timing two k values and taking the slope cancels launch,
    DMA and store overhead: rate = d(ops)/d(time). tools/vpu_audit.py uses
    this rate to convert the EASU/RCAS cores' jaxpr op counts into a
    compute floor the way build_dma_floor bounds memory traffic.

    Three structural guards keep every op of every grid step live (each
    was a real fabrication mode in the r05 session): (1) the seed is
    perturbed by program_id so no step recomputes another's values,
    (2) the store ACCUMULATES into the revisited output block so no
    step's result is a dead store Mosaic can eliminate with the compute
    feeding it, and (3) the store consumes ALL th_e rows via an 8-row
    fold — storing `acc[:8]` lets Mosaic row-slice the entire chain
    through DCE and compute (8, chunk) instead of (th_e, chunk), a 16x
    over-rate (the k-independent 1.4 ms walls and "6000 Tops/s" slopes).
    """
    k = int(k)

    def _fold8(acc):
        red = acc[0:8]
        for r in range(8, th_e - 7, 8):
            red = red + acc[r:r + 8]
        if th_e % 8:
            red = red + acc[th_e - 8:th_e]
        return red

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        x = x_ref[...] + i.astype(jnp.float32) * np.float32(2 ** -20)
        streams = [x * np.float32(0.125 * (j + 1)) for j in range(8)]
        for _ in range(k):
            streams = vpu_cycle(streams, x)
        acc = streams[0]
        for s in streams[1:]:
            acc = acc + s
        red = _fold8(acc)

        @pl.when(i == 0)
        def _init():
            out_ref[...] = red

        @pl.when(i != 0)
        def _accum():
            out_ref[...] += red

    call = pl.pallas_call(
        kernel,
        grid=(int(steps),),
        in_specs=[pl.BlockSpec((th_e, chunk), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, chunk), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, chunk), jnp.float32),
        interpret=interpret,
    )

    def fn(x):
        assert x.shape == (th_e, chunk), x.shape
        return call(x)

    fn.elems = th_e * chunk
    fn.steps = int(steps)
    fn.k = k
    return fn


def build_vmem_rate(k, th_e=130, chunk=128, steps=256, dtype=jnp.float32,
                    interpret=False):
    """Sustained VMEM plane-load throughput probe at band-kernel shapes.

    Each grid step folds `k` distinct (th_e, chunk) planes of a
    VMEM-resident block into 8 rotating f32 accumulators with ONE add
    each (ILP 8) — the same load-plane-and-accumulate machine as the
    fused kernel's tap consumption (kernels/fsr._easu_vals), with the
    arithmetic reduced to the single op that forces the load. Slope over
    two k values cancels launch/grid overhead:
    bytes_rate = d(k * th_e * chunk * itemsize) / d(time). tools/vpu_audit
    prices the stages' tap/scratch plane traffic with this rate — the
    VMEM analog of build_dma_floor's HBM bound, and the honest floor for
    stages whose jaxpr op count is far below their measured time (a stage
    can be load-bound long before it is flop-bound).

    The same three anti-DCE guards as build_vpu_rate apply: Horner chain
    in a program_id-derived scalar (a plain sum of the same planes is
    loop-invariant), accumulate-into-output (an overwritten block is a
    dead store below the last grid step), and an 8-row fold of ALL rows
    (storing `acc[:8]` lets Mosaic shrink every plane LOAD to its first
    8 rows — a 16x bandwidth fabrication).
    """
    k = int(k)
    isz = jnp.dtype(dtype).itemsize

    def _fold8(acc):
        red = acc[0:8]
        for r in range(8, th_e - 7, 8):
            red = red + acc[r:r + 8]
        if th_e % 8:
            red = red + acc[th_e - 8:th_e]
        return red

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        s = (np.float32(1.0)
             - i.astype(jnp.float32) * np.float32(2 ** -20))
        accs = [jnp.full((th_e, chunk), np.float32(j + 1), jnp.float32)
                for j in range(8)]
        for j in range(k):
            accs[j % 8] = accs[j % 8] * s + x_ref[j].astype(jnp.float32)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        red = _fold8(acc)

        @pl.when(i == 0)
        def _init():
            out_ref[...] = red

        @pl.when(i != 0)
        def _accum():
            out_ref[...] += red

    call = pl.pallas_call(
        kernel,
        grid=(int(steps),),
        in_specs=[pl.BlockSpec((k, th_e, chunk), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((8, chunk), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, chunk), jnp.float32),
        interpret=interpret,
    )

    def fn(x):
        assert x.shape == (k, th_e, chunk), x.shape
        return call(x)

    fn.bytes_per_step = k * th_e * chunk * isz
    fn.steps = int(steps)
    fn.k = k
    return fn


def build_mxu_rate(k, tile=128, steps=64, interpret=False):
    """Sustained in-kernel MXU throughput probe at gather-matmul shapes.

    Each grid step runs `k` chained bf16 matmul rounds over 8 independent
    (tile, tile) streams (s <- bf16(s) @ W, f32 accumulate — the same
    operand/accumulate types as the kernels' one-hot gather matmuls, whose
    per-matmul operand sizes are ~(130, IH~128-192) x (IH, 128)). Chaining
    defeats loop-invariant hoisting; timing two k values and taking the
    slope cancels launch/DMA/store overhead: rate = d(MACs)/d(time).
    tools/vpu_audit.py converts the fused kernel's jaxpr-counted dot MACs
    into a compute floor with this rate — the MXU analog of build_vpu_rate,
    measured with the SAME MAC meter so counting bias cancels.
    """
    k = int(k)

    def kernel(x_ref, w_ref, out_ref):
        i = pl.program_id(0)
        step = i.astype(jnp.float32) * np.float32(2 ** -20)
        w = w_ref[...].astype(jnp.bfloat16)
        streams = [(x_ref[...] + step) * np.float32(0.125 * (j + 1))
                   for j in range(8)]
        for _ in range(k):
            streams = [
                jax.lax.dot(s.astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
                * np.float32(1e-3)
                for s in streams]
        acc = streams[0]
        for s in streams[1:]:
            acc = acc + s
        # 8-row fold of all tile rows + accumulate-into-output: the same
        # anti-DCE guards as build_vpu_rate (row-sliced DCE through the
        # dot chain would shrink every matmul to an (8, tile) operand).
        red = acc[0:8]
        for r in range(8, tile, 8):
            red = red + acc[r:r + 8]

        @pl.when(i == 0)
        def _init():
            out_ref[...] = red

        @pl.when(i != 0)
        def _accum():
            out_ref[...] += red

    call = pl.pallas_call(
        kernel,
        grid=(int(steps),),
        in_specs=[pl.BlockSpec((tile, tile), lambda i: (0, 0)),
                  pl.BlockSpec((tile, tile), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, tile), jnp.float32),
        interpret=interpret,
    )

    def fn(x, w):
        assert x.shape == (tile, tile) and w.shape == (tile, tile)
        return call(x, w)

    fn.steps = int(steps)
    fn.k = k
    fn.tile = int(tile)
    return fn
