"""Canonical benchmark: stereo eye-pair FSR (EASU+RCAS fused Pallas kernel)
at the reference headline config — 1683x1869/eye upscaled to 2244x2492 at
renderScale 0.75, sharpness 0.9, foveated radius 0.5.

Prints ONE JSON line:
  {"metric": ..., "value": <ms per stereo pair>, "unit": "ms",
   "vs_baseline": <1ms north-star / value>}

Methodology: the axon TPU tunnel adds ~3 ms of dispatch overhead per
execution and its block_until_ready can return before device completion, so
naive per-call timing is wrong in both directions. We launch N back-to-back
executions over rotating input buffers and force completion with a host
transfer of a reduction of the last output — per-pair time is the forced
wall time divided by N. Extra diagnostics go to stderr.

Input format: the zero-copy packed-u32 API mode — RGBA8 texels in their
native 32-bit-word layout (R low byte), row-pitch padded to the kernel's
(sublane, lane) tiling, exactly as the device-resident frame ring stores
them (tools/stream_bench.py). This is the serving configuration: the
reference's input is likewise a GPU texture already in its native tiled
layout (PostProcessor.cpp:219-274 just wraps an SRV over it); the NHWC
uint8 path (ov.upscale on numpy frames) adds a one-time u8<->u32 XLA
relayout (~0.4 ms/pair, tools/overhead_hunt.py) that no steady-state
serving flow pays.
"""

import json
import os
import signal
import sys
import time

import numpy as np

# The tunnel's device init can hang indefinitely when the transport is
# down; a hung bench is worse than a failed one for the driver that runs
# this at round end, so fail loudly instead.
WATCHDOG_S = 1500


def _watchdog(signum, frame):
    print(json.dumps({"metric": "fsr_stereo_eyepair_2244x2492_rs075_ms",
                      "value": None, "unit": "ms", "vs_baseline": None,
                      "error": f"watchdog: no result in {WATCHDOG_S}s "
                               "(TPU tunnel unresponsive?)"}), flush=True)
    os._exit(2)


def main():
    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _watchdog)
        signal.alarm(WATCHDOG_S)
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu import Config, Pipeline
    from openvr_fsr_tpu.utils import frames as FR

    h_in, w_in = 1869, 1683
    cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
    pipe = Pipeline(cfg)

    rng = np.random.default_rng(0)
    eyes = (0, 1)
    fn = pipe._build(2, h_in, w_in, eyes)

    def ring_frame(stereo_u8):
        """Pack NHWC RGBA8 to the native u32 plane and pad to the kernel's
        (sublane, lane) row pitch — the device-ring storage format."""
        hp, wp = fn.pad_to
        packed = np.ascontiguousarray(stereo_u8).view(np.uint32)[..., 0]
        return jax.device_put(np.pad(
            packed, ((0, 0), (0, hp - h_in), (0, wp - w_in))))

    inputs = [
        ring_frame(np.stack([FR.zone_plate_frame(h_in, w_in),
                             FR.noise_frame(h_in, w_in, seed=1)])),
        ring_frame(rng.integers(0, 256, (2, h_in, w_in, 4)).astype(np.uint8)),
        ring_frame(np.stack([FR.gradient_frame(h_in, w_in),
                             FR.checkerboard_frame(h_in, w_in)])),
    ]

    # warmup/compile + force real completion via host transfer
    out = fn(inputs[0])
    _ = np.asarray(out[0, 0, 0])
    print(f"[bench] backend={jax.default_backend()} out={out.shape} "
          f"pipeline-backend={pipe._resolve_backend()}", file=sys.stderr)

    def run(iters):
        t0 = time.perf_counter()
        y = None
        for i in range(iters):
            y = fn(inputs[i % len(inputs)])
        _ = np.asarray(jnp.sum(y[:, ::373, ::373]))  # forces completion
        return (time.perf_counter() - t0) / iters * 1000.0

    run(5)  # pipeline warmup
    per_pair_ms = min(run(40) for _ in range(3))

    out_mpix = 2 * 2244 * 2492 / 1e6
    print(f"[bench] {per_pair_ms:.3f} ms/stereo-pair "
          f"({out_mpix / (per_pair_ms / 1000.0):.0f} Mpix/s, "
          f"{1000.0 / per_pair_ms:.0f} pairs/s)", file=sys.stderr)

    # Memory speed-of-light yardstick: a Pallas DMA-floor probe with the
    # kernel's EXACT outer machine (same grid, same per-band input row
    # windows through the same double-buffered ring, same packed output
    # band stores) and zero compute — kernels/sol.py. Measured in-process
    # with the same methodology over the same buffers, so
    # vs_sol = floor / kernel <= 1 by construction (round-3's XLA
    # reduce/fill probes underestimated the bound and the kernel "beat"
    # them). The probe's effective GB/s doubles as the session-drift stamp.
    from openvr_fsr_tpu.kernels.sol import build_dma_floor
    floor = build_dma_floor(fn.dma_geometry)
    pf = jax.jit(floor)
    y = pf(inputs[0])
    _ = np.asarray(y[0, 0, 0])

    def run_floor(iters):
        t0 = time.perf_counter()
        y = None
        for i in range(iters):
            y = pf(inputs[i % len(inputs)])
        _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
        return (time.perf_counter() - t0) / iters * 1000.0

    run_floor(5)
    sol_ms = min(run_floor(40) for _ in range(3))
    moved_gb = (floor.read_bytes + floor.write_bytes) / 1e9
    eff_gbps = moved_gb / (sol_ms / 1000.0)
    print(f"[bench] DMA-floor probe: {sol_ms:.3f} ms for "
          f"{moved_gb * 1000:.1f} MB ({eff_gbps:.0f} GB/s effective) — "
          f"kernel at {sol_ms/per_pair_ms*100:.0f}% of memory SOL",
          file=sys.stderr)

    if hasattr(signal, "SIGALRM"):
        signal.alarm(0)
    print(json.dumps({
        "metric": "fsr_stereo_eyepair_2244x2492_rs075_ms",
        "value": round(per_pair_ms, 4),
        "unit": "ms",
        "vs_baseline": round(1.0 / per_pair_ms, 4),
        "sol_probe": "pallas_dma_floor",
        "probe_effective_gbps": round(eff_gbps, 1),
        "hbm_sol_ms": round(sol_ms, 4),
        "vs_sol": round(sol_ms / per_pair_ms, 4),
    }))


if __name__ == "__main__":
    main()
