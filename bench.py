"""Canonical benchmark: stereo eye-pair FSR (EASU+RCAS fused pipeline) at the
reference headline config — 1683x1869/eye upscaled to 2244x2492 at
renderScale 0.75, sharpness 0.9, foveated radius 0.5.

Prints ONE JSON line:
  {"metric": ..., "value": <best ms per stereo pair>, "unit": "ms",
   "vs_baseline": <1ms north-star / value>}

BASELINE.json north star: < 1 ms per stereo pair on one TPU chip.
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from openvr_fsr_tpu import Config, Pipeline
    from openvr_fsr_tpu.utils import frames as FR

    h_in, w_in = 1869, 1683
    cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
    pipe = Pipeline(cfg)

    stereo = np.stack([
        FR.zone_plate_frame(h_in, w_in),
        FR.noise_frame(h_in, w_in, seed=1),
    ])
    eyes = (0, 1)
    fn = pipe._build(2, h_in, w_in, eyes)
    frames_dev = jax.device_put(stereo)

    # warmup / compile
    out = fn(frames_dev)
    jax.block_until_ready(out)
    print(f"[bench] backend={jax.default_backend()} out={out.shape}",
          file=sys.stderr)

    iters = 30
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(frames_dev))
        times.append(time.perf_counter() - t0)
    best_ms = min(times) * 1000.0
    avg_ms = sum(times) / len(times) * 1000.0

    out_mpix = 2 * 2244 * 2492 / 1e6
    print(f"[bench] best={best_ms:.3f} ms avg={avg_ms:.3f} ms "
          f"({out_mpix / (best_ms / 1000.0):.0f} Mpix/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "fsr_stereo_eyepair_2244x2492_rs075_ms",
        "value": round(best_ms, 4),
        "unit": "ms",
        "vs_baseline": round(1.0 / best_ms, 4),
    }))


if __name__ == "__main__":
    main()
