#!/usr/bin/env python
"""Characterize `precision="half"` (bf16 cores) vs "full" per path.

The reference ships packed-fp16 kernel variants (ffx_fsr1.h:445-594, 874+
FsrEasuH/FsrRcasH; NIS_Scaler.h:141-148 NIS_USE_HALF_PRECISION) that exist
to be *faster* on GPUs with 2x-rate fp16 VALUs. This framework exposes the
analog as `Pipeline(..., precision="half")` — bf16 elementwise cores, f32
comparisons/intrinsics — through every builder. Round 2 observed it
*slower* on v5e; round 3 never measured it. This tool settles the question
with one artifact (HALF_r04.json):

  per path: full-precision ms, half-precision ms, speedup, and the quality
  delta of half vs full on real frames (max LSB diff, PSNR), plus the
  session DMA floor so the runtime numbers are interpretable.

Interpretation note baked into the artifact: the serving paths are
memory-bound (bench.py vs_sol ~= 1), so on TPU a compute-precision
reduction has no headroom to win on the headline geometry — the honest
expected outcome is parity-to-slightly-slower, and the knob's value is API
parity + VMEM headroom (bf16 halves resident band bytes), not speed.

  python tools/half_bench.py [--paths fsr_fused,nvscaler] [--out FILE]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_paths import PATHS  # noqa: E402  (same mode truth table)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--paths", default=",".join(PATHS))
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent / "HALF_r04.json"))
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu import Config, Pipeline
    from openvr_fsr_tpu.kernels.sol import build_dma_floor
    from openvr_fsr_tpu.utils import frames as FR

    rng = np.random.default_rng(0)

    def ring_frame(stereo_u8, fn):
        h, w = stereo_u8.shape[1:3]
        hp, wp = fn.pad_to
        packed = np.ascontiguousarray(stereo_u8).view(np.uint32)[..., 0]
        return jax.device_put(np.pad(
            packed, ((0, 0), (0, hp - h), (0, wp - w))))

    def measure(fn, inputs, iters):
        y = fn(inputs[0])
        _ = np.asarray(y[0, 0, 0])

        def run(n):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = fn(inputs[i % len(inputs)])
            _ = np.asarray(jnp.sum(out[:, ::373, ::373]))
            return (time.perf_counter() - t0) / n * 1000.0

        run(5)
        return min(run(iters) for _ in range(3))

    results = {}
    for name in args.paths.split(","):
        cfg_kw, (w, h) = PATHS[name]
        cfg = Config(enabled=True, sharpness=0.9, radius=0.5, **cfg_kw)
        runtimes = {}
        outs = {}
        sol_ms = None
        for prec in ("full", "half"):
            pipe = Pipeline(cfg, precision=prec)
            fn = pipe._build(2, h, w, (0, 1))
            inputs = [
                ring_frame(np.stack([FR.zone_plate_frame(h, w),
                                     FR.noise_frame(h, w, seed=1)]), fn),
                ring_frame(
                    rng.integers(0, 256, (2, h, w, 4)).astype(np.uint8), fn),
            ]
            runtimes[prec] = measure(fn, inputs, args.iters)
            outs[prec] = np.asarray(fn(inputs[0]))
            if sol_ms is None and getattr(fn, "dma_geometry", None):
                floor = jax.jit(build_dma_floor(fn.dma_geometry))
                sol_ms = measure(floor, inputs, args.iters)

        # quality: half vs full on the packed-u32 output, per 8-bit channel
        a = outs["full"].view(np.uint8).astype(np.int32)
        b = outs["half"].view(np.uint8).astype(np.int32)
        d = np.abs(a - b)
        mse = float((d.astype(np.float64) ** 2).mean())
        psnr = float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
        results[name] = {
            "full_ms": round(runtimes["full"], 4),
            "half_ms": round(runtimes["half"], 4),
            "half_speedup": round(runtimes["full"] / runtimes["half"], 4),
            "hbm_sol_ms": round(sol_ms, 4) if sol_ms else None,
            "full_vs_sol": round(sol_ms / runtimes["full"], 4)
            if sol_ms else None,
            "max_lsb_diff": int(d.max()),
            "mean_lsb_diff": round(float(d.mean()), 4),
            "psnr_db": round(psnr, 1) if psnr != float("inf") else "inf",
        }
        print(f"[half_bench] {name}: full {runtimes['full']:.3f} ms, "
              f"half {runtimes['half']:.3f} ms "
              f"({results[name]['half_speedup']:.2f}x), "
              f"max LSB {d.max()}, PSNR {results[name]['psnr_db']} dB",
              file=sys.stderr, flush=True)

    from openvr_fsr_tpu.utils.timing import hbm_calibration
    rbw, wbw = hbm_calibration()
    results["_meta"] = {
        "config": "stereo pair, sharpness 0.9, radius 0.5, packed-u32 "
                  "serving input, headline geometry per path",
        "session_hbm_read_gbs": round(rbw / 1e9, 1),
        "session_hbm_write_gbs": round(wbw / 1e9, 1),
        "reference_analog": "ffx_fsr1.h:445-594,874+ (FsrEasuH/FsrRcasH), "
                            "NIS_Scaler.h:141-148 (NIS_USE_HALF_PRECISION)",
        "interpretation": "serving paths are memory-bound at the DMA floor "
                          "(full_vs_sol ~= 1); a compute-precision "
                          "reduction cannot beat the floor, so half's value "
                          "on TPU is API parity + halved resident band "
                          "bytes (VMEM headroom), not throughput",
    }
    Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps({k: (v["half_speedup"] if isinstance(v, dict)
                          and "half_speedup" in v else None)
                      for k, v in results.items() if k != "_meta"}))


if __name__ == "__main__":
    main()
