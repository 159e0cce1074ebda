"""Locate the per-call cost that batch amortizes (VERDICT r2 item 1c).

Measures, same-process on the real chip:
  A. raw fused kernel, packed u32, B=2  (one stereo pair)
  B. raw fused kernel, packed u32, B=32 (16 pairs)   -> per-pair
  C. pipeline wrapper, u8 NHWC, B=2    (bench.py's config)
  D. pipeline wrapper, packed u32, B=2 (zero-copy API mode)

If A ~= B/16, the kernel itself has no per-call overhead and the bench gap
is the u8<->u32 relayout in C.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu import Config, Pipeline
    from openvr_fsr_tpu.core import constants as C
    from openvr_fsr_tpu.kernels import fsr as KF

    h_in, w_in, out_w, out_h = 1869, 1683, 2244, 2492
    radius = 0.5
    fc = C.foveation_constants(out_w, out_h, radius, (0.5, 0.5), (0.5, 0.5),
                               False)

    def centres(b):
        return np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * b, np.int64)

    rng = np.random.default_rng(0)

    def bench(fn, inputs, pairs, iters=40):
        y = fn(inputs[0])
        jax.block_until_ready(y)
        _ = np.asarray(jnp.ravel(y)[0])

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(inputs[i % len(inputs)])
            _ = np.asarray(jnp.sum(jnp.ravel(y)[:: max(1, y.size // 64)]))
            return (time.perf_counter() - t0) / n / pairs * 1000.0

        run(5)
        return min(run(iters) for _ in range(3))

    results = {}

    # A/B: raw kernel packed at B=2 and B=32
    for tag, b, iters in (("A raw packed B=2", 2, 40),
                          ("B raw packed B=32", 32, 6)):
        print(f"[{tag}] building...", flush=True)
        fn = jax.jit(KF.build_fsr_fused(
            b, h_in, w_in, out_w, out_h, sharpness=0.9, centres=centres(b)))
        nbuf = 3 if b == 2 else 1
        inputs = [jax.device_put(
            rng.integers(0, 2**32, (b, h_in, w_in), dtype=np.uint32))
            for _ in range(nbuf)]
        print(f"[{tag}] uploaded", flush=True)
        results[tag] = bench(fn, inputs, pairs=b // 2, iters=iters)
        print(f"{tag}: {results[tag]:.3f} ms/pair", flush=True)
        del fn, inputs

    # C/D: pipeline wrapper u8 vs packed at B=2
    cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=radius)
    pipe = Pipeline(cfg)
    fn = pipe._build(2, h_in, w_in, (0, 1))
    u8_inputs = [jax.device_put(
        rng.integers(0, 256, (2, h_in, w_in, 4)).astype(np.uint8))
        for _ in range(3)]
    results["C pipe u8 B=2"] = bench(fn, u8_inputs, pairs=1)
    print(f"C pipe u8 B=2: {results['C pipe u8 B=2']:.3f} ms/pair", flush=True)
    pk_inputs = [jax.device_put(
        rng.integers(0, 2**32, (2, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]
    results["D pipe packed B=2"] = bench(fn, pk_inputs, pairs=1)
    print(f"D pipe packed B=2: {results['D pipe packed B=2']:.3f} ms/pair",
          flush=True)


if __name__ == "__main__":
    main()
