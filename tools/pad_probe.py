"""Is the fn-level jnp.pad the per-call fixed cost? Compare:
  A. kernel fn with unpadded input (pad runs per call)
  B. kernel fn fed an already-padded (HP, WP) input (pad elided)
  C. jit(pad) alone
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu.core import constants as C
    from openvr_fsr_tpu.kernels import fsr as KF

    h_in, w_in, out_w, out_h = 1869, 1683, 2244, 2492
    HP, WP = 1872, 1792
    fc = C.foveation_constants(out_w, out_h, 0.5, (0.5, 0.5), (0.5, 0.5),
                               False)
    centres = np.asarray(
        [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2, np.int64)
    rng = np.random.default_rng(0)

    def bench(fn, inputs, iters=40):
        y = fn(inputs[0])
        _ = np.asarray(jnp.ravel(y)[0])

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(inputs[i % len(inputs)])
            _ = np.asarray(jnp.sum(jnp.ravel(y)[::12345]))
            return (time.perf_counter() - t0) / n * 1000.0

        run(5)
        return min(run(iters) for _ in range(3))

    fn = jax.jit(KF.build_fsr_fused(
        2, h_in, w_in, out_w, out_h, sharpness=0.9, centres=centres))
    raw = [jax.device_put(
        rng.integers(0, 2**32, (2, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]
    print(f"A fn(unpadded): {bench(fn, raw):.3f} ms", flush=True)

    padded = [jax.device_put(
        np.pad(np.asarray(r), ((0, 0), (0, HP - h_in), (0, WP - w_in))))
        for r in raw]
    print(f"B fn(pre-padded input): {bench(fn, padded):.3f} ms", flush=True)

    pad = jax.jit(lambda x: jnp.pad(x, ((0, 0), (0, HP - h_in),
                                        (0, WP - w_in))))
    print(f"C jit(pad) alone: {bench(pad, raw):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
