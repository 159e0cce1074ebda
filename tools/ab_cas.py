"""Same-process A/B of the CAS upscale prologue variants.

Interleaved like tools/ab_fsr.py (the tunnel drifts +-10% across
processes): derived-rows prologue (default) vs the direct 4-block
row-gather fallback (no_derive=True), at the headline CAS geometry.

Usage: python tools/ab_cas.py [--radius R] [--rounds N]
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu.core import constants as C
    from openvr_fsr_tpu.kernels.cas import build_cas_upscale

    radius = 0.5
    rounds = 8
    args = sys.argv[1:]
    if "--radius" in args:
        i = args.index("--radius")
        radius = float(args[i + 1]); del args[i:i + 2]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1]); del args[i:i + 2]

    h_in, w_in, out_w, out_h = 1869, 1683, 2244, 2492
    fc = C.foveation_constants(out_w, out_h, radius, (0.5, 0.5), (0.5, 0.5),
                               False)
    centres = np.asarray(
        [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2, np.int64)

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (2, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]

    def build(no_derive):
        fn = jax.jit(build_cas_upscale(
            2, h_in, w_in, out_w, out_h, sharpness=0.8, centres=centres,
            no_derive=no_derive))
        y = fn(imgs[0])
        _ = np.asarray(y[0, 0, 0])
        return fn

    fns = [("derived-rows", build(False)), ("4-block gather", build(True))]

    def once(fn, iters=25):
        t0 = time.perf_counter()
        for i in range(iters):
            y = fn(imgs[i % 3])
        _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
        return (time.perf_counter() - t0) / iters * 1000.0

    for _, fn in fns:
        once(fn, 5)

    times = {name: [] for name, _ in fns}
    for _ in range(rounds):
        for name, fn in fns:
            times[name].append(once(fn))

    print(f"radius={radius} rounds={rounds}")
    for name, _ in fns:
        ts = times[name]
        print(f"  {name:20s} median {statistics.median(ts):7.3f} ms  "
              f"min {min(ts):7.3f}  max {max(ts):7.3f}")

    a = np.asarray(fns[0][1](imgs[0]))
    b = np.asarray(fns[1][1](imgs[0]))
    print("bit-equal:", np.array_equal(a, b))


if __name__ == "__main__":
    main()
