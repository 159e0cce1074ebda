"""Same-process A/B benchmarking of fused-kernel variants.

The axon tunnel drifts +-10% across process restarts, so fair comparisons
must interleave variants within one process: each round measures every
variant once, and per-variant medians of per-round times are reported.

Usage: python tools/ab_fsr.py FLAG=VALUE ... [--radius R] [--rounds N]
                              [--check]
e.g.   python tools/ab_fsr.py _EPI_SPECIALIZE=False
builds the baseline (current defaults) and one variant per FLAG=VALUE arg.
--check additionally asserts each variant's output is BITWISE equal to the
baseline on-chip (for knobs that claim exactness, e.g. mm_bf16_out /
no_tap_split — not for the output-wrong profiling probes).
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
    from openvr_fsr_tpu.kernels import fsr as KF

    radius = 0.5
    rounds = 8
    args = sys.argv[1:]
    if "--radius" in args:
        i = args.index("--radius")
        radius = float(args[i + 1]); del args[i:i + 2]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1]); del args[i:i + 2]
    check = "--check" in args
    if check:
        args.remove("--check")

    h_in, w_in, out_w, out_h = 1869, 1683, 2244, 2492
    fc = C.foveation_constants(out_w, out_h, radius, (0.5, 0.5), (0.5, 0.5),
                               False)
    centres = np.asarray(
        [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2, np.int64)

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (2, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]

    def build(flags):
        # flag names accept both legacy "_SKIP_STAGE1" and "skip_stage1"
        knobs = KF.DebugKnobs(
            **{k.lstrip("_").lower(): v for k, v in flags.items()})
        fn = jax.jit(KF.build_fsr_fused(
            2, h_in, w_in, out_w, out_h, sharpness=0.9, centres=centres,
            knobs=knobs))
        y = fn(imgs[0])                  # compile now
        _ = np.asarray(y[0, 0, 0])
        return fn

    variants = [("baseline", {})]
    for a in args:
        k, v = a.split("=")
        variants.append((a, {k: eval(v)}))

    fns = [(name, build(flags)) for name, flags in variants]

    if check:
        base = np.asarray(fns[0][1](imgs[0]))
        for name, fn in fns[1:]:
            eq = np.array_equal(base, np.asarray(fn(imgs[0])))
            print(f"  {name}: bitwise_equal={eq}")
            assert eq, f"{name} is not bit-identical to baseline"

    def once(fn, iters=25):
        t0 = time.perf_counter()
        for i in range(iters):
            y = fn(imgs[i % 3])
        _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
        return (time.perf_counter() - t0) / iters * 1000.0

    for _, fn in fns:
        once(fn, 5)                      # warm

    times = {name: [] for name, _ in fns}
    for r in range(rounds):
        for name, fn in fns:
            times[name].append(once(fn))

    print(f"radius={radius} rounds={rounds}")
    for name, _ in fns:
        ts = times[name]
        print(f"  {name:34s} median {statistics.median(ts):7.3f} ms  "
              f"min {min(ts):7.3f}  max {max(ts):7.3f}")


if __name__ == "__main__":
    main()
