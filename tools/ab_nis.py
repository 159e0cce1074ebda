"""Same-process NVScaler tile sweep (band_rows x chunk) + knob A/Bs.

Interleaved like tools/ab_fsr.py (the tunnel drifts +-10% across
processes). NVScaler compiles for minutes per config on the tunnel, so
the default sweep is small; pass --configs to override.

Usage: python tools/ab_nis.py [--radius R] [--rounds N]
                              [--configs 128x128,64x128,128x256,256x128]
                              [--derive-rows]

--derive-rows runs the floor-attribution A/B instead of the tile sweep:
legacy vs the opt-in derived-rows luma gather (NisDebugKnobs.derive_rows)
vs its two timing-only isolation probes (derive_noselect / derive_aligned,
outputs WRONG — excluded from the bit-equality check). r5 session result:
derived engaged = 53 ms/pair vs 7.7 legacy — relayout-bound, which is why
derive_rows defaults off.
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
    from openvr_fsr_tpu.kernels.nis import build_nvscaler, NisDebugKnobs

    radius = 0.5
    rounds = 8
    configs = "128x128,64x128,128x256,256x128"
    args = sys.argv[1:]
    derive_ab = "--derive-rows" in args
    if derive_ab:
        args.remove("--derive-rows")
    if "--radius" in args:
        i = args.index("--radius")
        radius = float(args[i + 1]); del args[i:i + 2]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1]); del args[i:i + 2]
    if "--configs" in args:
        i = args.index("--configs")
        configs = args[i + 1]; del args[i:i + 2]

    h_in, w_in, out_w, out_h = 1869, 1683, 2244, 2492
    fc = C.foveation_constants(out_w, out_h, radius, (0.5, 0.5), (0.5, 0.5),
                               False)
    centres = np.asarray(
        [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2, np.int64)
    nis_cfg = C.nvscaler_update_config(0.7, w_in, h_in, w_in, h_in,
                                       out_w, out_h, out_w, out_h)

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (2, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]

    if derive_ab:
        variants = [("legacy", NisDebugKnobs()),
                    ("derived", NisDebugKnobs(derive_rows=True)),
                    ("derived_noselect", NisDebugKnobs(
                        derive_rows=True, derive_noselect=True)),
                    ("derived_aligned", NisDebugKnobs(
                        derive_rows=True, derive_aligned=True))]
        builds = [(name, build_nvscaler(
            2, h_in, w_in, out_w, out_h, nis_cfg=nis_cfg, centres=centres,
            knobs=kn)) for name, kn in variants]
        for name, b in builds[1:]:
            assert b.derive_rows, f"{name}: derived-rows did not engage"
    else:
        builds = []
        for spec in configs.split(","):
            br, ch = (int(v) for v in spec.split("x"))
            builds.append((spec, build_nvscaler(
                2, h_in, w_in, out_w, out_h, nis_cfg=nis_cfg,
                centres=centres, band_rows=br, chunk=ch)))

    fns = []
    for spec, built in builds:
        t0 = time.time()
        fn = jax.jit(built)
        y = fn(imgs[0])
        _ = np.asarray(y[0, 0, 0])
        print(f"[compile] {spec}: {time.time() - t0:.0f}s", flush=True)
        fns.append((spec, fn))

    def once(fn, iters=20):
        t0 = time.perf_counter()
        for i in range(iters):
            y = fn(imgs[i % 3])
        _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
        return (time.perf_counter() - t0) / iters * 1000.0

    for _, fn in fns:
        once(fn, 3)

    times = {name: [] for name, _ in fns}
    for _ in range(rounds):
        for name, fn in fns:
            times[name].append(once(fn))

    print(f"radius={radius} rounds={rounds}")
    for name, _ in fns:
        ts = times[name]
        print(f"  band x chunk {name:10s} median "
              f"{statistics.median(ts):7.3f} ms  min {min(ts):7.3f}  "
              f"max {max(ts):7.3f}")

    ref = np.asarray(fns[0][1](imgs[0]))
    for name, fn in fns[1:]:
        if name.endswith(("_noselect", "_aligned")):
            continue                     # timing-only probes: outputs WRONG
        print(f"bit-equal {fns[0][0]} vs {name}:",
              np.array_equal(ref, np.asarray(fn(imgs[0]))))


if __name__ == "__main__":
    main()
