"""Spatial row-band sharding on real silicon (VERDICT r4 #7).

The strip kernels (kernels/fsr.build_fsr_fused(band_range=...)) had only
ever executed on the virtual CPU mesh (interpret mode) — their TPU
*lowering* was unexercised. This drives SpatialFsrPipeline with 3 strips
pinned to the ONE real chip (sequential execution — the latency win needs
real neighbors, but the compiled-kernel semantics don't), and asserts the
concatenated strip outputs are BITWISE equal to the single-kernel fused
pipeline on the same chip, for both the FSR and CAS scaling paths.

Reference analog: the strips decompose the same two-dispatch work
PostProcessor.cpp:385-401 issues once per eye; equality to the unsharded
kernel is the correctness bar.

Usage: python tools/spatial_onchip.py [--out SPATIAL_ONCHIP.json]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from openvr_fsr_tpu import Config, Pipeline
    from openvr_fsr_tpu.parallel.spatial import SpatialFsrPipeline
    from openvr_fsr_tpu.utils import frames as FR

    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("no TPU — spatial_onchip needs the real chip", flush=True)
        raise SystemExit(1)
    dev = jax.devices()[0]

    h, w = 1869, 1683
    frames = np.stack([FR.zone_plate_frame(h, w),
                       FR.noise_frame(h, w, seed=3)])

    results = {}
    for name, cfg in [
        ("fsr_fused", Config(enabled=True, render_scale=0.75, sharpness=0.9,
                             radius=0.5)),
        ("cas_upscale", Config(enabled=True, render_scale=0.75,
                               sharpness=0.6, radius=0.5, use_cas=True)),
    ]:
        ref = np.asarray(
            Pipeline(cfg, backend="pallas").process(frames, eyes=(0, 1)))
        ref_u32 = np.ascontiguousarray(ref).view(np.uint32)[..., 0]
        sp = SpatialFsrPipeline(cfg, devices=[dev] * 3)
        got = sp.process(frames, eyes=(0, 1))
        ok = bool(np.array_equal(got, ref_u32))
        results[name] = {"strips": 3, "bitwise_equal": ok,
                         "pixels": int(ref_u32.size)}
        print(f"SPATIAL {name}: 3 strips on-chip, bitwise_equal={ok}",
              flush=True)
        if not ok:
            diff = (got != ref_u32)
            print(f"  MISMATCH on {diff.sum()} / {diff.size} texels",
                  flush=True)

    all_ok = all(r["bitwise_equal"] for r in results.values())
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"hardware": str(dev), "results": results}, f,
                      indent=1)
        print(f"wrote {out_path}")
    raise SystemExit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
