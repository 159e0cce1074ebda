"""Parity artifact generator — Pallas-on-TPU vs the NumPy scalar oracle.

The judge is oracle.pipeline.pipeline_oracle: the full reference pipeline
composed from the scalar-faithful kernel oracles in pure NumPy (IEEE RN
f32, no FMA contraction) — the "CPU scalar reference" of BASELINE target
row 1. Every entry runs at full working resolution:

  - FSR fused EASU+RCAS  1683x1869 -> 2244x2492, radius 0.5 and 2.0
  - RCAS sharpen-only    rs=1 at 2244x2492
  - FSR supersample      rs=1.3, 2244x2492 -> 2917x3239
  - NVScaler             1683x1869 -> 2244x2492
  - NVSharpen            rs=1 at 2244x2492
  - CAS upscale/sharpen  same geometries

Oracle outputs are cached in /tmp/parity_oracle_cache.npz (pure host
work, ~minutes on one core). Run on the TPU host: the Pallas side uses
the default backend (= pallas on TPU).

Usage: python tools/parity.py [--skip-nis] [--out PARITY_rNN.json]
(--skip-nis skips NVScaler's minutes-long compile when iterating on the
others; --out defaults to PARITY.json)
"""

import glob
import hashlib
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CACHE = "/tmp/parity_oracle_cache.npz"


def _oracle_fingerprint():
    """Digest of every source the oracle's output depends on, so editing
    the oracle (or its constant tables) invalidates cached outputs."""
    h = hashlib.sha1()
    deps = sorted(glob.glob(os.path.join(ROOT, "openvr_fsr_tpu/oracle/*.py"))
                  + [os.path.join(ROOT, "openvr_fsr_tpu/core", f)
                     for f in ("constants.py", "nis_tables.py",
                               "foveation.py")])
    for p in deps:
        if os.path.exists(p):
            h.update(open(p, "rb").read())
    return h.hexdigest()


def _case_key(name, frame, kw, oracle_fp):
    """Cache key = case name + digest of (config, frame, oracle sources) —
    a stale /tmp cache can never be judged against silently."""
    h = hashlib.sha1(oracle_fp.encode())
    h.update(repr(sorted(kw.items())).encode())
    h.update(np.ascontiguousarray(frame).tobytes())
    return f"{name}:{h.hexdigest()[:16]}"


def main():
    import jax

    from openvr_fsr_tpu import Config, Pipeline
    from openvr_fsr_tpu.oracle.pipeline import pipeline_oracle
    from openvr_fsr_tpu.utils import frames as FR

    skip_nis = "--skip-nis" in sys.argv
    out_name = (sys.argv[sys.argv.index("--out") + 1]
                if "--out" in sys.argv else "PARITY.json")
    # --oracle-only: fill the oracle cache (pure host work) without
    # touching the device — lets the cache build while the TPU is busy
    # or unreachable, so the on-TPU run is short.
    oracle_only = "--oracle-only" in sys.argv

    h_in, w_in = 1869, 1683          # headline render size (BASELINE.md)
    oh, ow = 2492, 2244              # headline output size
    frames = {
        "zone_plate": FR.zone_plate_frame(h_in, w_in),
        "noise": FR.noise_frame(h_in, w_in, seed=1),
    }
    big = {name: FR.zone_plate_frame(oh, ow) if name == "zone_plate"
           else FR.noise_frame(oh, ow, seed=1) for name in ("zone_plate",)}

    # (key, frame, kwargs-for-both-sides)
    cases = [
        ("fsr_fused_zone_r0.5", frames["zone_plate"],
         dict(render_scale=0.75, sharpness=0.9, radius=0.5)),
        ("fsr_fused_zone_r2.0", frames["zone_plate"],
         dict(render_scale=0.75, sharpness=0.9, radius=2.0)),
        ("fsr_fused_noise_r0.5", frames["noise"],
         dict(render_scale=0.75, sharpness=0.9, radius=0.5)),
        ("fsr_fused_noise_r2.0", frames["noise"],
         dict(render_scale=0.75, sharpness=0.9, radius=2.0)),
        ("rcas_only_zone", big["zone_plate"],
         dict(render_scale=1.0, sharpness=0.9, radius=2.0)),
        ("fsr_supersample_zone", big["zone_plate"],
         dict(render_scale=1.3, sharpness=0.9, radius=2.0)),
        ("cas_upscale_noise", frames["noise"],
         dict(render_scale=0.75, sharpness=0.8, radius=2.0, use_cas=True)),
        ("cas_sharpen_zone", big["zone_plate"],
         dict(render_scale=1.0, sharpness=0.8, radius=2.0, use_cas=True)),
    ]
    if not skip_nis:
        cases += [
            ("nvscaler_noise", frames["noise"],
             dict(render_scale=0.75, sharpness=0.7, radius=2.0,
                  use_nis=True)),
            ("nvscaler_zone_r0.5", frames["zone_plate"],
             dict(render_scale=0.75, sharpness=0.7, radius=0.5,
                  use_nis=True)),
            ("nvsharpen_zone", big["zone_plate"],
             dict(render_scale=1.0, sharpness=0.7, radius=2.0,
                  use_nis=True)),
        ]

    cache = dict(np.load(CACHE)) if os.path.exists(CACHE) else {}
    oracle_fp = _oracle_fingerprint()

    results = {}
    for key, fr, kw in cases:
        ck = _case_key(key, fr, kw, oracle_fp)
        if ck not in cache:
            t0 = time.perf_counter()
            cache[ck] = pipeline_oracle(
                fr, kw["render_scale"], kw["sharpness"],
                use_nis=kw.get("use_nis", False),
                use_cas=kw.get("use_cas", False), radius=kw["radius"])
            print(f"[oracle] {key}: {time.perf_counter() - t0:.0f}s",
                  file=sys.stderr, flush=True)
            np.savez_compressed(CACHE, **cache)
        want = cache[ck]
        if oracle_only:
            continue

        cfg = Config(enabled=True, render_scale=kw["render_scale"],
                     sharpness=kw["sharpness"], radius=kw["radius"],
                     use_nis=kw.get("use_nis", False),
                     use_cas=kw.get("use_cas", False))
        t0 = time.perf_counter()
        got = np.asarray(Pipeline(cfg).process(fr[None], eyes=(0,)))[0]
        print(f"[tpu] {key}: {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)

        d = np.abs(got.astype(np.int64) - want.astype(np.int64))
        results[key] = {
            "pixels": int(d.size),
            "mismatch_gt0": int((d > 0).sum()),
            "mismatch_gt1": int((d > 1).sum()),
            "max_lsb": int(d.max()),
        }
        print(key, results[key], flush=True)

    if oracle_only:
        print("oracle cache primed:", CACHE)
        return

    # Merge with the existing artifact so a --skip-nis run refreshes the
    # FSR/CAS entries without dropping the NVScaler ones.
    art = os.path.join(ROOT, out_name)
    if skip_nis and os.path.exists(art):
        with open(art) as f:
            prev = json.load(f).get("results", {})
        for k, v in prev.items():
            results.setdefault(k, v)

    import jax as j
    out = {
        "hardware": str(j.devices()[0]),
        "comparison": ("Pallas kernels on TPU (production backend) vs the "
                       "NumPy scalar full-pipeline oracle "
                       "(oracle/pipeline.py) — the CPU scalar reference of "
                       "BASELINE target row 1. All entries at full working "
                       "resolution."),
        "results": results,
        "all_max_lsb": max(r["max_lsb"] for r in results.values()),
    }
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{out_name} written:",
          {k: v["max_lsb"] for k, v in results.items()})


if __name__ == "__main__":
    main()
