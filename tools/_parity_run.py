import sys, json; sys.path.insert(0, '/root/repo')
import numpy as np, jax

import openvr_fsr_tpu as ov
from openvr_fsr_tpu.utils import frames as FR

cpu = jax.devices("cpu")[0]
results = {}

def stats(a, b):
    d = np.abs(a.astype(int) - b.astype(int))
    return {"pixels": int(d[..., :3].size),
            "mismatch_gt0": int((d[..., :3] > 0).sum()),
            "mismatch_gt1": int((d[..., :3] > 1).sum()),
            "max_lsb": int(d.max())}

def run_pair(fr, **kw):
    a = np.asarray(ov.upscale(fr, **kw))                      # Pallas on TPU
    bt = np.asarray(ov.upscale(fr, backend="xla", **kw))      # XLA on TPU
    with jax.default_device(cpu):
        bc = np.asarray(ov.upscale(fr, backend="xla", **kw))  # oracle-bitwise
    return {"pallas_vs_xla_tpu": stats(a, bt),
            "pallas_tpu_vs_cpu_oracle": stats(a, bc)}

frames = {"zone_plate": FR.zone_plate_frame(1869, 1683),
          "noise": FR.noise_frame(1869, 1683, seed=1)}
for name, fr in frames.items():
    for radius in (0.5, 2.0):
        key = f"fsr_fused_{name}_r{radius}"
        r = run_pair(fr, render_scale=0.75, sharpness=0.9, radius=radius)
        results[key] = r
        print(key, r, flush=True)
        assert r["pallas_vs_xla_tpu"]["max_lsb"] <= 2
        assert r["pallas_vs_xla_tpu"]["mismatch_gt0"] / 16776144 < 1e-5
        assert r["pallas_tpu_vs_cpu_oracle"]["max_lsb"] <= 4
        assert r["pallas_tpu_vs_cpu_oracle"]["mismatch_gt1"] / 16776144 < 1e-4

small = FR.noise_frame(256, 224, seed=7)
for key, kw in [("rcas_only", dict(sharpness=0.9, radius=2.0)),
                ("nvscaler", dict(render_scale=0.75, use_nis=True, radius=2.0)),
                ("nvsharpen", dict(use_nis=True, radius=0.5)),
                ("fused_supersample", dict(render_scale=1.3, radius=2.0))]:
    r = run_pair(small, **kw)
    results[key] = r
    print(key, r, flush=True)
    assert r["pallas_vs_xla_tpu"]["max_lsb"] <= 2
    assert r["pallas_tpu_vs_cpu_oracle"]["max_lsb"] <= 4

out = {
  "hardware": str(jax.devices()[0]),
  "comparisons": {
    "pallas_vs_xla_tpu": "Pallas kernels vs XLA ops, both on the TPU — backend equivalence on identical hardware f32",
    "pallas_tpu_vs_cpu_oracle": "Pallas on TPU vs the XLA pipeline on host CPU, which is bitwise-equal to the NumPy scalar oracle (tests/test_easu_rcas.py); residual mismatches are TPU f32 division/FMA rounding (~1 ulp off IEEE) amplified at UNORM rounding boundaries",
  },
  "results": results,
}
with open("/root/repo/PARITY_r02.json", "w") as f:
    json.dump(out, f, indent=1)
print("PARITY_r02.json written; ALL PARITY CHECKS OK")
