"""Quick-tier Pallas kernel smoke: one tiny interpret-mode drive per kernel
family so the per-push CI tier (-m "not slow") still exercises every Pallas
builder end-to-end. Full parity sweeps live in test_kernels_fsr.py /
test_spatial.py (marked slow, run on the CI schedule)."""

import numpy as np
import pytest

from openvr_fsr_tpu import Config, Pipeline
from openvr_fsr_tpu.utils import frames as FR


def _backend():
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "pallas-interpret"


@pytest.mark.parametrize("kw", [
    dict(render_scale=0.75),                  # fused EASU+RCAS
    dict(render_scale=1.0),                   # RCAS sharpen-only
    dict(render_scale=0.75, use_nis=True),    # NVScaler
    dict(render_scale=1.0, use_nis=True),     # NVSharpen
    dict(render_scale=0.75, use_cas=True),    # CAS upscale
    dict(render_scale=1.0, use_cas=True),     # CAS sharpen-only
], ids=["fsr", "rcas", "nvscaler", "nvsharpen", "cas_up", "cas_sh"])
def test_kernel_smoke_matches_xla(kw):
    frames = np.stack([FR.zone_plate_frame(48, 56),
                       FR.noise_frame(48, 56, seed=3)])
    cfg = Config(enabled=True, sharpness=0.9, radius=0.5, **kw)
    ref = np.asarray(Pipeline(cfg, backend="xla").process(frames,
                                                          eyes=(0, 1)))
    got = np.asarray(Pipeline(cfg, backend=_backend()).process(frames,
                                                               eyes=(0, 1)))
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert (diff == 0).mean() >= 0.99 and diff.max() <= 16


def test_spatial_smoke_strips_match_single_device():
    import jax

    from openvr_fsr_tpu.parallel.spatial import SpatialFsrPipeline

    cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
    frames = np.stack([FR.zone_plate_frame(48, 56),
                       FR.noise_frame(48, 56, seed=3)])
    packed = np.ascontiguousarray(frames).view(np.uint32)[..., 0]
    single = np.asarray(Pipeline(cfg, backend=_backend()).process(
        packed, eyes=(0, 1)))
    sp = SpatialFsrPipeline(cfg, devices=jax.devices("cpu")[:2],
                            interpret=True)
    sharded = sp.process(packed, eyes=(0, 1))
    assert np.array_equal(single, sharded)
