"""Multi-chip data parallelism (parallel/sharding.py) on the virtual 8-device
CPU mesh set up by conftest: sharded results must equal the single-device
pipeline, for both the XLA op path and the Pallas kernels (interpret mode)."""

import numpy as np
import pytest

from openvr_fsr_tpu import Config, Pipeline
from openvr_fsr_tpu.parallel import make_mesh, shard_batch
from openvr_fsr_tpu.parallel.sharding import ShardedPipeline
from openvr_fsr_tpu.utils import frames as FR


@pytest.fixture(scope="module")
def mesh():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def _frames(b, h=48, w=64):
    return np.stack([FR.noise_frame(h, w, seed=i) for i in range(b)])


class TestShardedPipeline:
    @pytest.mark.parametrize("backend", ["xla", "pallas-interpret"])
    def test_matches_local(self, mesh, backend):
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
        frames = _frames(16)
        eyes = tuple(i % 2 for i in range(16))
        ref = np.asarray(Pipeline(cfg, backend=backend)
                         .process(frames, eyes=eyes))
        out = np.asarray(ShardedPipeline(Pipeline(cfg, backend=backend), mesh)
                         .process(frames, eyes=eyes))
        assert np.array_equal(out, ref)

    def test_output_stays_sharded(self, mesh):
        cfg = Config(enabled=True, render_scale=0.75, radius=2.0)
        sp = ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
        out = sp.process(_frames(8), eyes=(0,) * 8)
        assert len(out.sharding.device_set) == 8

    def test_rejects_ragged_batch(self, mesh):
        cfg = Config(enabled=True, render_scale=0.75)
        sp = ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
        with pytest.raises(ValueError):
            sp.process(_frames(6))

    def test_rejects_nonuniform_eye_pattern(self, mesh):
        cfg = Config(enabled=True, render_scale=0.75)
        sp = ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
        with pytest.raises(ValueError):
            sp.process(_frames(8), eyes=(0, 1, 1, 0, 0, 1, 0, 1))

    def test_shard_batch_placement(self, mesh):
        x = shard_batch(np.zeros((8, 4, 4, 4), np.uint8), mesh)
        assert len(x.sharding.device_set) == 8

    def test_cache_respecializes_on_mutation(self, mesh):
        """Mutating backend/precision/color_bits between sharded calls must
        not reuse the stale compiled fn (key parity with Pipeline.process)."""
        cfg = Config(enabled=True, render_scale=0.75, radius=2.0)
        pipe = Pipeline(cfg, backend="xla")
        sp = ShardedPipeline(pipe, mesh)
        frames = _frames(8)
        sp.process(frames, eyes=(0,) * 8)
        n0 = len(pipe._cache)
        pipe.backend = "pallas-interpret"
        sp.process(frames, eyes=(0,) * 8)
        assert len(pipe._cache) == n0 + 1
        pipe.precision = "half"
        sp.process(frames, eyes=(0,) * 8)
        assert len(pipe._cache) == n0 + 2
