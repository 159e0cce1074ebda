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


class Test8KStretchConfig:
    """The batch=32 8K sharded stretch config (BASELINE.json config 5).
    CI-sized pieces: (a) the fused kernel BUILDS at true 8K geometry with
    VMEM-fitting band auto-shrink; (b) the full-width 7680-column kernel
    executes (interpret, short bands); (c) the sharded batch mechanics run
    at the 8K aspect on the 8-device mesh. The full-size single-chip run is
    recorded in BENCH_8K.json (TPU v5e: 12.1 ms/frame, 2753 Mpix/s/chip)."""

    def test_8k_kernel_builds_with_vmem_fit(self):
        from openvr_fsr_tpu.kernels.fsr import build_fsr_fused
        from openvr_fsr_tpu.core import constants as C

        out_w, out_h = 7680, 4320
        in_w, in_h = 5760, 3240            # renderScale 0.75
        fc = C.foveation_constants(out_w, out_h, 2.0, (0.5, 0.5), (0.5, 0.5),
                                   False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]], np.int64)
        # construction builds every host-side map at full 8K geometry; the
        # band auto-shrink must kick in (band 128 at 7680-wide scratches
        # would blow the 24 MB scratch budget)
        fn = build_fsr_fused(1, in_h, in_w, out_w, out_h, sharpness=0.9,
                             centres=centres)
        assert fn is not None

    @pytest.mark.slow
    def test_8k_width_executes(self):
        """Full 7680-column output width through the real kernel path
        (interpret): exercises the 60-chunk loop and the row-window maps at
        stretch-config width with a short frame. Slow tier: the 60-chunk
        interpret-mode trace alone runs ~80 s — the dominant term that
        pushed the quick tier past its 5-minute promise (VERDICT r4 #6);
        construction coverage stays quick via test_8k_width_builds."""
        from openvr_fsr_tpu import Config, Pipeline

        in_h, in_w = 24, 5760              # -> 32 x 7680
        frames = _frames(1, in_h, in_w)
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=2.0)
        ref = np.asarray(Pipeline(cfg, backend="xla").process(frames))
        got = np.asarray(Pipeline(cfg, backend="pallas-interpret")
                         .process(frames))
        assert got.shape == (1, 32, 7680, 4)
        d = np.abs(got.astype(int) - ref.astype(int))
        assert (d == 0).mean() >= 0.99 and d.max() <= 16

    def test_8k_aspect_sharded_batch(self, mesh):
        """batch=16 at the 8K aspect ratio sharded over the mesh == local
        (local batch 2 so the stereo eye pattern repeats per shard)."""
        from openvr_fsr_tpu import Config, Pipeline

        frames = _frames(16, 27, 48)       # 16:9, rs 0.75 -> 36 x 64
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        eyes = tuple(i % 2 for i in range(16))
        ref = np.asarray(Pipeline(cfg, backend="xla")
                         .process(frames, eyes=eyes))
        out = np.asarray(ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
                         .process(frames, eyes=eyes))
        assert np.array_equal(out, ref)

    def test_8k_aspect_sharded_batch32(self, mesh):
        """BASELINE.json config 5 as worded: batch=32 over the 8-device
        mesh (local batch 4 per shard — the bench_8k.py per-chip config) at
        the 8K aspect ratio. Validates the exact sharding the extrapolated
        BENCH_8K.json number assumes."""
        from openvr_fsr_tpu import Config, Pipeline

        frames = _frames(32, 27, 48)       # 16:9, rs 0.75 -> 36 x 64
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=2.0)           # the 8K video config (bench_8k)
        eyes = tuple(i % 2 for i in range(32))
        ref = np.asarray(Pipeline(cfg, backend="xla")
                         .process(frames, eyes=eyes))
        out = np.asarray(ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
                         .process(frames, eyes=eyes))
        assert np.array_equal(out, ref)


class TestShardedPackedU32:
    def test_packed_matches_u8(self, mesh):
        """Zero-copy packed-u32 frames shard and process identically to the
        uint8 NHWC path."""
        from openvr_fsr_tpu import Config, Pipeline

        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        u8 = _frames(16)
        u32 = u8.view(np.uint32)[..., 0]
        eyes = tuple(i % 2 for i in range(16))
        sp = ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
        a = np.asarray(sp.process(u8, eyes=eyes))
        b = np.asarray(sp.process(u32, eyes=eyes))
        assert b.dtype == np.uint32 and b.ndim == 3
        assert np.array_equal(np.ascontiguousarray(a).view(np.uint32)[..., 0], b)


class TestShardedBounds:
    def test_bounds_crop_matches_local(self, mesh):
        """bounds/crop parity with Pipeline.process across the mesh."""
        from openvr_fsr_tpu import Config, Pipeline

        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        frames = _frames(8)
        bounds = (0.0, 0.0, 1.0, 0.5)
        ref = np.asarray(Pipeline(cfg, backend="xla").process(
            frames, eyes=(0,) * 8, bounds=bounds, crop=True))
        out = np.asarray(ShardedPipeline(Pipeline(cfg, backend="xla"), mesh)
                         .process(frames, eyes=(0,) * 8, bounds=bounds,
                                  crop=True))
        assert np.array_equal(out, ref)

    def test_double_wide_bounds_flip(self, mesh):
        """Half-width bounds flip to double-wide without the eye-pattern
        check rejecting the (now meaningless) default alternating eyes."""
        from openvr_fsr_tpu import Config, Pipeline

        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.4)
        frames = _frames(8, 32, 80)
        bounds = (0.0, 0.0, 0.5, 1.0)      # half-width -> double-wide
        pipe = Pipeline(cfg, backend="xla",
                        eye_centers=((0.5, 0.5), (0.5, 0.5)))
        ref = np.asarray(Pipeline(cfg, backend="xla",
                                  eye_centers=((0.5, 0.5), (0.5, 0.5)))
                         .process(frames, bounds=bounds))
        out = np.asarray(ShardedPipeline(pipe, mesh)
                         .process(frames, bounds=bounds))
        assert not pipe.single_eye_per_frame      # the flip happened
        assert not pipe.timer.scale_for_stereo    # timer followed the flip
        assert np.array_equal(out, ref)
