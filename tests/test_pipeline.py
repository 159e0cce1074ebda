"""Pipeline orchestration: mode truth table, shapes, foveation, config,
debug tint, capture — mirroring PostProcessor.cpp behavior."""

import numpy as np
import pytest

from openvr_fsr_tpu import Config, Pipeline, upscale, load_config
from openvr_fsr_tpu.core import constants as C
from openvr_fsr_tpu.core import foveation as fov
from openvr_fsr_tpu.utils import frames as FR


class TestStagePlan:
    # PostProcessor.cpp:530-535, 586-594
    def test_fsr_downscale(self):
        assert Config(render_scale=0.75).stage_plan() == (True, True)

    def test_fsr_identity(self):
        assert Config(render_scale=1.0).stage_plan() == (False, True)

    def test_fsr_supersample(self):
        assert Config(render_scale=1.3).stage_plan() == (True, True)

    def test_nis_downscale(self):
        assert Config(render_scale=0.75, use_nis=True).stage_plan() == (True, False)

    def test_nis_identity(self):
        assert Config(render_scale=1.0, use_nis=True).stage_plan() == (False, True)

    def test_output_size(self):
        # rs<1 divides; rs>1 multiplies (PostProcessor.cpp:512-518)
        assert Config(render_scale=0.75).output_size(1683, 1869) == (2244, 2492)
        assert Config(render_scale=1.3).output_size(2244, 2492) == (2917, 3239)
        assert Config(render_scale=1.0).output_size(100, 200) == (100, 200)


class TestConfigFile:
    REF_CFG = """{
      "fsr": {
        // comment
        "enabled": true,
        "useNIS": false,
        "renderScale": 0.77,
        "sharpness": 0.9,
        "radius": 0.5,
        "applyMIPBias": true,
        "debugMode": false,
        "hotkeys": { "enabled": true, "toggleUseNIS": 112 }
      }
    }"""

    def test_parses_commented_json(self):
        cfg = load_config(text=self.REF_CFG)
        assert cfg.enabled and not cfg.use_nis
        assert cfg.render_scale == 0.77 and cfg.sharpness == 0.9
        assert cfg.hotkeys.toggle_use_nis == 112

    def test_negative_sharpness_clamped(self):
        cfg = load_config(text='{"fsr": {"sharpness": -2}}')
        assert cfg.sharpness == 0.0

    def test_bad_file_gives_defaults(self):
        cfg = load_config(text="not json {")
        assert cfg == Config()

    def test_reference_cfg_file_parses(self):
        import pathlib
        ref = pathlib.Path("/root/reference/src/openvr_mod.cfg")
        if not ref.exists():
            pytest.skip("reference tree not mounted")
        cfg = load_config(path=ref)
        assert cfg.enabled and cfg.render_scale == 0.77 and cfg.sharpness == 0.9


class TestFoveationMask:
    def test_radius_two_covers_everything(self):
        fc = C.foveation_constants(128, 96, 2.0, (0.5, 0.5), (0.5, 0.5))
        m = fov.pixel_mask(128, 96, fov.TILE_FSR, (fc.centre_left, fc.centre_right),
                           fc.radius_sq)
        assert m.all()

    def test_radius_zero_covers_almost_nothing(self):
        fc = C.foveation_constants(128, 96, 0.0, (0.5, 0.5), (0.5, 0.5))
        m = fov.tile_mask(128, 96, fov.TILE_FSR, (fc.centre_left, fc.centre_right),
                          fc.radius_sq)
        assert m.sum() <= 1  # at most the exact-centre tile

    def test_predicate_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            w, h = rng.integers(32, 300, 2)
            cx, cy = rng.integers(0, 300, 2)
            r2 = int(rng.integers(0, 90000))
            m = fov.tile_mask(int(w), int(h), (16, 16), ((cx, cy), (cx, cy)), r2)
            ty, tx = m.shape
            for gy in range(ty):
                for gx in range(tx):
                    gcx, gcy = gx * 16 + 8, gy * 16 + 8
                    want = (cx - gcx) ** 2 + (cy - gcy) ** 2 <= r2
                    assert m[gy, gx] == want


class TestPipelineEndToEnd:
    def test_fsr_stereo_shapes_uint8(self):
        frames = np.stack([FR.gradient_frame(96, 104), FR.noise_frame(96, 104)])
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=2.0)
        out = np.asarray(Pipeline(cfg).process(frames))
        assert out.shape == (2, 128, 138, 4) and out.dtype == np.uint8

    def test_sharpen_only_keeps_size(self):
        frame = FR.checkerboard_frame(64, 64)
        out = np.asarray(upscale(frame, render_scale=1.0, sharpness=0.5, radius=2.0))
        assert out.shape == (64, 64, 4)

    def test_nis_scaler_path(self):
        frame = FR.zone_plate_frame(72, 80)
        out = np.asarray(upscale(frame, render_scale=0.8, use_nis=True, radius=2.0))
        assert out.shape == (90, 100, 4)

    def test_nis_sharpen_path(self):
        frame = FR.zone_plate_frame(64, 64)
        out = np.asarray(upscale(frame, render_scale=1.0, use_nis=True, radius=2.0))
        assert out.shape == (64, 64, 4)

    def test_matches_oracle_composition_fsr(self):
        """Full pipeline vs oracle EASU -> quantize -> RCAS, radius=2."""
        from openvr_fsr_tpu.oracle.easu import easu_oracle
        from openvr_fsr_tpu.oracle.rcas import rcas_oracle

        frame = FR.noise_frame(48, 56, seed=9)
        rs, sharp = 0.75, 0.9
        out_w, out_h = Config(render_scale=rs).output_size(56, 48)
        img = frame[..., :3].astype(np.float32) / np.float32(255.0)
        up = easu_oracle(img, out_w, out_h)
        upq = FR.quantize_unorm(up)
        sh = rcas_oracle(upq, C.fsr_rcas_con(C.rcas_stops_from_slider(sharp)))
        want = np.rint(np.clip(sh, 0, 1) * 255).astype(np.uint8)

        got = np.asarray(upscale(frame, render_scale=rs, sharpness=sharp, radius=2.0))
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        import jax
        if jax.default_backend() == "cpu":
            assert diff.max() == 0  # bitwise parity on CPU XLA
        else:
            # TPU f32 division differs from IEEE by ~1 ulp; when an EASU value
            # sits exactly on an 8-bit quantization boundary the intermediate
            # texture flips 1 LSB and RCAS amplifies it. Bound: >=99.99% of
            # pixels within 1 LSB, worst case bounded by the RCAS gain.
            assert (diff <= 1).mean() >= 0.9999
            assert diff.max() <= 16

    def test_debug_tint_outside_radius(self):
        frame = np.full((64, 64, 4), 200, np.uint8)
        out_d = np.asarray(upscale(frame, render_scale=1.0, sharpness=0.0,
                                   radius=0.0, debug=True))
        # everything outside radius 0: G,B dimmed by 0.3
        assert abs(int(out_d[32, 32, 1]) - round(200 * 0.7)) <= 1
        assert out_d[32, 32, 0] == 200

    def test_eye_masks_differ_for_offset_centers(self):
        cfg = Config(enabled=True, render_scale=1.0, sharpness=0.9, radius=0.4)
        pipe = Pipeline(cfg, eye_centers=((0.3, 0.5), (0.7, 0.5)))
        frames = np.stack([FR.gradient_frame(96, 128)] * 2)
        out = np.asarray(pipe.process(frames, eyes=(0, 1)))
        assert not np.array_equal(out[0], out[1])  # different fovea positions

    def test_pipeline_cache_and_reset(self):
        cfg = Config(enabled=True, render_scale=0.75, radius=2.0)
        pipe = Pipeline(cfg)
        f = FR.gradient_frame(32, 32)
        pipe.process(f)
        assert len(pipe._cache) == 1
        pipe.adjust_sharpness(+0.05)
        assert len(pipe._cache) == 0  # hotkeys rebuild resources (Reset analog)

    def test_disabled_passthrough(self):
        f = FR.gradient_frame(16, 16)
        out = Pipeline(Config(enabled=False)).process(f)
        assert out is f


class TestCapture:
    def test_dds_roundtrip(self, tmp_path):
        from openvr_fsr_tpu.api.capture import write_dds_rgba8, read_dds_rgba8

        img = FR.noise_frame(20, 24)
        p = tmp_path / "x.dds"
        write_dds_rgba8(p, img)
        assert np.array_equal(read_dds_rgba8(p), img)

    def test_save_frame_filename_scheme(self, tmp_path):
        from openvr_fsr_tpu.api.capture import save_frame

        paths = save_frame(FR.noise_frame(8, 8), tmp_path, use_nis=False,
                           sharpness=0.9, radius=0.5)
        names = [p.name for p in paths]
        assert any(n.startswith("capture_") and n.endswith("_fsr_s90_r50.dds")
                   for n in names)

    def test_arm_capture_saves_next_left_eye(self, tmp_path):
        # PostProcessor.cpp:634-637 — the armed flag saves on the next
        # Eye_Left frame only, then clears
        from openvr_fsr_tpu.api.capture import read_dds_rgba8

        pipe = Pipeline(Config(enabled=True, render_scale=0.75,
                               sharpness=0.9, radius=2.0))
        fr = FR.noise_frame(40, 36)
        pipe.arm_capture(tmp_path)
        # a right-eye-only batch must NOT trigger the capture
        pipe.process(fr[None], eyes=(1,))
        assert pipe._capture_armed is not None and not list(
            tmp_path.iterdir())
        out = np.asarray(pipe.process(np.stack([fr, fr]), eyes=(1, 0)))
        assert pipe._capture_armed is None
        (path,) = pipe.last_capture_paths
        assert path.name.endswith("_fsr_s90_r200.dds")
        assert np.array_equal(read_dds_rgba8(path), out[1])
        # one-shot: the next left-eye frame does not capture again
        pipe.process(fr[None], eyes=(0,))
        assert len(list(tmp_path.iterdir())) == 1

    def test_dds_r10_roundtrip_both_codecs(self, tmp_path):
        # R10G10B10A2 capture (PostProcessor.cpp:63-74's second output
        # format): full 10-bit precision survives the DDS round trip on
        # the native and the pure-Python codec alike
        from openvr_fsr_tpu.api.capture import write_dds_r10, read_dds
        from openvr_fsr_tpu import native_rt

        rng = np.random.default_rng(5)
        img = np.empty((12, 16, 4), np.uint16)
        img[..., :3] = rng.integers(0, 1024, (12, 16, 3))
        img[..., 3] = rng.integers(0, 4, (12, 16))
        saved = (native_rt._TRIED, native_rt._LIB)
        try:
            for force_py in (False, True):
                if force_py:
                    native_rt._TRIED, native_rt._LIB = True, None
                p = tmp_path / f"x10_{force_py}.dds"
                write_dds_r10(p, img)
                out, bits = read_dds(p)
                assert bits == 10 and out.dtype == np.uint16
                assert np.array_equal(out, img)
        finally:
            native_rt._TRIED, native_rt._LIB = saved

    def test_arm_capture_10bit(self, tmp_path):
        # a color_bits=10 pipeline's uint16 output must capture losslessly
        # (not wrap through a uint8 cast)
        from openvr_fsr_tpu.api.capture import read_dds

        pipe = Pipeline(Config(enabled=True, render_scale=0.75,
                               sharpness=0.9, radius=2.0), color_bits=10)
        rng = np.random.default_rng(11)
        fr = np.empty((36, 40, 4), np.uint16)
        fr[..., :3] = rng.integers(0, 1024, (36, 40, 3))
        fr[..., 3] = 3
        pipe.arm_capture(tmp_path)
        out = np.asarray(pipe.process(fr[None], eyes=(0,)))
        (path,) = pipe.last_capture_paths
        got, bits = read_dds(path)
        assert bits == 10
        assert got.max() > 255     # genuine 10-bit payload survived
        assert np.array_equal(got, out[0])


class TestTextureBounds:
    """VRTextureBounds_t semantics (headers/openvr.h:609-613,
    PostProcessor.cpp:128-131, 146)."""

    def test_detection_formula(self):
        # |uMax-uMin| > 0.5 => texture holds a single eye
        assert Pipeline.bounds_contain_one_eye((0, 0, 1, 1))
        assert Pipeline.bounds_contain_one_eye((1, 0, 0, 1))  # abs()
        assert not Pipeline.bounds_contain_one_eye((0, 0, 0.5, 1))
        assert not Pipeline.bounds_contain_one_eye((0.5, 0, 1.0, 1))

    def test_half_width_bounds_switch_to_double_wide(self):
        cfg = Config(enabled=True, render_scale=0.75, radius=0.5)
        f = FR.gradient_frame(32, 64)
        # left-half bounds => double-wide packing, identical to a pipeline
        # constructed with single_eye_per_frame=False
        pipe = Pipeline(cfg, single_eye_per_frame=True)
        got = np.asarray(pipe.process(f, bounds=(0.0, 0.0, 0.5, 1.0)))
        assert pipe.single_eye_per_frame is False
        want = np.asarray(
            Pipeline(cfg, single_eye_per_frame=False).process(f))
        assert np.array_equal(got, want)

    def test_full_bounds_keep_single_eye(self):
        cfg = Config(enabled=True, render_scale=0.75, radius=0.5)
        pipe = Pipeline(cfg, single_eye_per_frame=True)
        pipe.process(FR.gradient_frame(24, 24), bounds=(0, 0, 1, 1))
        assert pipe.single_eye_per_frame is True

    def test_layout_switch_resets_resources(self):
        cfg = Config(enabled=True, render_scale=0.75)
        pipe = Pipeline(cfg, single_eye_per_frame=True)
        f = FR.gradient_frame(24, 24)
        pipe.process(f)
        assert len(pipe._cache) == 1
        pipe.process(f, bounds=(0, 0, 0.5, 1))   # switch => Reset analog
        assert pipe.single_eye_per_frame is False
        assert len(pipe._cache) == 1  # rebuilt under the new layout

    def test_crop_matches_uncropped_region(self):
        cfg = Config(enabled=True, render_scale=0.75, radius=0.5)
        f = FR.noise_frame(36, 32, seed=5)
        full = np.asarray(Pipeline(cfg).process(f))
        oh, ow = full.shape[0], full.shape[1]
        b = (0.25, 0.125, 1.0, 0.875)
        crop = np.asarray(Pipeline(cfg).process(f, bounds=b, crop=True))
        x0, x1 = round(0.25 * ow), round(1.0 * ow)
        y0, y1 = round(0.125 * oh), round(0.875 * oh)
        assert np.array_equal(crop, full[y0:y1, x0:x1])

    def test_crop_flipped_v(self):
        # OpenGL-convention games submit vMin > vMax; same rectangle
        cfg = Config(enabled=True, render_scale=1.0)
        f = FR.gradient_frame(20, 20)
        a = np.asarray(Pipeline(cfg).process(f, bounds=(0, 0.9, 1, 0.1),
                                             crop=True))
        b = np.asarray(Pipeline(cfg).process(f, bounds=(0, 0.1, 1, 0.9),
                                             crop=True))
        assert np.array_equal(a, b)

    def test_upscale_passthrough(self):
        from openvr_fsr_tpu.api.pipeline import upscale

        f = FR.gradient_frame(24, 24)
        out = upscale(f, render_scale=0.75, bounds=(0, 0, 1, 1), crop=True)
        assert out.shape[:2] == (32, 32)


class TestPackedU32Api:
    """Zero-copy packed-u32 API mode: (B, H, W) uint32 frames (bitcast
    RGBA8) in, packed uint32 out — bit-identical to the uint8 NHWC path on
    both backends."""

    def _frames(self):
        f = np.stack([FR.zone_plate_frame(96, 130),
                      FR.noise_frame(96, 130, seed=3)])
        return f, f.view(np.uint32)[..., 0]

    @pytest.mark.parametrize("backend", ["xla", None])
    def test_matches_u8_path(self, backend):
        import jax
        if backend is None:
            backend = ("pallas" if jax.default_backend() == "tpu"
                       else "pallas-interpret")
        u8, u32 = self._frames()
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        pipe = Pipeline(cfg, backend=backend)
        a = np.asarray(pipe.process(u8, eyes=(0, 1)))
        b = np.asarray(pipe.process(u32, eyes=(0, 1)))
        assert b.dtype == np.uint32 and b.ndim == 3
        assert np.array_equal(np.ascontiguousarray(a).view(np.uint32)[..., 0], b)

    def test_single_packed_frame_squeezes(self):
        u8, u32 = self._frames()
        cfg = Config(enabled=True, render_scale=1.0, sharpness=0.9, radius=2.0)
        pipe = Pipeline(cfg, backend="xla")
        out = np.asarray(pipe.process(u32[0]))
        assert out.dtype == np.uint32 and out.ndim == 2

    def test_packed_10bit_rejected(self):
        _, u32 = self._frames()
        cfg = Config(enabled=True, render_scale=1.0)
        with pytest.raises(ValueError):
            Pipeline(cfg, backend="xla", color_bits=10).process(u32)

    def test_packed_crop(self):
        """crop_output on packed-u32 output slices (H, W), not (B, H)."""
        u8, u32 = self._frames()
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        pipe = Pipeline(cfg, backend="xla")
        bounds = (0.0, 0.0, 1.0, 0.5)
        a = np.asarray(pipe.process(u8, eyes=(0, 1), bounds=bounds,
                                    crop=True))
        b = np.asarray(pipe.process(u32, eyes=(0, 1), bounds=bounds,
                                    crop=True))
        assert b.shape == a.shape[:3] and b.dtype == np.uint32
        assert np.array_equal(np.ascontiguousarray(a).view(np.uint32)[..., 0], b)

    def test_rgb_frames_on_kernel_path(self):
        """3-channel RGB frames work on the Pallas path (alpha padded 255),
        matching XLA."""
        import jax
        backend = ("pallas" if jax.default_backend() == "tpu"
                   else "pallas-interpret")
        rgb = FR.zone_plate_frame(64, 72)[..., :3].copy()
        cfg = Config(enabled=True, render_scale=1.0, sharpness=0.9,
                     radius=0.4)
        a = np.asarray(Pipeline(cfg, backend="xla").process(rgb))
        b = np.asarray(Pipeline(cfg, backend=backend).process(rgb))
        assert a.shape == b.shape == (64, 72, 4)
        d = np.abs(a.astype(int) - b.astype(int))
        assert (d == 0).mean() >= 0.99 and d.max() <= 16

    def test_pad_to_published_on_every_backend(self):
        # bench/ring tools call fn.pad_to unconditionally; every _build
        # result must publish the serving pre-pad pitch (XLA fallback and
        # 10-bit planar included)
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        for kw in (dict(backend="xla"), dict(backend="pallas-interpret"),
                   dict(backend="xla", color_bits=10)):
            fn = Pipeline(cfg, **kw)._build(2, 20, 24, (0, 1))
            assert fn.pad_to == (24, 128), (kw, fn.pad_to)

    @pytest.mark.parametrize("mode_kw", [
        dict(render_scale=0.75),                       # FSR fused
        dict(render_scale=1.0),                        # RCAS sharpen-only
        dict(render_scale=0.75, use_nis=True),         # NVScaler
        dict(render_scale=1.0, use_nis=True),          # NVSharpen
        dict(render_scale=0.75, use_cas=True),         # CAS upscale
        dict(render_scale=1.0, use_cas=True),          # CAS sharpen
    ], ids=["fsr", "rcas", "nvscaler", "nvsharpen", "cas_up", "cas_sh"])
    def test_prepadded_ring_frames_match(self, mode_kw):
        """The device-ring serving format: packed-u32 frames pre-padded to
        fn.pad_to (the kernel's (sublane, lane) DMA pitch) must produce the
        same output as unpadded frames — tools/stream_bench.py and
        tools/bench_paths.py feed this format directly. Every pipeline
        mode must accept it: round 3 found NVSharpen's wrapper re-padding
        pre-padded frames (a Mosaic DMA shape mismatch on real TPU that
        interpret mode never sees), and its clamped column shifts require
        the pad columns to be edge-replicated, which a zero-padding ring
        caller does not provide."""
        import jax
        backend = ("pallas" if jax.default_backend() == "tpu"
                   else "pallas-interpret")
        # 100 is NOT 8-row-aligned (and 130 not lane-aligned) so BOTH pad
        # axes are exercised — 96-row frames would leave the row-pad path
        # (HP != H) untested.
        u8 = np.stack([FR.zone_plate_frame(100, 130),
                       FR.noise_frame(100, 130, seed=3)])
        u32 = u8.view(np.uint32)[..., 0]
        h, w = u8.shape[1:3]
        cfg = Config(enabled=True, sharpness=0.9, radius=0.5, **mode_kw)
        pipe = Pipeline(cfg, backend=backend)
        fn = pipe._build(2, h, w, (0, 1))
        hp, wp = fn.pad_to   # the kernel's published (sublane, lane) pitch
        assert hp != h and wp != w  # both pad axes must be exercised
        pre = np.pad(u32, ((0, 0), (0, hp - h), (0, wp - w)))
        a = np.asarray(fn(u32))
        b = np.asarray(fn(pre))
        assert np.array_equal(a, b)


class TestPresets:
    def test_amd_presets(self):
        """AMD quality presets (src/openvr_mod.cfg:17-21)."""
        from openvr_fsr_tpu.core.config import AMD_PRESETS

        assert AMD_PRESETS == {"ultra_quality": 0.77, "quality": 0.67,
                               "balanced": 0.59, "performance": 0.50}
        c = Config.from_preset("Quality", sharpness=0.8)
        assert c.enabled and c.render_scale == 0.67 and c.sharpness == 0.8
        # kw overrides any field, including render_scale itself
        assert Config.from_preset("quality", render_scale=0.7).render_scale \
            == 0.7


class TestPackedCapture:
    def test_save_packed_frame(self, tmp_path):
        from openvr_fsr_tpu.api.capture import save_frame, read_dds_rgba8

        u8 = FR.noise_frame(16, 20)
        u32 = u8.view(np.uint32)[..., 0]
        paths = save_frame(u32, directory=tmp_path)
        dds = [p for p in paths if str(p).endswith("dds")][0]
        assert np.array_equal(read_dds_rgba8(dds), u8)
