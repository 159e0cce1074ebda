"""FFX CAS sharpen-only: oracle properties + XLA parity (oracle/cas.py,
ops/cas.py — the vestigial third kernel, old-release parity)."""

import numpy as np
import pytest

from openvr_fsr_tpu.oracle.cas import (cas_setup, cas_sharpen_oracle,
                                       cas_support_scaling,
                                       cas_upscale_oracle)
from openvr_fsr_tpu.ops.cas import (cas_sharpen_jax, cas_setup_sharp,
                                    cas_upscale_jax)
from openvr_fsr_tpu.utils import frames as FR


def exactness_tol():
    import jax
    return 0.0 if jax.default_backend() == "cpu" else 4e-6


class TestCasOracle:
    def test_setup_range(self):
        # sharp = -1/lerp(8,5,s): s=0 -> -0.125, s=1 -> -0.2 (ffx_cas.h:391)
        assert cas_setup(0.0) == np.float32(-0.125)
        assert cas_setup(1.0) == np.float32(-0.2)

    def test_flat_field_unchanged(self):
        img = np.full((16, 16, 3), 0.5, np.float32)
        out = cas_sharpen_oracle(img, 0.8)
        assert np.abs(out[2:-2, 2:-2] - 0.5).max() < 2e-3  # aprx rcp tolerance

    def test_sharpening_steepens_edges(self):
        # soft vertical step: sharpening must increase the edge gradient
        x = np.linspace(0, 1, 32, dtype=np.float32)
        ramp = np.clip((x - 0.4) * 4.0, 0, 1).astype(np.float32)
        img = np.broadcast_to(ramp[None, :, None], (32, 32, 3)).copy()
        out = cas_sharpen_oracle(img, 1.0)
        g_in = np.abs(np.diff(img[16, 4:-4, 1]))
        g_out = np.abs(np.diff(out[16, 4:-4, 1]))
        assert g_out.max() > g_in.max()

    def test_max_color_delta_clamps(self):
        img = (FR.noise_frame(24, 24)[..., :3].astype(np.float32) / 255)
        out = cas_sharpen_oracle(img, 1.0, max_color_delta=0.01)
        assert np.abs(out - img).max() <= 0.01 + 1e-6


class TestCasUpscale:
    def test_support_scaling_limit(self):
        # ffx_cas.h:368-372: <= 4x area supported
        assert cas_support_scaling(200, 200, 100, 100)
        assert not cas_support_scaling(201, 201, 100, 100)

    def test_identity_scale_differs_from_sharpen_only(self):
        # the scaling path is a different algorithm even at 1:1 (it blends 4
        # cross results with thin-edge weights); just assert it runs and
        # stays in range
        img = FR.noise_frame(20, 24, seed=3)[..., :3].astype(np.float32) / 255
        out = cas_upscale_oracle(img, 0.5, 24, 20)
        assert out.shape == (20, 24, 3)
        assert out.min() >= 0 and out.max() <= 1

    def test_flat_field_preserved(self):
        img = np.full((16, 16, 3), 0.25, np.float32)
        out = cas_upscale_oracle(img, 0.8, 30, 28)
        assert np.abs(out[2:-2, 2:-2] - 0.25).max() < 2e-3

    def test_upscale_tracks_bilinear_on_smooth_gradient(self):
        # On a smooth ramp the adaptive blend should stay close to the
        # underlying signal after 1.5x upscaling (no ringing beyond taps)
        x = np.linspace(0.1, 0.9, 32, dtype=np.float32)
        img = np.broadcast_to(x[None, :, None], (32, 32, 3)).astype(np.float32)
        out = cas_upscale_oracle(img, 0.3, 48, 48)
        x_up = np.linspace(0.1, 0.9, 48, dtype=np.float32)
        assert np.abs(out[24, 6:-6, 1] - x_up[6:-6]).max() < 0.05

    def test_jax_matches_oracle(self):
        img = FR.noise_frame(36, 44, seed=11)[..., :3].astype(np.float32) / \
            np.float32(255)
        want = cas_upscale_oracle(img, 0.6, 64, 52)
        got = np.asarray(cas_upscale_jax(img.transpose(2, 0, 1), 0.6, 64, 52))
        assert np.abs(got.transpose(1, 2, 0) - want).max() <= exactness_tol()

    def test_jax_matches_oracle_2x(self):
        img = FR.zone_plate_frame(30, 30)[..., :3].astype(np.float32) / \
            np.float32(255)
        want = cas_upscale_oracle(img, 1.0, 60, 60)
        got = np.asarray(cas_upscale_jax(img.transpose(2, 0, 1), 1.0, 60, 60))
        assert np.abs(got.transpose(1, 2, 0) - want).max() <= exactness_tol()


class TestCasJax:
    def test_matches_oracle(self):
        img = FR.noise_frame(40, 56, seed=7)[..., :3].astype(np.float32) / np.float32(255)
        want = cas_sharpen_oracle(img, 0.7)
        got = np.asarray(cas_sharpen_jax(img.transpose(2, 0, 1), 0.7))
        assert np.abs(got.transpose(1, 2, 0) - want).max() <= exactness_tol()

    def test_setup_matches(self):
        for s in (0.0, 0.3, 0.7, 1.0):
            assert cas_setup_sharp(s) == cas_setup(s)


class TestModels:
    def test_get_model_families(self):
        from openvr_fsr_tpu.models import get_model, FsrModel, NisModel, CasModel

        assert isinstance(get_model("fsr"), FsrModel)
        assert isinstance(get_model("nis"), NisModel)
        assert isinstance(get_model("cas"), CasModel)

    def test_fsr_model_runs(self):
        from openvr_fsr_tpu.models import FsrModel

        m = FsrModel(render_scale=0.75, backend="xla")
        out = m(FR.gradient_frame(32, 32))
        assert out.shape == (42, 42, 4)

    def test_cas_model_roundtrip(self):
        from openvr_fsr_tpu.models import CasModel

        f = FR.noise_frame(24, 28, seed=2)
        out = np.asarray(CasModel(sharpness=0.7)(f))
        assert out.shape == f.shape and out.dtype == np.uint8
        # alpha passthrough
        assert np.array_equal(out[..., 3], f[..., 3])
        # parity vs oracle composition
        want = cas_sharpen_oracle(f[..., :3].astype(np.float32)
                                  * np.float32(1 / 255), 0.7)
        want8 = np.rint(np.clip(want, 0, 1) * 255).astype(np.uint8)
        import jax
        tol = 0 if jax.default_backend() == "cpu" else 1
        assert np.abs(out[..., :3].astype(int) - want8.astype(int)).max() <= tol


class TestCasPipeline:
    """CAS as a Pipeline mode: kernels/cas.py vs the XLA stage path, the
    mode truth table (one CasFilter pass: scaling iff rs != 1), and the
    foveation/debug-tint wrapper semantics shared with FSR/NIS."""

    def _backend(self):
        import jax
        return "pallas" if jax.default_backend() == "tpu" else "pallas-interpret"

    def _run_pair(self, h, w, radius, rs=0.75, debug=False, precision="full"):
        from openvr_fsr_tpu import Config, Pipeline

        cfg = Config(enabled=True, render_scale=rs, sharpness=0.8,
                     radius=radius, debug_mode=debug, use_cas=True)
        frames = np.stack([FR.zone_plate_frame(h, w),
                           FR.noise_frame(h, w, seed=3)])
        ref = Pipeline(cfg, backend="xla").process(frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=self._backend(),
                       precision=precision).process(frames, eyes=(0, 1))
        return np.asarray(got).astype(int), np.asarray(ref).astype(int)

    def _assert_close(self, got, ref, frac=0.99, worst=16):
        diff = np.abs(got - ref)
        assert (diff == 0).mean() >= frac, (
            f"only {(diff == 0).mean():.6f} bit-equal, max {diff.max()}")
        assert diff.max() <= worst

    @pytest.mark.parametrize("radius", [2.0, 0.5, 0.0])
    def test_upscale_kernel_matches_xla(self, radius):
        got, ref = self._run_pair(96, 130, radius)
        self._assert_close(got, ref)

    @pytest.mark.parametrize("radius", [2.0, 0.4])
    def test_sharpen_kernel_matches_xla(self, radius):
        got, ref = self._run_pair(96, 130, radius, rs=1.0)
        self._assert_close(got, ref)

    def test_debug_tint(self):
        got, ref = self._run_pair(64, 64, radius=0.3, debug=True)
        self._assert_close(got, ref)

    def test_sharpen_debug_tint(self):
        got, ref = self._run_pair(64, 64, radius=0.3, rs=1.0, debug=True)
        self._assert_close(got, ref)

    def test_upscale_matches_oracle_in_circle(self):
        """The in-circle region of the pipeline output IS quantized
        cas_upscale_oracle (radius 2 = whole frame)."""
        from openvr_fsr_tpu import Config, Pipeline

        h, w = 48, 56
        frame = FR.zone_plate_frame(h, w)
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.8,
                     radius=2.0, use_cas=True)
        pipe = Pipeline(cfg, backend="xla")
        out_w, out_h = cfg.output_size(w, h)
        got = np.asarray(pipe.process(frame))
        want_rgb = cas_upscale_oracle(frame[..., :3].astype(np.float32)
                                      / np.float32(255.0),
                                      0.8, out_w, out_h)
        want = np.rint(FR.quantize_unorm(want_rgb)
                       * np.float32(255.0)).astype(np.uint8)
        # compiled-XLA FMA contraction can flip isolated rounding boundaries
        # vs the eager NumPy oracle (same tier as the FSR golden tests)
        d = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert (d == 0).mean() >= 0.999 and d.max() <= 1
        assert (got[..., 3] == 255).all()

    def test_half_precision_bounded(self):
        from openvr_fsr_tpu import Config, Pipeline

        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.8,
                     radius=0.5, use_cas=True)
        frames = np.stack([FR.zone_plate_frame(96, 130),
                           FR.noise_frame(96, 130, seed=3)])
        ref = Pipeline(cfg, backend="xla").process(frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=self._backend(),
                       precision="half").process(frames, eyes=(0, 1))
        d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
        assert (d <= 2).mean() >= 0.95 and d.max() <= 32

    @pytest.mark.parametrize("rs", [0.75, 1.0])
    def test_10bit(self, rs):
        from openvr_fsr_tpu import Config, Pipeline

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 1024, (2, 64, 72, 4), dtype=np.uint16)
        frames[..., 3] = 3
        cfg = Config(enabled=True, render_scale=rs, sharpness=0.8,
                     radius=0.5, use_cas=True)
        ref = Pipeline(cfg, backend="xla", color_bits=10).process(
            frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=self._backend(), color_bits=10).process(
            frames, eyes=(0, 1))
        self._assert_close(np.asarray(got).astype(int),
                           np.asarray(ref).astype(int))
        # 2-bit alpha decodes a/3: opaque input stays opaque everywhere
        assert (np.asarray(got)[..., 3] == 3).all()

    def test_nis_cas_conflict_raises(self):
        from openvr_fsr_tpu import Config, Pipeline

        cfg = Config(enabled=True, render_scale=0.75, use_nis=True,
                     use_cas=True)
        with pytest.raises(ValueError):
            Pipeline(cfg, backend="xla").process(FR.zone_plate_frame(32, 32))

    def test_cfg_key_parses(self):
        from openvr_fsr_tpu.core.config import load_config

        cfg = load_config(text='{"fsr": {"enabled": true, "useCAS": true}}')
        assert cfg.use_cas and cfg.enabled
        # absent key defaults off (reference cfg files parse unchanged)
        cfg = load_config(text='{"fsr": {"enabled": true}}')
        assert not cfg.use_cas

    def test_max_color_delta_through_pipeline(self):
        """CasSetup maxColorDelta (ffx_cas.h:379) clamps the sharpen-only
        path — kernel matches XLA and the clamp actually bites."""
        from openvr_fsr_tpu import Config, Pipeline

        frames = FR.noise_frame(64, 72, seed=4)[None]
        cfg = Config(enabled=True, render_scale=1.0, sharpness=1.0,
                     radius=2.0, use_cas=True)
        a = np.asarray(Pipeline(cfg, backend="xla",
                                cas_max_color_delta=0.01).process(frames))
        b = np.asarray(Pipeline(cfg, backend=self._backend(),
                                cas_max_color_delta=0.01).process(frames))
        self._assert_close(b.astype(int), a.astype(int))
        full = np.asarray(Pipeline(cfg, backend="xla").process(frames))
        assert not np.array_equal(a, full)   # the clamp changed the output

    def test_derived_rows_matches_fallback(self):
        """The derived-rows prologue (one extended zero-OOB gather + static
        slices/selects) must reproduce the direct 4-block row gather,
        including the Load() zero rows at the frame top/bottom edge bands.

        Tolerance 1 LSB, not bitwise: the two programs compile separately
        and XLA:CPU may FMA-contract downstream lerps differently; the TPU
        PARITY artifacts assert the oracle match bitwise."""
        from openvr_fsr_tpu.core import constants as C
        from openvr_fsr_tpu.kernels.cas import build_cas_upscale

        h, w, oh, ow = 53, 66, 72, 88    # several bands with band_rows=32
        fc = C.foveation_constants(ow, oh, 2.0, (0.5, 0.5), (0.5, 0.5),
                                   False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]], np.int64)
        rng = np.random.default_rng(7)
        img = rng.integers(0, 2**32, (1, h, w), dtype=np.uint32)
        outs = []
        for nd in (False, True):
            fn = build_cas_upscale(1, h, w, ow, oh, sharpness=0.8,
                                   centres=centres, band_rows=32,
                                   interpret=True, no_derive=nd)
            # pin that the A/B is real: the derived structure must actually
            # hold for this geometry (else both builds are the fallback and
            # the comparison is vacuous)
            assert fn.derived_rows == (not nd)
            outs.append(np.asarray(fn(img)).view(np.uint8))
        diff = np.abs(outs[0].astype(np.int16) - outs[1].astype(np.int16))
        assert diff.max() <= 1, diff.max()
