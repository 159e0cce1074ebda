"""EASU + RCAS: oracle sanity properties and JAX-vs-oracle parity."""

import numpy as np
import pytest

from openvr_fsr_tpu.core import constants as C
from openvr_fsr_tpu.oracle.easu import easu_oracle
from openvr_fsr_tpu.oracle.rcas import rcas_oracle
from openvr_fsr_tpu.oracle.bilinear import bilinear_fallback_fsr
from openvr_fsr_tpu.utils import frames as FR

F32 = np.float32


def exactness_tol():
    """On the CPU backend XLA elementwise f32 is IEEE — require bitwise
    equality; on TPU allow 1-ulp-scale slack (division lowering)."""
    import jax
    return 0.0 if jax.default_backend() == "cpu" else 4e-6


def small_frames(rng):
    return {
        "gradient": FR.gradient_frame(96, 104),
        "checker": FR.checkerboard_frame(96, 104, cell=3),
        "zone": FR.zone_plate_frame(96, 104),
        "noise": FR.noise_frame(96, 104, seed=3),
    }


class TestEasuOracle:
    def test_flat_image_stays_flat(self):
        img = np.full((64, 64, 3), 0.25, np.float32)
        out = easu_oracle(img, 96, 96)
        assert np.allclose(out, 0.25, atol=1e-6)

    def test_output_within_dering_bounds(self, rng):
        img = (rng.random((48, 48, 3)) ** 1.0).astype(np.float32)
        out = easu_oracle(img, 72, 72)
        assert out.min() >= img.min() - 1e-6
        assert out.max() <= img.max() + 1e-6

    def test_identity_scale_on_smooth_ramp(self):
        # EASU filters even at 1x; the dering clamp bounds the deviation to the
        # nearest-2x2 range — on a linear ramp that's one gradient step.
        ramp = np.linspace(0, 1, 32, dtype=np.float32)
        img = np.repeat(ramp[None, :, None], 32, axis=0).repeat(3, axis=2)
        out = easu_oracle(img, 32, 32)
        assert np.abs(out - img).max() <= 1.0 / 31 + 1e-6

    def test_supersample_scale(self, rng):
        img = rng.random((32, 32, 3)).astype(np.float32)
        out = easu_oracle(img, 42, 42)  # renderScale 1.3 path (out = in*1.3)
        assert out.shape == (42, 42, 3)
        assert np.isfinite(out).all()


class TestEasuJaxParity:
    @pytest.mark.parametrize("scale", [0.75, 0.77, 0.5, 1.3])
    def test_matches_oracle(self, rng, scale):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.easu import easu_jax

        h_in, w_in = 60, 68
        if scale < 1:
            out_w, out_h = int(w_in / scale), int(h_in / scale)
        else:
            out_w, out_h = int(w_in * scale), int(h_in * scale)
        img = (rng.integers(0, 256, (h_in, w_in, 3)) / 255.0).astype(np.float32)
        con = C.fsr_easu_con(w_in, h_in, w_in, h_in, out_w, out_h)
        want = easu_oracle(img, out_w, out_h, con)
        rgb = jnp.asarray(img.transpose(2, 0, 1))
        got = np.asarray(easu_jax(rgb, out_w, out_h, con)).transpose(1, 2, 0)
        assert np.abs(got - want).max() <= exactness_tol()


class TestRcasOracle:
    def test_flat_gray_nearly_unchanged(self):
        img = np.full((32, 32, 3), 0.5, np.float32)
        out = rcas_oracle(img, C.fsr_rcas_con(0.2))
        assert np.abs(out[1:-1, 1:-1] - 0.5).max() < 2e-3  # APrxMedRcp tolerance

    def test_sharpening_increases_contrast(self):
        img = np.zeros((16, 16, 3), np.float32)
        img[:, 8:, :] = 1.0
        sharp = rcas_oracle(img, C.fsr_rcas_con(0.0))
        # at an ideal step, RCAS output must not reduce the step
        assert sharp[8, 7, 0] <= img[8, 7, 0] + 1e-6
        assert np.isfinite(sharp).all()

    def test_border_zero_pad_semantics(self):
        # Texture2D.Load OOB returns 0 -> the border ring sees zeros: RCAS of
        # the image equals the interior of RCAS on an explicitly zero-padded
        # image, and differs from clamp-padded semantics.
        rng = np.random.default_rng(5)
        img = (rng.integers(1, 255, (10, 12, 3)) / 255.0).astype(np.float32)
        out = rcas_oracle(img, C.fsr_rcas_con(0.0))
        zp = np.pad(img, ((1, 1), (1, 1), (0, 0)))
        out_zp = rcas_oracle(zp, C.fsr_rcas_con(0.0))[1:-1, 1:-1]
        assert np.array_equal(out, out_zp)
        cp = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        out_cp = rcas_oracle(cp, C.fsr_rcas_con(0.0))[1:-1, 1:-1]
        assert not np.array_equal(out, out_cp)
        assert np.isfinite(out).all()


class TestRcasJaxParity:
    @pytest.mark.parametrize("sharpness", [1.0, 0.9, 0.0])
    def test_matches_oracle(self, rng, sharpness):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.rcas import rcas_jax

        img = (rng.integers(0, 256, (40, 56, 3)) / 255.0).astype(np.float32)
        lin = C.fsr_rcas_con(C.rcas_stops_from_slider(sharpness))
        want = rcas_oracle(img, lin)
        got = np.asarray(rcas_jax(jnp.asarray(img.transpose(2, 0, 1)), lin))
        assert np.abs(got.transpose(1, 2, 0) - want).max() <= exactness_tol()

    def test_flat_region_nan_swallowed(self):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.rcas import rcas_jax

        img = np.zeros((3, 16, 16), np.float32)  # all-black: rcp(0) path
        out = np.asarray(rcas_jax(jnp.asarray(img), np.float32(1.0)))
        assert np.isfinite(out).all() and np.all(out == 0.0)
        white = np.ones((3, 16, 16), np.float32)
        out = np.asarray(rcas_jax(jnp.asarray(white), np.float32(1.0)))
        assert np.isfinite(out).all()


class TestBilinearParity:
    def test_fallback_matches_oracle(self, rng):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.bilinear import bilinear_fallback_fsr_jax

        img = (rng.integers(0, 256, (30, 34, 3)) / 255.0).astype(np.float32)
        want = bilinear_fallback_fsr(img, 44, 40)
        got = np.asarray(
            bilinear_fallback_fsr_jax(jnp.asarray(img.transpose(2, 0, 1)), 44, 40))
        assert np.abs(got.transpose(1, 2, 0) - want).max() <= exactness_tol()
