"""NIS (NVScaler / NVSharpen): oracle sanity + JAX parity."""

import numpy as np
import pytest

from openvr_fsr_tpu.core import constants as C
from openvr_fsr_tpu.oracle.nis import nvscaler_oracle, nvsharpen_oracle, get_y


def exactness_tol():
    import jax
    return 0.0 if jax.default_backend() == "cpu" else 4e-6


class TestNisOracle:
    def test_flat_stays_flat_scaler(self):
        img = np.full((40, 40, 4), 0.5, np.float32)
        cfg = C.nvscaler_update_config(0.5, 40, 40, 40, 40, 52, 52, 52, 52)
        out = nvscaler_oracle(img, 52, 52, cfg)
        # filter-bank rows sum to 1 only to table precision (~1e-4)
        assert np.abs(out[..., :3] - 0.5).max() < 5e-4
        assert np.abs(out[..., 3] - 0.5).max() < 1e-6  # alpha passthrough

    def test_flat_stays_flat_sharpen(self):
        img = np.full((32, 32, 4), 0.25, np.float32)
        cfg = C.nvsharpen_update_config(0.9, 32, 32, 32, 32)
        out = nvsharpen_oracle(img, cfg)
        assert np.abs(out[..., :3] - 0.25).max() < 1e-6

    def test_sharpen_acts_on_soft_edges(self):
        # A perfect 0/1 step gets zero USM (the LTI anti-ringing term kills
        # it); a soft ramp edge must be sharpened.
        img = np.zeros((24, 24, 4), np.float32)
        for i, v in enumerate([0.1, 0.3, 0.5, 0.7, 0.9]):
            img[:, 10 + i, :3] = v
        img[:, 15:, :3] = 1.0
        img[..., 3] = 1.0
        cfg = C.nvsharpen_update_config(1.0, 24, 24, 24, 24)
        out = nvsharpen_oracle(img, cfg)
        assert np.abs(out[..., :3] - img[..., :3]).max() > 0.01


class TestNisJaxParity:
    @pytest.mark.parametrize("scale", [0.75, 0.77, 0.5])
    def test_scaler_matches_oracle(self, rng, scale):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.nis import nvscaler_jax

        h_in, w_in = 48, 56
        out_w, out_h = int(w_in / scale), int(h_in / scale)
        img = (rng.integers(0, 256, (h_in, w_in, 4)) / 255.0).astype(np.float32)
        cfg = C.nvscaler_update_config(0.66, w_in, h_in, w_in, h_in,
                                       out_w, out_h, out_w, out_h)
        want = nvscaler_oracle(img, out_w, out_h, cfg)
        got = np.asarray(nvscaler_jax(jnp.asarray(img.transpose(2, 0, 1)),
                                      out_w, out_h, cfg)).transpose(1, 2, 0)
        assert np.abs(got - want).max() <= exactness_tol()

    @pytest.mark.parametrize("sharpness", [0.25, 0.9])
    def test_sharpen_matches_oracle(self, rng, sharpness):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.nis import nvsharpen_jax

        img = (rng.integers(0, 256, (44, 52, 4)) / 255.0).astype(np.float32)
        cfg = C.nvsharpen_update_config(sharpness, 52, 44, 52, 44)
        want = nvsharpen_oracle(img, cfg)
        got = np.asarray(nvsharpen_jax(jnp.asarray(img.transpose(2, 0, 1)),
                                       cfg)).transpose(1, 2, 0)
        assert np.abs(got - want).max() <= exactness_tol()


class TestHdrModes:
    """NIS_HDR_MODE_LINEAR (1) / _PQ (2): getY variants and the linear mode's
    multiplicative luma correction (NIS_Scaler.h:112-118, 160-169, 744-761,
    949-963). Inputs exceed [0,1] in linear mode (scRGB-style)."""

    def _img(self, rng, h, w, hdr_mode):
        scale = 4.0 if hdr_mode == 1 else 1.0
        img = (rng.random((h, w, 4)) * scale).astype(np.float32)
        img[..., 3] = 1.0
        return img

    @pytest.mark.parametrize("hdr_mode", [1, 2])
    def test_scaler_hdr_matches_oracle(self, rng, hdr_mode):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.nis import nvscaler_jax

        h_in, w_in, out_w, out_h = 48, 56, 74, 64
        img = self._img(rng, h_in, w_in, hdr_mode)
        cfg = C.nvscaler_update_config(0.66, w_in, h_in, w_in, h_in,
                                       out_w, out_h, out_w, out_h,
                                       hdr_mode=hdr_mode)
        assert cfg.hdr_mode == hdr_mode
        want = nvscaler_oracle(img, out_w, out_h, cfg)
        got = np.asarray(nvscaler_jax(jnp.asarray(img.transpose(2, 0, 1)),
                                      out_w, out_h, cfg)).transpose(1, 2, 0)
        assert np.abs(got - want).max() <= exactness_tol() * 4

    @pytest.mark.parametrize("hdr_mode", [1, 2])
    def test_sharpen_hdr_matches_oracle(self, rng, hdr_mode):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.nis import nvsharpen_jax

        img = self._img(rng, 44, 52, hdr_mode)
        cfg = C.nvsharpen_update_config(0.9, 52, 44, 52, 44,
                                        hdr_mode=hdr_mode)
        want = nvsharpen_oracle(img, cfg)
        got = np.asarray(nvsharpen_jax(jnp.asarray(img.transpose(2, 0, 1)),
                                       cfg)).transpose(1, 2, 0)
        assert np.abs(got - want).max() <= exactness_tol() * 4

    def test_hdr_differs_from_sdr(self, rng):
        """The modes are not no-ops: mode 1 output differs from mode 0."""
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops.nis import nvsharpen_jax

        img = self._img(rng, 32, 36, 1)
        c0 = C.nvsharpen_update_config(0.9, 36, 32, 36, 32)
        c1 = C.nvsharpen_update_config(0.9, 36, 32, 36, 32, hdr_mode=1)
        a = np.asarray(nvsharpen_jax(jnp.asarray(img.transpose(2, 0, 1)), c0))
        b = np.asarray(nvsharpen_jax(jnp.asarray(img.transpose(2, 0, 1)), c1))
        assert np.abs(a - b).max() > 1e-3
