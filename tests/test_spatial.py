"""Spatial (row-strip) sharding — parallel/spatial.py + the strip builds of
kernels/fsr.build_fsr_fused(band_range=...). Runs on the virtual 8-device
CPU mesh (conftest)."""

import numpy as np
import pytest

import jax

# Full tier: strip-kernel interpret builds at several geometries (~1.5 min);
# the quick tier keeps one spatial smoke in tests/test_kernels_smoke.py and
# the batch-DP sharding coverage in test_sharding.py.
pytestmark = pytest.mark.slow

from openvr_fsr_tpu.core.config import Config
from openvr_fsr_tpu.core import constants as C
from openvr_fsr_tpu.kernels import _band as BD
from openvr_fsr_tpu.kernels.fsr import build_fsr_fused, fsr_band_layout
from openvr_fsr_tpu.parallel.spatial import SpatialFsrPipeline, split_bands
from openvr_fsr_tpu.utils import frames as FR


def test_split_bands():
    assert split_bands(8, 3) == [(0, 3), (3, 5), (5, 8)]
    assert split_bands(4, 8) == [(0, 1), (1, 2), (2, 3), (3, 4)]  # capped
    assert split_bands(5, 1) == [(0, 5)]
    for gy, n in ((20, 8), (7, 2), (3, 3)):
        rs = split_bands(gy, n)
        assert rs[0][0] == 0 and rs[-1][1] == gy
        assert all(a[1] == b[0] for a, b in zip(rs, rs[1:]))


class TestStripBuilds:
    """band_range strip kernels are bitwise slices of the full kernel."""

    def _setup(self, h, w, oh, ow, radius=0.5):
        fc = C.foveation_constants(ow, oh, radius, (0.5, 0.5), (0.5, 0.5),
                                   False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2,
            np.int64)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 2**32, (2, h, w), dtype=np.uint32)
        hp, wp = BD.input_padding(h, w)
        img_p = np.pad(img, ((0, 0), (0, hp - h), (0, wp - w)))
        return centres, img, img_p

    @pytest.mark.parametrize("radius", [0.5, 2.0])
    def test_strips_match_full(self, radius):
        h, w, oh, ow = 90, 70, 120, 93
        th, gy = fsr_band_layout(ow, oh, band_rows=32)
        assert gy >= 3
        centres, img, img_p = self._setup(h, w, oh, ow, radius)
        kw = dict(sharpness=0.9, centres=centres, band_rows=32,
                  interpret=True)
        want = np.asarray(build_fsr_fused(2, h, w, ow, oh, **kw)(img))
        outs = []
        for g0, g1 in split_bands(gy, 3):
            fn = build_fsr_fused(2, h, w, ow, oh, band_range=(g0, g1), **kw)
            strip = img_p[:, fn.in_row_base:fn.in_row_base + fn.in_rows]
            outs.append(np.asarray(fn(strip))[:, :fn.out_rows])
        assert np.array_equal(np.concatenate(outs, axis=1), want)

    def test_single_band_strips(self):
        # every band alone — exercises first/last-band edge structure
        h, w, oh, ow = 53, 66, 70, 88
        th, gy = fsr_band_layout(ow, oh, band_rows=32)
        centres, img, img_p = self._setup(h, w, oh, ow)
        kw = dict(sharpness=0.9, centres=centres, band_rows=32,
                  interpret=True)
        want = np.asarray(build_fsr_fused(2, h, w, ow, oh, **kw)(img))
        for g in range(gy):
            fn = build_fsr_fused(2, h, w, ow, oh, band_range=(g, g + 1), **kw)
            strip = img_p[:, fn.in_row_base:fn.in_row_base + fn.in_rows]
            got = np.asarray(fn(strip))[:, :fn.out_rows]
            assert np.array_equal(got, want[:, g * th:g * th + fn.out_rows])


class TestSpatialPipeline:
    def test_matches_single_device(self):
        # 8 virtual CPU devices (4 used: one per band). Tolerance 1 LSB on
        # <=0.1% of texels: the jitted strip programs and the full kernel
        # compile separately and XLA:CPU FMA-contracts them differently
        # (same caveat as the CAS derived-rows A/B); on TPU the compiled
        # kernels are bit-exact vs the oracle per PARITY_r03.json.
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=0.5)
        h, w = 90, 70
        frames = np.stack([np.ascontiguousarray(
            FR.zone_plate_frame(h, w)).view(np.uint32)[..., 0],
            np.ascontiguousarray(
            FR.noise_frame(h, w, seed=2)).view(np.uint32)[..., 0]])

        sp = SpatialFsrPipeline(cfg, band_rows=32, interpret=True)
        assert len(sp.devices) == 8
        got = sp.process(frames, eyes=(0, 1))

        fc_kw = dict(sharpness=0.9, band_rows=32, interpret=True)
        ow, oh = cfg.output_size(w, h)
        want = np.asarray(build_fsr_fused(
            2, h, w, ow, oh, centres=sp._centres_array(ow, oh, (0, 1)),
            **fc_kw)(frames))
        assert got.shape == want.shape
        d = np.abs(got.view(np.uint8).astype(np.int16)
                   - want.view(np.uint8).astype(np.int16))
        assert d.max() <= 1 and (d > 0).mean() < 1e-3

    def test_supersample_path(self):
        # rs > 1 runs the same fused builder (PostProcessor truth table:
        # upscale iff rs != 1); strips apply unchanged
        cfg = Config(enabled=True, render_scale=1.3, sharpness=0.9,
                     radius=2.0)
        h, w = 60, 45
        fr = np.ascontiguousarray(
            FR.zone_plate_frame(h, w)).view(np.uint32)[..., 0]
        sp = SpatialFsrPipeline(cfg, band_rows=32, interpret=True)
        got = sp.process(fr[None], eyes=(0,))
        ow, oh = cfg.output_size(w, h)
        want = np.asarray(build_fsr_fused(
            1, h, w, ow, oh, centres=sp._centres_array(ow, oh, (0,)),
            sharpness=0.9, band_rows=32, interpret=True)(fr[None]))
        d = np.abs(got.view(np.uint8).astype(np.int16)
                   - want.view(np.uint8).astype(np.int16))
        assert got.shape == (1, oh, ow)
        assert d.max() <= 1 and (d > 0).mean() < 1e-3

    def test_cas_strips_match_full(self):
        # the CAS scaling kernel shares the band_range machinery; strips
        # are bitwise slices of the full kernel (same-geometry check as
        # TestStripBuilds but through the pipeline + CAS builder)
        from openvr_fsr_tpu.kernels.cas import build_cas_upscale

        cfg = Config(enabled=True, use_cas=True, render_scale=0.75,
                     sharpness=0.8, radius=0.5)
        h, w = 90, 70
        fr = np.ascontiguousarray(
            FR.noise_frame(h, w, seed=5)).view(np.uint32)[..., 0]
        sp = SpatialFsrPipeline(cfg, band_rows=32, interpret=True)
        got = sp.process(fr[None], eyes=(0,))
        ow, oh = cfg.output_size(w, h)
        want = np.asarray(build_cas_upscale(
            1, h, w, ow, oh, centres=sp._centres_array(ow, oh, (0,)),
            sharpness=0.8, band_rows=32, interpret=True)(fr[None]))
        d = np.abs(got.view(np.uint8).astype(np.int16)
                   - want.view(np.uint8).astype(np.int16))
        assert got.shape == (1, oh, ow)
        assert d.max() <= 1 and (d > 0).mean() < 1e-3

    def test_uint8_frames_accepted(self):
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9,
                     radius=2.0)
        fr = FR.gradient_frame(45, 60)
        out = SpatialFsrPipeline(cfg, band_rows=32, interpret=True).process(
            fr[None], eyes=(0,))
        ow, oh = cfg.output_size(60, 45)
        assert out.shape == (1, oh, ow) and out.dtype == np.uint32
