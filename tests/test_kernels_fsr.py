"""Fused Pallas FSR kernel vs the XLA pipeline / NumPy oracle.

On CPU the kernel runs in interpret mode: compiled-XLA FMA contraction makes
the two paths differ at the ~1-ulp level pre-quantize, so parity is asserted
at the quantized level with the same tier used for TPU XLA (>=99.9% of texels
bit-equal, the rest within the RCAS-amplification bound). On real TPU
(RUN_TPU=1) the compiled kernel is held to the same bound vs the oracle.
"""

import numpy as np
import pytest

from openvr_fsr_tpu import Config, Pipeline
from openvr_fsr_tpu.core import constants as C
from openvr_fsr_tpu.core.projection import default_centers
from openvr_fsr_tpu.utils import frames as FR

# Full tier: interpret-mode kernel parity at real (if small) shapes is the
# expensive part of the pyramid (~16 of the suite's ~23 CPU minutes). CI
# runs these on a schedule; the per-push quick tier keeps kernel smoke
# coverage via tests/test_kernels_smoke.py.
pytestmark = pytest.mark.slow


def _backend():
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "pallas-interpret"


def _run_pair(h, w, radius, rs=0.75, sharpness=0.9, debug=False, frames=None,
              use_nis=False):
    cfg = Config(enabled=True, render_scale=rs, sharpness=sharpness,
                 radius=radius, debug_mode=debug, use_nis=use_nis)
    if frames is None:
        frames = np.stack([FR.zone_plate_frame(h, w),
                           FR.noise_frame(h, w, seed=3)])
    ref = Pipeline(cfg, backend="xla").process(frames, eyes=(0, 1))
    got = Pipeline(cfg, backend=_backend()).process(frames, eyes=(0, 1))
    return np.asarray(got).astype(int), np.asarray(ref).astype(int)


def _assert_close(got, ref, frac=0.99, worst=16):
    # Interpret mode evaluates each jnp op eagerly while the XLA reference is
    # compiled with FMA contraction, so ~1-ulp pre-quantize differences flip
    # boundary texels (<1% observed). On real TPU the compiled kernel is
    # bit-exact vs the oracle (see /verify recipe).
    diff = np.abs(got - ref)
    assert (diff == 0).mean() >= frac, (
        f"only {(diff == 0).mean():.6f} bit-equal, max {diff.max()}")
    assert diff.max() <= worst


class TestFusedFsrKernel:
    @pytest.mark.parametrize("radius", [2.0, 0.5, 0.0])
    def test_matches_xla_pipeline(self, radius):
        got, ref = _run_pair(96, 130, radius)
        _assert_close(got, ref)

    def test_supersample_scale(self):
        got, ref = _run_pair(64, 72, radius=2.0, rs=1.3)
        _assert_close(got, ref)

    def test_debug_tint(self):
        got, ref = _run_pair(64, 64, radius=0.3, debug=True)
        _assert_close(got, ref)

    def test_uniform_field_bitexact(self):
        """A flat field has no FMA-sensitive gradients: require exactness."""
        frames = np.full((2, 64, 80, 4), 137, np.uint8)
        got, ref = _run_pair(64, 80, radius=0.5, frames=frames)
        assert np.array_equal(got, ref)

    def test_tile_not_dividing_output(self):
        # output 171x128 with tile 62 -> partial edge tiles on both axes
        got, ref = _run_pair(96, 128, radius=0.5)
        _assert_close(got, ref)

    @pytest.mark.parametrize("radius", [2.0, 0.4, 0.0])
    def test_sharpen_only_matches_xla(self, radius):
        """renderScale=1 -> kernels/rcas.py (PostProcessor.cpp:530 truth table)."""
        frames = np.stack([FR.zone_plate_frame(96, 130),
                           FR.noise_frame(96, 130, seed=3)])
        frames[0, :, :, 3] = 200  # non-trivial alpha passthrough outside radius
        got, ref = _run_pair(96, 130, radius, rs=1.0, frames=frames)
        _assert_close(got, ref)

    def test_sharpen_only_debug_tint(self):
        got, ref = _run_pair(64, 64, radius=0.3, rs=1.0, debug=True)
        _assert_close(got, ref)

    @pytest.mark.parametrize("radius", [2.0, 0.4])
    def test_nvsharpen_matches_xla(self, radius):
        """NIS + renderScale=1 -> kernels/nis.py NVSharpen."""
        frames = np.stack([FR.zone_plate_frame(96, 130),
                           FR.noise_frame(96, 130, seed=3)])
        frames[1, :, :, 3] = 190
        got, ref = _run_pair(96, 130, radius, rs=1.0, frames=frames,
                             use_nis=True)
        _assert_close(got, ref)

    @pytest.mark.parametrize("radius", [2.0, 0.5, 0.0])
    def test_nvscaler_matches_xla(self, radius):
        """NIS upscaling -> kernels/nis.py NVScaler (circulant 64-phase LUT,
        exact 3-split bf16 luma gathers, in-kernel exact border clamp
        composition — no XLA patching)."""
        got, ref = _run_pair(96, 130, radius, rs=0.75, use_nis=True)
        _assert_close(got, ref)

    def test_nvscaler_debug_tint(self):
        got, ref = _run_pair(64, 72, radius=0.3, rs=0.75, use_nis=True,
                             debug=True)
        _assert_close(got, ref)

    def test_nvscaler_mm_merge_layouts_bit_identical(self):
        """The merged-matmul layout (host-precomputed V = Circ @ Aoh, one
        column gather over all dx blocks) must be bit-identical to the
        round-3 many-small-matmuls sandwich: one-hot gathers select single
        values, so merge order cannot change bits. Pins the no_mm_merge
        fallback branch (used when resident V would blow VMEM)."""
        from openvr_fsr_tpu.kernels.nis import build_nvscaler, NisDebugKnobs
        from openvr_fsr_tpu.core import constants as C

        h, w, oh, ow = 48, 64, 64, 88
        fc = C.foveation_constants(ow, oh, 0.5, (0.5, 0.5), (0.5, 0.5), False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]], np.int64)
        nis_cfg = C.nvscaler_update_config(0.9, w, h, w, h, ow, oh, ow, oh)
        rng = np.random.default_rng(11)
        img = rng.integers(0, 2**32, (1, h, w), dtype=np.uint32)
        merged = build_nvscaler(1, h, w, ow, oh, nis_cfg=nis_cfg,
                                centres=centres, interpret=True)
        sandwich = build_nvscaler(1, h, w, ow, oh, nis_cfg=nis_cfg,
                                  centres=centres, interpret=True,
                                  knobs=NisDebugKnobs(no_mm_merge=True))
        a, b = np.asarray(merged(img)), np.asarray(sandwich(img))
        assert np.array_equal(a, b)

    def test_nvscaler_wide_band_autoshrink_matches(self):
        """Wide outputs trip the NVScaler VMEM band auto-shrink; the shrunk
        band must produce the same image as an explicit small band (and the
        shrink path must build without the knobs escape hatch)."""
        from openvr_fsr_tpu.kernels.nis import build_nvscaler, NisDebugKnobs
        from openvr_fsr_tpu.core import constants as C

        h, w, oh, ow = 24, 2880, 32, 3840        # 8K-aspect width, short frame
        fc = C.foveation_constants(ow, oh, 2.0, (0.5, 0.5), (0.5, 0.5), False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]], np.int64)
        nis_cfg = C.nvscaler_update_config(0.7, w, h, w, h, ow, oh, ow, oh)
        rng = np.random.default_rng(5)
        img = rng.integers(0, 2**32, (1, h, w), dtype=np.uint32)
        auto = build_nvscaler(1, h, w, ow, oh, nis_cfg=nis_cfg,
                              centres=centres, interpret=True)
        manual = build_nvscaler(1, h, w, ow, oh, nis_cfg=nis_cfg,
                                centres=centres, interpret=True, band_rows=16,
                                knobs=NisDebugKnobs(no_vmem_shrink=True))
        a, b = np.asarray(auto(img)), np.asarray(manual(img))
        assert np.array_equal(a, b)

    def test_half_precision_mode(self):
        """precision='half' = bf16 math (FsrEasuH/FsrRcasHx2 analog,
        ffx_fsr1.h:445-594): relaxed precision, bounded deviation."""
        frames = np.stack([FR.zone_plate_frame(96, 130),
                           FR.noise_frame(96, 130, seed=3)])
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
        ref = Pipeline(cfg, backend="xla").process(frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=_backend(), precision="half").process(
            frames, eyes=(0, 1))
        d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
        assert (d <= 2).mean() >= 0.95 and d.max() <= 32

    @pytest.mark.parametrize("rs,use_nis", [
        (0.75, False),   # fused EASU+RCAS
        (1.0, False),    # RCAS-only (kernels/rcas.py planar-f32 branch)
        (0.75, True),    # NVScaler (kernels/nis.py upscale builder)
        (1.0, True),     # NVSharpen (kernels/nis.py sharpen builder)
    ])
    def test_10bit_r10g10b10a2(self, rs, use_nis):
        """10-bit texels exceed bf16 integer range -> f32 HIGHEST matmuls /
        planar-f32 IO in every kernel builder (R10G10B10A2 passthrough,
        PostProcessor.cpp:527, 63-74). The 2-bit alpha decodes as a/3 —
        an opaque texel must survive the out-of-radius passthrough."""
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 1024, (2, 64, 72, 4), dtype=np.uint16)
        frames[..., 3] = 3
        cfg = Config(enabled=True, render_scale=rs, sharpness=0.9, radius=0.5,
                     use_nis=use_nis)
        ref = Pipeline(cfg, backend="xla", color_bits=10).process(
            frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=_backend(), color_bits=10).process(
            frames, eyes=(0, 1))
        _assert_close(np.asarray(got).astype(int), np.asarray(ref).astype(int))
        # alpha semantics, not just backend parity: every path writes either
        # 1.0 (3) in-circle or passes the opaque source (3) through
        assert (np.asarray(got)[..., 3] == 3).all()

    def test_batch_one(self):
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
        f = FR.gradient_frame(80, 96)
        ref = Pipeline(cfg, backend="xla").process(f)
        got = Pipeline(cfg, backend=_backend()).process(f)
        _assert_close(np.asarray(got).astype(int), np.asarray(ref).astype(int))


class TestDoubleWide:
    def test_double_wide_fsr(self):
        """One texture holding both eyes (textureContainsOnlyOneEye=false):
        both centres in one constant buffer (PostProcessor.cpp:298-305)."""
        frames = FR.zone_plate_frame(64, 160)[None]
        cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.4)
        ref = Pipeline(cfg, backend="xla", single_eye_per_frame=False,
                       eye_centers=((0.5, 0.5), (0.5, 0.5))).process(frames)
        got = Pipeline(cfg, backend=_backend(), single_eye_per_frame=False,
                       eye_centers=((0.5, 0.5), (0.5, 0.5))).process(frames)
        _assert_close(np.asarray(got).astype(int), np.asarray(ref).astype(int))


class TestMipBias:
    def test_mip_lod_bias_value(self):
        from openvr_fsr_tpu.core.projection import mip_lod_bias

        # -log2(out/in) (VrHooks.cpp:124-128): 0.75 scale -> ~-0.415
        assert abs(mip_lod_bias(1683, 2244) + np.log2(2244 / 1683)) < 1e-6
        assert mip_lod_bias(100, 100) == 0.0


class TestHalfPrecisionAllPaths:
    """precision='half' is wired through every kernel builder (the reference
    ships packed-fp16 variants for RCAS, ffx_fsr1.h:874-1177, and NIS,
    NIS_Scaler.h:141-148) — bounded deviation vs the full-precision path."""

    def _frames(self):
        return np.stack([FR.zone_plate_frame(96, 130),
                         FR.noise_frame(96, 130, seed=3)])

    def _run(self, rs, use_nis):
        frames = self._frames()
        cfg = Config(enabled=True, render_scale=rs, sharpness=0.9, radius=0.5,
                     use_nis=use_nis)
        ref = Pipeline(cfg, backend="xla").process(frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=_backend(), precision="half").process(
            frames, eyes=(0, 1))
        return np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))

    def test_rcas_sharpen_only_half(self):
        d = self._run(rs=1.0, use_nis=False)
        assert (d <= 2).mean() >= 0.95 and d.max() <= 32

    def test_nvsharpen_half(self):
        # NIS edge weights are binary classifications of luma gradients, so
        # bf16-rounded luma can flip a pixel's directional-USM blend
        # entirely (the reference's min16float path has the same cliff) —
        # bound the tail by quantile, not worst pixel.
        d = self._run(rs=1.0, use_nis=True)
        assert (d <= 2).mean() >= 0.95 and (d <= 32).mean() >= 0.999

    def test_nvscaler_half(self):
        # same edge-classification cliff as NVSharpen: quantile-bounded
        d = self._run(rs=0.75, use_nis=True)
        assert (d <= 2).mean() >= 0.95 and (d <= 32).mean() >= 0.999


class TestNisHdrKernels:
    """hdr_mode wired through both NIS Pallas kernels (NIS_Scaler.h:112-118):
    kernel output must match the XLA pipeline, which test_nis.TestHdrModes
    pins to the oracle bitwise."""

    @pytest.mark.parametrize("hdr_mode,rs", [
        (1, 0.75), (2, 0.75),   # NVScaler
        (1, 1.0), (2, 1.0),     # NVSharpen
    ])
    def test_hdr_matches_xla(self, hdr_mode, rs):
        frames = np.stack([FR.zone_plate_frame(96, 130),
                           FR.noise_frame(96, 130, seed=3)])
        cfg = Config(enabled=True, render_scale=rs, sharpness=0.6, radius=0.5,
                     use_nis=True)
        ref = Pipeline(cfg, backend="xla", hdr_mode=hdr_mode).process(
            frames, eyes=(0, 1))
        got = Pipeline(cfg, backend=_backend(), hdr_mode=hdr_mode).process(
            frames, eyes=(0, 1))
        d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
        assert (d == 0).mean() >= 0.99, (
            f"only {(d == 0).mean():.6f} bit-equal, max {d.max()}")
        assert d.max() <= 16

    def test_hdr_mode_respected_in_cache(self):
        """Mutating hdr_mode between calls must re-specialize."""
        f = FR.zone_plate_frame(64, 72)
        cfg = Config(enabled=True, render_scale=1.0, sharpness=0.9,
                     radius=2.0, use_nis=True)
        pipe = Pipeline(cfg, backend="xla")
        a = np.asarray(pipe.process(f))
        pipe.hdr_mode = 2
        b = np.asarray(pipe.process(f))
        assert not np.array_equal(a, b)


class TestDoubleWideAllPaths:
    """Double-wide frames (both eyes in one texture) through the NIS and
    CAS kernel builders — both projection centres live in one constant
    row (PostProcessor.cpp:298-305)."""

    @pytest.mark.parametrize("use_nis,use_cas,rs", [
        (True, False, 0.75),   # NVScaler
        (True, False, 1.0),    # NVSharpen
        (False, True, 0.75),   # CAS upscale
        (False, True, 1.0),    # CAS sharpen
    ])
    def test_double_wide(self, use_nis, use_cas, rs):
        frames = FR.zone_plate_frame(64, 160)[None]
        cfg = Config(enabled=True, render_scale=rs, sharpness=0.8,
                     radius=0.4, use_nis=use_nis, use_cas=use_cas)
        kw = dict(single_eye_per_frame=False,
                  eye_centers=((0.5, 0.5), (0.5, 0.5)))
        ref = Pipeline(cfg, backend="xla", **kw).process(frames)
        got = Pipeline(cfg, backend=_backend(), **kw).process(frames)
        _assert_close(np.asarray(got).astype(int), np.asarray(ref).astype(int))


class TestNvscalerDerivedRows:
    def test_derive_rows_bit_identical_with_padded_tail(self):
        """Opt-in derived-rows luma gather (NisDebugKnobs.derive_rows): the
        8 luma row blocks collapse to one extended gather + 2-shift selects
        (nis.py _find_shifts). Must be bit-identical to the legacy 8*TH row
        gather on the CROPPED output — including when GY*TH overshoots OH,
        where the clamp-duplicated padding rows are exempt from the shift
        match (they are cropped, and requiring them engages nothing)."""
        from openvr_fsr_tpu.kernels.nis import build_nvscaler, NisDebugKnobs
        from openvr_fsr_tpu.core import constants as C

        h, w, oh, ow = 48, 64, 64, 88            # band_rows=24: GY*TH=72>64
        fc = C.foveation_constants(ow, oh, 0.5, (0.5, 0.5), (0.5, 0.5), False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]], np.int64)
        nis_cfg = C.nvscaler_update_config(0.9, w, h, w, h, ow, oh, ow, oh)
        rng = np.random.default_rng(17)
        img = rng.integers(0, 2**32, (1, h, w), dtype=np.uint32)
        derived = build_nvscaler(1, h, w, ow, oh, nis_cfg=nis_cfg,
                                 centres=centres, interpret=True,
                                 band_rows=24,
                                 knobs=NisDebugKnobs(derive_rows=True))
        legacy = build_nvscaler(1, h, w, ow, oh, nis_cfg=nis_cfg,
                                centres=centres, interpret=True, band_rows=24)
        assert derived.derive_rows and not legacy.derive_rows
        a, b = np.asarray(derived(img)), np.asarray(legacy(img))
        assert np.array_equal(a, b)

    def test_derive_rows_engages_at_headline_geometry(self):
        """Host-side only: the 2-shift structure must hold at the baseline
        config's working resolution (1683x1869 -> 2244x2492), where the
        last band carries clamp-duplicated padding rows."""
        from openvr_fsr_tpu.kernels.nis import build_nvscaler, NisDebugKnobs
        from openvr_fsr_tpu.core import constants as C

        h, w, ow, oh = 1869, 1683, 2244, 2492
        fc = C.foveation_constants(ow, oh, 0.5, (0.5, 0.5), (0.5, 0.5), False)
        centres = np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2, np.int64)
        nis_cfg = C.nvscaler_update_config(0.7, w, h, w, h, ow, oh, ow, oh)
        fn = build_nvscaler(2, h, w, ow, oh, nis_cfg=nis_cfg, centres=centres,
                            knobs=NisDebugKnobs(derive_rows=True))
        assert fn.derive_rows
