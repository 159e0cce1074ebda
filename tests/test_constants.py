"""Constant setup parity: FsrEasuCon / FsrRcasCon / NVScalerUpdateConfig /
foveation packing (reference lines cited in core/constants.py)."""

import numpy as np
import pytest

from openvr_fsr_tpu.core import constants as C

F32 = np.float32


class TestEasuCon:
    def test_baseline_config(self):
        # 1683x1869 -> 2244x2492 (renderScale 0.75, BASELINE config 1)
        con0, con1, con2, con3 = C.fsr_easu_con(1683, 1869, 1683, 1869, 2244, 2492)
        assert con0[0] == F32(1683) * (F32(1) / F32(2244))
        assert con0[2] == F32(0.5) * F32(1683) * (F32(1) / F32(2244)) - F32(0.5)
        assert con1[0] == F32(1) / F32(1683)
        assert con1[3] == F32(-1) / F32(1869)
        assert con2[1] == F32(2) / F32(1869)
        assert con3[1] == F32(4) / F32(1869)
        assert con3[2] == 0 and con3[3] == 0

    def test_identity_scale(self):
        con0, *_ = C.fsr_easu_con(100, 100, 100, 100, 100, 100)
        assert con0[0] == 1.0 and con0[1] == 1.0
        assert con0[2] == 0.0 and con0[3] == 0.0


class TestRcasCon:
    def test_stops_to_linear(self):
        assert C.fsr_rcas_con(0.0) == 1.0
        assert C.fsr_rcas_con(1.0) == 0.5
        assert C.fsr_rcas_con(2.0) == 0.25

    def test_slider_mapping(self):
        # PostProcessor.cpp:420-421: stops = 2 - 2*clamp(sharpness, 0, 1)
        assert C.rcas_stops_from_slider(1.0) == 0.0
        assert C.rcas_stops_from_slider(0.0) == 2.0
        assert C.rcas_stops_from_slider(0.9) == F32(2.0) - F32(2.0) * F32(0.9)
        assert C.rcas_stops_from_slider(5.0) == 0.0   # clamped
        assert C.rcas_stops_from_slider(-1.0) == 2.0  # clamped


class TestNisConfig:
    def test_slider_break_at_half(self):
        # NIS_Config.h:160-162: different scales for slider < 0.5 vs >= 0.5
        lo = C.nvscaler_update_config(0.25, 100, 100, 100, 100, 125, 125, 125, 125)
        hi = C.nvscaler_update_config(0.75, 100, 100, 100, 100, 125, 125, 125, 125)
        slider_lo, slider_hi = F32(0.25) - F32(0.5), F32(0.75) - F32(0.5)
        assert lo.kSharpStrengthMin == max(F32(0), F32(0.4) + slider_lo * F32(1.0) * F32(1.2))
        assert hi.kSharpStrengthMin == max(F32(0), F32(0.4) + slider_hi * F32(1.25) * F32(1.2))
        assert lo.kSharpLimitMin == max(F32(0.1), F32(0.14) + slider_lo * F32(1.0) * F32(0.32))

    def test_scale_validity_window(self):
        ok = C.nvscaler_update_config(0.5, 75, 75, 75, 75, 100, 100, 100, 100)
        assert ok.valid and abs(ok.kScaleX - 0.75) < 1e-6
        bad = C.nvscaler_update_config(0.5, 40, 40, 40, 40, 100, 100, 100, 100)
        assert not bad.valid  # scale 0.4 < 0.5 (NIS_Config.h:226)
        sup = C.nvscaler_update_config(0.5, 130, 130, 130, 130, 100, 100, 100, 100)
        assert not sup.valid  # scale 1.3 > 1.0

    def test_fixed_constants(self):
        c = C.nvscaler_update_config(0.9, 100, 100, 100, 100, 133, 133, 133, 133)
        assert c.kDetectRatio == F32(1127.0 / 1024.0)
        assert c.kDetectThres == F32(64.0 / 1024.0)
        assert c.kContrastBoost == 1.0 and c.kEps == 1.0
        assert c.kMinContrastRatio == 2.0
        assert c.kRatioNorm == F32(1.0) / (F32(10.0) - F32(2.0))

    def test_sharpen_config_is_identity_scale(self):
        c = C.nvsharpen_update_config(0.9, 200, 100, 200, 100)
        assert c.kScaleX == 1.0 and c.kScaleY == 1.0
        assert c.kDstNormX == c.kSrcNormX


class TestFoveation:
    def test_radius_packing(self):
        # radius[0] = 0.5*radius*outH ; radius[1] = r0*r0 truncated to uint
        fc = C.foveation_constants(2244, 2492, 0.5, (0.5, 0.5), (0.5, 0.5))
        r0 = F32(0.5) * F32(0.5) * F32(2492)
        assert fc.radius_sq == int(r0 * r0)
        assert fc.out_w == 2244 and fc.out_h == 2492

    def test_single_eye_buffers(self):
        left = C.foveation_constants(200, 100, 0.5, (0.4, 0.6), (0.7, 0.3), True, 0)
        right = C.foveation_constants(200, 100, 0.5, (0.4, 0.6), (0.7, 0.3), True, 1)
        assert left.centre_left == left.centre_right == (int(F32(200) * F32(0.4)),
                                                         int(F32(100) * F32(0.6)))
        assert right.centre_left == (int(F32(200) * F32(0.7)), int(F32(100) * F32(0.3)))

    def test_double_wide_packing(self):
        # PostProcessor.cpp:298-301: c0 = outW/2*projL.x ; c2 = outW/2*(1+projR.x)
        fc = C.foveation_constants(201, 100, 0.5, (0.4, 0.6), (0.7, 0.3), False)
        assert fc.centre_left == (int(F32(100) * F32(0.4)), int(F32(100) * F32(0.6)))
        assert fc.centre_right[0] == int(F32(100) * (F32(1.0) + F32(0.7)))

    def test_nis_optimal_block(self):
        # NISOptimizer port (NIS_Config.h:104-140): 32x24 upscale /
        # 32x32 sharpen, 256 threads, identical across the three archs —
        # and equal to the foveation mask-state tile constants.
        from openvr_fsr_tpu.core import foveation as fov
        import pytest
        for arch in ("nvidia", "amd", "intel"):
            assert fov.nis_optimal_block(True, arch) == \
                (fov.TILE_NIS_SCALER, 256)
            assert fov.nis_optimal_block(False, arch) == \
                (fov.TILE_NIS_SHARPEN, 256)
        with pytest.raises(ValueError):
            fov.nis_optimal_block(True, "mali")
