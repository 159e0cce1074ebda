"""Native C++ runtime components (native/src/ovrfsr_native.cc) vs the
pure-Python fallbacks: config scanner (jsoncpp analog), DDS codec
(ScreenGrab11 analog), frame ring (staging-pool analog)."""

import threading

import numpy as np
import pytest

from openvr_fsr_tpu import native_rt
from openvr_fsr_tpu.core.config import load_config
from openvr_fsr_tpu.utils import frames as FR

pytestmark = pytest.mark.skipif(not native_rt.available(),
                                reason="native lib not built")

CFG = """
{
  "fsr": {
    // comment with "quotes" and /* nested markers
    "enabled": true,
    "useNIS": false,   /* block comment */
    "renderScale": 0.77,
    "sharpness": 0.9,
    "radius": 0.5,
    "applyMIPBias": true,
    "debugMode": false,
    "hotkeys": { "enabled": true, "toggleUseNIS": 112 }
  }
}
"""


class TestNativeConfig:
    def test_parse_matches_python_loader(self):
        cfg = load_config(text=CFG)  # goes through the native scanner
        assert cfg.enabled and not cfg.use_nis
        assert cfg.render_scale == 0.77 and cfg.sharpness == 0.9
        assert cfg.hotkeys.toggle_use_nis == 112

    def test_flat_output(self):
        d = native_rt.parse_cfg_native(CFG)
        assert d["enabled"] == "true"
        assert d["renderScale"] == "0.77"
        assert d["hotkeys.toggleUseNIS"] == "112"

    def test_reference_cfg_file(self):
        import pathlib
        ref = pathlib.Path("/root/reference/src/openvr_mod.cfg")
        if not ref.exists():
            pytest.skip("reference cfg not mounted")
        cfg = load_config(path=ref)
        assert cfg.enabled and cfg.render_scale == 0.77


class TestNativeDds:
    def test_roundtrip_native(self, tmp_path):
        img = FR.noise_frame(20, 24)
        p = tmp_path / "n.dds"
        assert native_rt.dds_write_native(p, img)
        out = native_rt.dds_read_native(p)
        assert np.array_equal(out, img)

    def test_native_read_python_write(self, tmp_path):
        from openvr_fsr_tpu.api.capture import read_dds_rgba8

        img = FR.gradient_frame(16, 18)
        p = tmp_path / "x.dds"
        native_rt.dds_write_native(p, img)
        assert np.array_equal(read_dds_rgba8(p), img)


class TestFrameRing:
    def test_push_pop_order(self):
        ring = native_rt.FrameRing(64, nslots=4)
        for i in range(4):
            assert ring.push(np.full(64, i, np.uint8))
        assert not ring.push(np.zeros(64, np.uint8), blocking=False)  # full
        for i in range(4):
            out = ring.pop((64,))
            assert out[0] == i
        st = ring.stats()
        assert st["pushed"] == 4 and st["popped"] == 4 and st["dropped"] == 1
        ring.close()

    def test_producer_consumer_threads(self):
        ring = native_rt.FrameRing(1024, nslots=6)
        n = 50
        got = []

        def producer():
            for i in range(n):
                ring.push(np.full(1024, i % 251, np.uint8))

        t = threading.Thread(target=producer)
        t.start()
        for i in range(n):
            got.append(int(ring.pop((1024,))[0]))
        t.join()
        assert got == [i % 251 for i in range(n)]
