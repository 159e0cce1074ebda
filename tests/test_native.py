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
        out, bits = native_rt.dds_read_native(p)
        assert bits == 8
        assert np.array_equal(out, img)

    def test_roundtrip_native_10bit(self, tmp_path):
        from openvr_fsr_tpu.api.capture import (pack_r10g10b10a2,
                                                unpack_r10g10b10a2)

        rng = np.random.default_rng(2)
        img = np.empty((10, 14, 4), np.uint16)
        img[..., :3] = rng.integers(0, 1024, (10, 14, 3))
        img[..., 3] = rng.integers(0, 4, (10, 14))
        p = tmp_path / "n10.dds"
        assert native_rt.dds_write_native(p, pack_r10g10b10a2(img),
                                          color_bits=10)
        raw, bits = native_rt.dds_read_native(p)
        assert bits == 10
        got = unpack_r10g10b10a2(
            np.ascontiguousarray(raw).view(np.uint32)[..., 0])
        assert np.array_equal(got, img)

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


class TestAdvisorFixes:
    def test_ring_pop_rejects_small_buffer(self):
        """ovrfsr_ring_pop takes the out-buffer capacity: popping into a
        buffer smaller than the queued frame raises instead of overflowing."""
        ring = native_rt.FrameRing(256, nslots=2)
        ring.push(np.arange(200, dtype=np.uint8))
        with pytest.raises(ValueError):
            ring.pop((16,))
        # the frame stays queued and pops fine with an adequate buffer
        out = ring.pop((200,))
        assert out is not None and out[5] == 5
        ring.close()

    def test_dds_query_rejects_compressed(self, tmp_path):
        """A DXT/fourcc or non-32bpp header must not decode as garbage."""
        import struct
        p = tmp_path / "c.dds"
        hdr = bytearray(128)
        struct.pack_into("<IIIII", hdr, 0, 0x20534444, 124, 0x1007, 8, 8)
        struct.pack_into("<III", hdr, 76, 32, 0x4, 0x31545844)  # DDPF_FOURCC DXT1
        p.write_bytes(bytes(hdr) + b"\x00" * 256)
        with pytest.raises(IOError):
            native_rt.dds_read_native(p)

    def test_dds_query_bounds_dimensions(self, tmp_path):
        import struct
        p = tmp_path / "h.dds"
        hdr = bytearray(128)
        struct.pack_into("<IIIII", hdr, 0, 0x20534444, 124, 0x100F,
                         0x40000000, 0x40000000)  # absurd width/height
        struct.pack_into("<IIII", hdr, 76, 32, 0x41, 0, 32)
        struct.pack_into("<IIII", hdr, 92, 0xFF, 0xFF00, 0xFF0000, 0xFF000000)
        p.write_bytes(bytes(hdr))
        with pytest.raises(IOError):
            native_rt.dds_read_native(p)

    def test_malformed_scalar_gives_defaults(self):
        """jsoncpp rejects bare tokens; the native scanner path must fall
        back to defaults the same way (Config.h:59-61) instead of crashing."""
        cfg = load_config(text='{"fsr": {"renderScale": abc}}')
        assert cfg.render_scale == 1.0 and not cfg.enabled
        cfg = load_config(text='{"fsr": {"sharpness": null}}')
        assert cfg.sharpness == 0.75  # struct default (whole parse rejected)
