"""ctypes bindings for the native runtime library (native/src/ovrfsr_native.cc).

The C++ side provides the framework's native non-compute subsystems — the
analogs of the reference's vendored jsoncpp (config parsing), DirectXTK
ScreenGrab (DDS IO) and the PostProcessor staging-resource pools (frame
ring). Everything here degrades gracefully: `lib()` returns None when the
shared library is missing and cannot be built, and callers fall back to the
pure-Python implementations.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["lib", "available", "parse_cfg_native", "dds_write_native",
           "dds_read_native", "FrameRing"]

_LIB = None
_TRIED = False


def _root():
    return Path(__file__).resolve().parent.parent


# must match OVRFSR_ABI_VERSION in native/src/ovrfsr_native.cc; the ctypes
# signatures below describe exactly this ABI
_ABI_VERSION = 2


def _load_checked(so):
    """dlopen + ABI-version check; None for missing/stale libraries (a
    pre-versioning .so lacks the symbol entirely)."""
    try:
        L = ctypes.CDLL(str(so))
    except OSError:
        return None
    try:
        L.ovrfsr_abi_version.restype = ctypes.c_int
        if L.ovrfsr_abi_version() != _ABI_VERSION:
            return None
    except AttributeError:
        return None
    return L


def lib():
    """Load (building on first use) the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _root() / "native" / "libovrfsr_native.so"
    if not so.exists():
        try:
            subprocess.run(["sh", str(_root() / "native" / "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    L = _load_checked(so)
    if L is None:
        # stale prebuilt .so from an older ABI: rebuild once and retry
        try:
            so.unlink(missing_ok=True)
            subprocess.run(["sh", str(_root() / "native" / "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
        L = _load_checked(so)
        if L is None:
            return None
    L.ovrfsr_parse_cfg.restype = ctypes.c_int
    L.ovrfsr_parse_cfg.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_int]
    L.ovrfsr_dds_write.restype = ctypes.c_int
    L.ovrfsr_dds_write.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_char_p, ctypes.c_int]
    L.ovrfsr_dds_query.restype = ctypes.c_long
    L.ovrfsr_dds_query.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    L.ovrfsr_dds_read.restype = ctypes.c_int
    L.ovrfsr_dds_read.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_long]
    L.ovrfsr_ring_create.restype = ctypes.c_void_p
    L.ovrfsr_ring_create.argtypes = [ctypes.c_long, ctypes.c_int]
    L.ovrfsr_ring_destroy.argtypes = [ctypes.c_void_p]
    L.ovrfsr_ring_push.restype = ctypes.c_int
    L.ovrfsr_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_long, ctypes.c_int]
    L.ovrfsr_ring_pop.restype = ctypes.c_long
    L.ovrfsr_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_long, ctypes.c_int]
    L.ovrfsr_ring_close.argtypes = [ctypes.c_void_p]
    L.ovrfsr_ring_stats.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_uint64)] * 4
    _LIB = L
    return _LIB


def available():
    return lib() is not None


def parse_cfg_native(text):
    """JSON-with-comments 'fsr' object -> dict of key -> raw string value
    (nested hotkeys as 'hotkeys.<key>'), or None if native lib unavailable."""
    L = lib()
    if L is None:
        return None
    out = ctypes.create_string_buffer(1 << 16)
    n = L.ovrfsr_parse_cfg(text.encode(), out, len(out))
    if n < 0:
        raise ValueError("native config parse failed")
    d = {}
    for line in out.value.decode().splitlines():
        k, _, v = line.partition("=")
        d[k] = v
    return d


def dds_write_native(path, rgba, color_bits=8):
    """rgba: (H, W, 4) uint8 (color_bits=8) or (H, W) uint32 packed
    R10G10B10A2 (color_bits=10) — the encoder writes raw 32bpp texels."""
    L = lib()
    if L is None:
        return False
    if color_bits == 10:
        rgba = np.ascontiguousarray(np.asarray(rgba, np.uint32))
        h, w = rgba.shape[:2]
    else:
        rgba = np.ascontiguousarray(np.asarray(rgba, np.uint8))
        h, w = rgba.shape[:2]
    rc = L.ovrfsr_dds_write(str(path).encode(), w, h,
                            rgba.ctypes.data_as(ctypes.c_char_p), color_bits)
    if rc != 0:
        raise IOError(f"native DDS write failed: {path}")
    return True


def dds_read_native(path):
    """Returns ((H, W, 4) uint8 texel bytes, color_bits) — for 10-bit files
    the bytes are packed R10G10B10A2 (view as uint32 to unpack), or None if
    the native lib is unavailable."""
    L = lib()
    if L is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    bits = ctypes.c_int()
    n = L.ovrfsr_dds_query(str(path).encode(), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(bits))
    if n < 0:
        raise IOError(f"not a DDS file: {path}")
    buf = np.empty((h.value, w.value, 4), np.uint8)
    if L.ovrfsr_dds_read(str(path).encode(),
                         buf.ctypes.data_as(ctypes.c_char_p), n) != 0:
        raise IOError(f"native DDS read failed: {path}")
    return buf, bits.value


class FrameRing:
    """Thread-safe fixed-slot staging ring (native; the reference's
    lazily-created staging texture pool analog). Push frames from a producer
    thread, pop on the consumer that feeds the device."""

    def __init__(self, slot_bytes, nslots=6):
        L = lib()
        if L is None:
            raise RuntimeError("native runtime library unavailable")
        self._L = L
        self._ring = L.ovrfsr_ring_create(int(slot_bytes), int(nslots))
        self.slot_bytes = int(slot_bytes)

    def push(self, arr, blocking=True):
        arr = np.ascontiguousarray(arr)
        rc = self._L.ovrfsr_ring_push(
            self._ring, arr.ctypes.data_as(ctypes.c_char_p),
            arr.nbytes, 1 if blocking else 0)
        if rc < 0:
            raise RuntimeError("ring closed or frame too large")
        return bool(rc)

    def pop(self, shape, dtype=np.uint8, blocking=True, out=None):
        """Pop into `out` (reused buffer avoids 25MB-scale page faults per
        frame in streaming loops) or a fresh array."""
        if out is None:
            out = np.empty(shape, dtype)
        n = self._L.ovrfsr_ring_pop(
            self._ring, out.ctypes.data_as(ctypes.c_char_p),
            out.nbytes, 1 if blocking else 0)
        if n == -2:
            raise ValueError(
                f"queued frame larger than pop buffer ({out.nbytes} bytes)")
        if n <= 0:
            return None
        return out

    def stats(self):
        vals = [ctypes.c_uint64() for _ in range(4)]
        self._L.ovrfsr_ring_stats(self._ring, *[ctypes.byref(v) for v in vals])
        return dict(zip(("pushed", "popped", "dropped", "depth"),
                        (v.value for v in vals)))

    def close(self):
        self._L.ovrfsr_ring_close(self._ring)

    def __del__(self):
        try:
            self._L.ovrfsr_ring_destroy(self._ring)
        except Exception:
            pass
