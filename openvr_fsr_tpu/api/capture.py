"""Frame capture — the ScreenGrab11/SaveTextureToFile analog.

The reference captures the final output as a DDS named
`capture_<ts>_<fsr|nis>_s<sharp>_r<radius>.dds`
(PostProcessor.cpp:640-657). Same metadata-in-filename scheme here; formats:
.dds (uncompressed RGBA8, written natively), .npy, and .png when PIL exists.
"""

import struct
import time
from pathlib import Path

import numpy as np

__all__ = ["save_frame", "capture_filename", "write_dds_rgba8", "read_dds_rgba8"]

_DDSD_FLAGS = 0x1 | 0x2 | 0x4 | 0x1000 | 0x8  # CAPS|HEIGHT|WIDTH|PIXELFORMAT|PITCH
_DDPF_RGBA = 0x41


def capture_filename(use_nis, sharpness, radius, ext="dds", ts=None):
    """capture_<ts>_<fsr|nis>_s<sharp*100>_r<radius*100>.<ext>
    (PostProcessor.cpp:645-651)."""
    stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime(ts))
    return (f"capture_{stamp}_{'nis' if use_nis else 'fsr'}"
            f"_s{int(round(sharpness * 100))}_r{int(round(radius * 100))}.{ext}")


def write_dds_rgba8(path, rgba):
    """Uncompressed 32-bit RGBA DDS writer (DirectXTK-compatible).

    Uses the native C++ encoder (native/src/ovrfsr_native.cc, the
    ScreenGrab11 analog) when available; pure-Python fallback otherwise."""
    try:
        from ..native_rt import dds_write_native
        if dds_write_native(path, rgba):
            return
    except Exception:
        pass
    rgba = np.ascontiguousarray(np.asarray(rgba, np.uint8))
    h, w = rgba.shape[:2]
    buf = bytearray(128)
    struct.pack_into("<4s", buf, 0, b"DDS ")
    struct.pack_into("<I", buf, 4, 124)            # dwSize
    struct.pack_into("<I", buf, 8, _DDSD_FLAGS)    # dwFlags
    struct.pack_into("<I", buf, 12, h)             # dwHeight
    struct.pack_into("<I", buf, 16, w)             # dwWidth
    struct.pack_into("<I", buf, 20, w * 4)         # dwPitchOrLinearSize
    struct.pack_into("<I", buf, 76, 32)            # ddspf.dwSize
    struct.pack_into("<I", buf, 80, _DDPF_RGBA)    # ddspf.dwFlags
    struct.pack_into("<I", buf, 88, 32)            # RGBBitCount
    struct.pack_into("<I", buf, 92, 0x000000FF)    # R mask
    struct.pack_into("<I", buf, 96, 0x0000FF00)    # G mask
    struct.pack_into("<I", buf, 100, 0x00FF0000)   # B mask
    struct.pack_into("<I", buf, 104, 0xFF000000)   # A mask
    struct.pack_into("<I", buf, 108, 0x1000)       # dwCaps
    with open(path, "wb") as f:
        f.write(bytes(buf))
        f.write(rgba.tobytes())


def read_dds_rgba8(path):
    data = Path(path).read_bytes()
    assert data[:4] == b"DDS "
    h = struct.unpack_from("<I", data, 12)[0]
    w = struct.unpack_from("<I", data, 16)[0]
    return np.frombuffer(data[128:128 + h * w * 4], np.uint8).reshape(h, w, 4)


def save_frame(frame, directory=".", use_nis=False, sharpness=0.9, radius=0.5,
               formats=("dds", "npy")):
    """Save a processed (H, W, 4) uint8 frame — or an (H, W) uint32
    packed-RGBA8 plane from the zero-copy pipeline mode — with
    reference-style metadata filenames. Returns the list of written
    paths."""
    frame = np.asarray(frame)
    if frame.dtype == np.uint32:        # packed-u32 API mode output
        frame = frame.view(np.uint8).reshape(frame.shape + (4,))
    if frame.ndim == 4:
        frame = frame[0]
    paths = []
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    for ext in formats:
        p = directory / capture_filename(use_nis, sharpness, radius, ext)
        if ext == "dds":
            write_dds_rgba8(p, frame)
        elif ext == "npy":
            np.save(p, frame)
        elif ext == "png":
            try:
                from PIL import Image
                Image.fromarray(frame, "RGBA").save(p)
            except ImportError:
                continue
        paths.append(p)
    return paths
