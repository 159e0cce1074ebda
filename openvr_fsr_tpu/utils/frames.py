"""Frame layout conversion and synthetic test frames.

External layout: (B, H, W, 4) RGBA (uint8, or uint16 for 10-bit, or float).
Internal layout: planar (B, 4, H, W) float32 — puts the image width on VPU
lanes, which is what every op in ops/ and kernels/ expects.
"""

import numpy as np

__all__ = [
    "to_planar",
    "from_planar",
    "quantize_unorm",
    "decode_unorm",
    "gradient_frame",
    "checkerboard_frame",
    "zone_plate_frame",
    "noise_frame",
]


def to_planar(frames, color_bits=8, alpha_bits=None):
    """(B?, H, W, C) uint/float -> (B, 4, H, W) float32 in [0,1].

    uint8 decodes as UNORM8 (u/255); uint16 as UNORM with `color_bits` for
    RGB (default treats uint16 input as 10-bit, u/1023) and the matching
    narrow alpha (R10G10B10A2: a/3 — 2-bit UNORM, like the hardware view;
    from_planar re-encodes with the same width). Missing alpha -> 1.
    """
    import jax.numpy as jnp

    x = frames
    if hasattr(x, "ndim") and x.ndim == 3:
        x = x[None]
    if x.dtype == np.uint8 or str(x.dtype) == "uint8":
        x = jnp.asarray(x).astype(jnp.float32) * np.float32(1.0 / 255.0)
    elif x.dtype == np.uint16 or str(x.dtype) == "uint16":
        cb = color_bits if color_bits else 10
        ab = alpha_bits if alpha_bits is not None else (8 if cb == 8 else 2)
        cscale = np.float32(1.0 / ((1 << cb) - 1))
        ascale = np.float32(1.0 / ((1 << ab) - 1))
        xf = jnp.asarray(x).astype(jnp.float32)
        if xf.shape[-1] == 4:
            x = jnp.concatenate(
                [xf[..., :3] * cscale, xf[..., 3:] * ascale], axis=-1)
        else:
            x = xf * cscale
    else:
        x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] == 3:
        alpha = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
        x = jnp.concatenate([x, alpha], axis=-1)
    return jnp.transpose(x, (0, 3, 1, 2))


def from_planar(planar, color_bits=8, alpha_bits=None):
    """(B, 4, H, W) float32 -> (B, H, W, 4) integer frame.

    color_bits=8 -> uint8 RGBA8; color_bits=10 -> uint16 R10G10B10 with
    alpha_bits (default 2, R10G10B10A2). Round-to-nearest-even like the D3D11
    UNORM conversion."""
    import jax.numpy as jnp

    if alpha_bits is None:
        alpha_bits = 8 if color_bits == 8 else 2
    cscale = np.float32((1 << color_bits) - 1)
    ascale = np.float32((1 << alpha_bits) - 1)
    x = jnp.transpose(planar, (0, 2, 3, 1))
    col = jnp.round(jnp.clip(x[..., :3], 0.0, 1.0) * cscale)
    alp = jnp.round(jnp.clip(x[..., 3:], 0.0, 1.0) * ascale)
    out = jnp.concatenate([col, alp], axis=-1)
    return out.astype(jnp.uint8 if color_bits == 8 else jnp.uint16)


def quantize_unorm(x, bits=8):
    """NumPy UNORM quantize-and-decode (round-half-even), for oracle pipelines."""
    scale = np.float32((1 << bits) - 1)
    q = np.rint(np.clip(np.asarray(x, np.float32), 0.0, 1.0) * scale).astype(np.float32)
    return q * np.float32(1.0 / scale)


def decode_unorm(u, bits=8):
    return np.asarray(u, np.float32) * np.float32(1.0 / ((1 << bits) - 1))


# --- synthetic frames (uint8 RGBA) ------------------------------------------

def gradient_frame(h, w, seed=0):
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    r = np.broadcast_to(x, (h, w))
    g = np.broadcast_to(y, (h, w))
    b = (x + y) * 0.5
    a = np.full((h, w), 255.0, np.float32)
    return np.clip(np.stack([r, g, np.broadcast_to(b, (h, w)), a], -1), 0, 255).astype(np.uint8)


def checkerboard_frame(h, w, cell=4, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    c = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
    rgba = np.stack([c, 255 - c, c, np.full((h, w), 255, np.uint8)], -1)
    return rgba


def zone_plate_frame(h, w, k=0.08, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h / 2.0, w / 2.0
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    v = (127.5 + 127.5 * np.cos(k * r2 * np.pi / max(h, w))).astype(np.uint8)
    return np.stack([v, v, v, np.full((h, w), 255, np.uint8)], -1)


def noise_frame(h, w, seed=0):
    rng = np.random.default_rng(seed)
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint16).astype(np.uint8)
    rgba[..., 3] = 255
    return rgba
