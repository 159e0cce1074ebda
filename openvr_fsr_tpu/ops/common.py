"""Shared JAX building blocks: ffx_a.h approximation intrinsics (bit-exact via
uint32 bitcasts, reference src/fsr/ffx_a.h:1842-1845), HLSL min/max/lerp
semantics, UNORM quantization, and static gather helpers."""

import jax
import jax.numpy as jnp
import numpy as np

F32 = np.float32

__all__ = [
    "F32",
    "bitcast_u32",
    "bitcast_f32",
    "aprx_lo_rcp",
    "aprx_med_rcp",
    "aprx_lo_rsq",
    "rcp",
    "rcp_ieee",
    "sat",
    "hlsl_min",
    "hlsl_max",
    "hlsl_lerp",
    "min3",
    "max3",
    "unorm_quantize",
    "take2d",
]


def bitcast_u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def bitcast_f32(u):
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def aprx_lo_rcp(a):
    """APrxLoRcpF1: bitcast(0x7ef07ebb - bits(a))."""
    return bitcast_f32(jnp.uint32(0x7EF07EBB) - bitcast_u32(a))


def aprx_med_rcp(a):
    """APrxMedRcpF1: b = bitcast(0x7ef19fff - bits(a)); b*(-b*a + 2)."""
    b = bitcast_f32(jnp.uint32(0x7EF19FFF) - bitcast_u32(a))
    return b * (-(b * a) + F32(2.0))


def aprx_lo_rsq(a):
    """APrxLoRsqF1: bitcast(0x5f347d74 - (bits(a)>>1))."""
    return bitcast_f32(jnp.uint32(0x5F347D74) - (bitcast_u32(a) >> jnp.uint32(1)))


def rcp(a):
    """ARcpF1 — exact IEEE f32 division (see oracle.intrinsics.rcp)."""
    return F32(1.0) / a


def rcp_ieee(b):
    """Exactly-rounded f32 reciprocal on hardware whose native division is
    1-2 ulp off IEEE (the TPU VPU; measured by tools/numerics_probe.py:
    `1/b` mismatches RN on ~24% of inputs, max 1 ulp — the sole source of
    the Pallas-vs-oracle parity gap, since the probe also shows the TPU
    does NOT contract a*b+c into fma).

    One residual-correction step with the b*q0 product computed exactly via
    Dekker/Veltkamp splitting (no fma assumption — exactness of the split
    relies on plain RN mul/sub, which is what the VPU does):
        q0 = 1/b  (native, ~1 ulp)
        r  = 1 - b*q0  (exact)
        q  = q0 + r*q0
    Verified exactly rounded on 2^20 random inputs on the real chip
    (tools/numerics_probe.py "tpu corrected"); residual near-tie cases are
    ~2^-21 probability, ≤1 ulp. Cost ~18 VPU ops. Non-finite q0 (b == 0,
    subnormal/overflow edge) falls back to the native q0."""
    one = F32(1.0)
    q0 = one / b
    C = F32((1 << 12) + 1)
    bc = b * C
    bh = bc - (bc - b)
    bl = b - bh
    qc = q0 * C
    qh = qc - (qc - q0)
    ql = q0 - qh
    p = b * q0
    e = (((bh * qh - p) + bh * ql) + bl * qh) + bl * ql   # b*q0 == p + e
    r = (one - p) - e
    q = q0 + r * q0
    return jnp.where(jnp.isfinite(q), q, q0)


def sat(a):
    return jnp.minimum(F32(1.0), jnp.maximum(F32(0.0), a))


def hlsl_min(x, y):
    """D3D min: x < y ? x : y (NaN in x selects y)."""
    return jnp.where(x < y, x, y)


def hlsl_max(x, y):
    """D3D max: x > y ? x : y (NaN in x selects y)."""
    return jnp.where(x > y, x, y)


def hlsl_lerp(a, b, s):
    """HLSL lerp intrinsic: a + s*(b-a)."""
    return a + s * (b - a)


def min3(x, y, z):
    return jnp.minimum(x, jnp.minimum(y, z))


def max3(x, y, z):
    return jnp.maximum(x, jnp.maximum(y, z))


def unorm_quantize(x, bits=8):
    """Emulate the D3D11 float->UNORM conversion at UAV writes (clamp to [0,1],
    scale, round-to-nearest-even) and decode back to float. The reference
    pipeline stores every stage to an RGBA8/R10G10B10A2 texture, so the
    EASU->RCAS handoff is quantized (PostProcessor.cpp:527, 63-74)."""
    scale = F32(float((1 << bits) - 1))
    q = jnp.round(sat(x) * scale)
    return q * (F32(1.0) / scale)


def take2d(plane, ys, xs):
    """plane[ys][:, xs] for *static* numpy index arrays (baked constants)."""
    return jnp.take(jnp.take(plane, jnp.asarray(ys), axis=0), jnp.asarray(xs), axis=1)
