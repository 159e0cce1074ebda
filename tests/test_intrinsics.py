"""Bit-exactness of the ffx_a.h approximation intrinsics (oracle + JAX)."""

import numpy as np
import pytest

from openvr_fsr_tpu.oracle import intrinsics as oi


def f32(x):
    return np.float32(x)


def bits(x):
    return np.float32(x).view(np.uint32)


class TestOracleIntrinsics:
    def test_bitcast_roundtrip(self):
        vals = np.array([0.0, 1.0, -2.5, 3.14159e-8, 1e30], np.float32)
        assert np.all(oi.f32_from_u32(oi.u32_from_f32(vals)) == vals)

    def test_aprx_lo_rcp_magic(self):
        # bitcast(0x7ef07ebb - bits(a))  (ffx_a.h:1843)
        a = f32(2.0)
        expect = np.uint32(0x7EF07EBB) - bits(a)
        assert bits(oi.aprx_lo_rcp(a)) == expect
        # sane accuracy on a range
        xs = np.linspace(0.1, 8.0, 1000, dtype=np.float32)
        rel = np.abs(oi.aprx_lo_rcp(xs) * xs - 1.0)
        assert rel.max() < 0.065  # low-precision approximation

    def test_aprx_med_rcp(self):
        xs = np.linspace(0.1, 8.0, 1000, dtype=np.float32)
        rel = np.abs(oi.aprx_med_rcp(xs) * xs - 1.0)
        assert rel.max() < 0.004  # one Newton step
        # exact op ordering: b*(-b*a + 2)
        a = f32(3.0)
        b = oi.f32_from_u32(np.uint32(0x7EF19FFF) - bits(a))
        assert oi.aprx_med_rcp(a) == f32(b * f32(-(b * a) + f32(2.0)))

    def test_aprx_lo_rsq(self):
        xs = np.linspace(0.01, 16.0, 1000, dtype=np.float32)
        rel = np.abs(oi.aprx_lo_rsq(xs) * np.sqrt(xs) - 1.0)
        assert rel.max() < 0.05
        a = f32(4.0)
        expect = np.uint32(0x5F347D74) - (bits(a) >> np.uint32(1))
        assert bits(oi.aprx_lo_rsq(a)) == expect

    def test_hlsl_minmax_nan(self):
        nan = np.float32(np.nan)
        # min(x,y) = x<y ? x : y -> NaN in x yields y
        assert oi.hlsl_min(nan, f32(0.0)) == 0.0
        assert oi.hlsl_max(nan, f32(-0.25)) == np.float32(-0.25)
        # NaN in y propagates (comparison false)
        assert np.isnan(oi.hlsl_min(f32(1.0), nan))
        assert np.isnan(oi.hlsl_max(f32(1.0), nan))

    def test_float32_discipline(self):
        # every op returns f32
        for fn in (oi.rcp, oi.rsq, oi.sat, oi.exp2f, oi.aprx_lo_rcp,
                   oi.aprx_med_rcp, oi.aprx_lo_rsq):
            assert fn(np.float32(1.5)).dtype == np.float32


class TestJaxIntrinsicsMatchOracle:
    @pytest.fixture(scope="class")
    def xs(self):
        rng = np.random.default_rng(7)
        return np.abs(rng.standard_normal(4096).astype(np.float32)) + 1e-3

    def test_aprx_fns_bitwise(self, xs):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops import common as jc

        for np_fn, j_fn in ((oi.aprx_lo_rcp, jc.aprx_lo_rcp),
                            (oi.aprx_med_rcp, jc.aprx_med_rcp),
                            (oi.aprx_lo_rsq, jc.aprx_lo_rsq)):
            got = np.asarray(j_fn(jnp.asarray(xs)))
            want = np_fn(xs)
            assert np.array_equal(got.view(np.uint32), want.view(np.uint32)), np_fn

    def test_hlsl_semantics(self, xs):
        import jax.numpy as jnp
        from openvr_fsr_tpu.ops import common as jc

        nan = jnp.float32(np.nan)
        assert float(jc.hlsl_max(nan, jnp.float32(-0.25))) == np.float32(-0.25)
        assert float(jc.hlsl_min(nan, jnp.float32(0.0))) == 0.0
