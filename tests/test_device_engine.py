"""Device-engine tests (CPU backend = true IEEE everywhere).

Validates the jitted split/recombine/pack pipeline bit-for-bit against the
numpy host reference model and against true f64 matmuls.
"""

import numpy as np
import pytest

from ozimmu_tpu import hostref
from ozimmu_tpu.core.f64x import F64X
from ozimmu_tpu.core.gemm import gemm_f64x, zgemm_f64x
from ozimmu_tpu.ops.pack import pack_f64x, unpack_f64x
from ozimmu_tpu.ops.split import split_f64x
from ozimmu_tpu.schedule import bits_per_int8
from ozimmu_tpu.testing import error_metrics, generate_input


class TestF64XRoundTrip:
    def test_round_trip_exact(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 16)) * np.exp2(rng.integers(-300, 300, (16, 16)))
        x[0, 0] = 0.0
        x[0, 1] = -0.0
        x[0, 2] = 2.0**-1074  # smallest subnormal
        x[0, 3] = np.pi
        fx = F64X.from_numpy(x)
        y = fx.to_numpy().reshape(x.shape)
        np.testing.assert_array_equal(
            x.view(np.uint64), y.view(np.uint64)
        )


class TestDeviceSplit:
    @pytest.mark.parametrize("ns", [3, 9, 18])
    def test_matches_hostref_bitwise(self, ns):
        x = generate_input("exp_rand-3", (32, 40), seed=1)
        x[0, :] = 0.0
        x[3, 0] = 2.0**-1070
        b = bits_per_int8(40)
        dd, pd = split_f64x(F64X.from_numpy(x), ns, b)
        dh, ph = hostref.split_fp64(x, ns, b)
        np.testing.assert_array_equal(np.asarray(dd), dh)
        # sentinel values differ but meaning (nulled row) must match
        np.testing.assert_array_equal(np.asarray(pd) < -(2**19), ph < -(10**5))
        sel = ph >= -(10**5)
        np.testing.assert_array_equal(np.asarray(pd)[sel], ph[sel])


class TestPack:
    def test_unpack_pack_identity(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4096,)) * np.exp2(rng.integers(-320, 300, 4096))
        x[:8] = [0.0, -0.0, 2.0**-1074, -(2.0**-1074), 1.0, -1.0, np.pi, 2.0**1023]
        fx = F64X.from_numpy(x)
        t, E = unpack_f64x(fx)
        y = pack_f64x(t, E).to_numpy()
        np.testing.assert_array_equal(x.view(np.uint64), y.view(np.uint64))

    def test_pack_rounds_to_nearest(self):
        # value with bits beyond 53: (2^53 + 1) represented exactly in the
        # triple must round to nearest even-ish (here: half-up)
        import jax.numpy as jnp

        t = (
            jnp.array([np.float32(2.0**53)]),
            jnp.array([np.float32(3.0)]),
            jnp.array([np.float32(0.0)]),
        )
        E = jnp.array([0], dtype=np.int32)
        y = pack_f64x(t, E).to_numpy()
        assert y[0] == float(2**53 + 4)  # nearest representable to 2^53+3

    def test_pack_overflow_to_inf(self):
        import jax.numpy as jnp

        t = (
            jnp.array([np.float32(1.5)]),
            jnp.array([np.float32(0.0)]),
            jnp.array([np.float32(0.0)]),
        )
        y = pack_f64x(t, jnp.array([1100], dtype=np.int32)).to_numpy()
        assert np.isinf(y[0]) and y[0] > 0
        y2 = pack_f64x(
            (-t[0], t[1], t[2]), jnp.array([1100], dtype=np.int32)
        ).to_numpy()
        assert np.isinf(y2[0]) and y2[0] < 0

    def test_pack_underflow_to_zero_and_subnormals(self):
        import jax.numpy as jnp

        t = (
            jnp.array([np.float32(1.0), np.float32(1.0), np.float32(1.5)]),
            jnp.zeros(3, np.float32),
            jnp.zeros(3, np.float32),
        )
        E = jnp.array([-1200, -1074, -1073], dtype=np.int32)
        y = pack_f64x(t, E).to_numpy()
        assert y[0] == 0.0
        assert y[1] == 2.0**-1074
        assert y[2] == 2.0**-1074 + 2.0**-1073  # 1.5 * 2^-1073 exactly


class TestDeviceGemm:
    @pytest.mark.parametrize("ns", [8, 9, 12])
    def test_residual_gate(self, ns):
        a = generate_input("urand01", (96, 128), seed=3)
        b = generate_input("urand01", (128, 64), seed=4)
        c = gemm_f64x(F64X.from_numpy(a), F64X.from_numpy(b), ns).to_numpy()
        err = error_metrics(c, a, b)
        assert err["relative_residual"] < 1e-15

    def test_matches_hostref_closely(self):
        a = generate_input("normal01", (48, 64), seed=5)
        b = generate_input("normal01", (64, 32), seed=6)
        dev = gemm_f64x(F64X.from_numpy(a), F64X.from_numpy(b), 9).to_numpy()
        host = hostref.gemm_fp64(a, b, 9)
        # both are ~correctly-rounded recombinations; allow 2 ulp
        np.testing.assert_allclose(dev, host, rtol=5e-16, atol=0)

    def test_exponent_spread(self):
        a = generate_input("exp_rand-3", (64, 80), seed=7)
        b = generate_input("exp_rand-3", (80, 48), seed=8)
        c = gemm_f64x(F64X.from_numpy(a), F64X.from_numpy(b), 14).to_numpy()
        err = error_metrics(c, a, b)
        assert err["relative_residual"] < 1e-15

    def test_alpha_beta(self):
        rng = np.random.default_rng(9)
        a = rng.uniform(size=(16, 24))
        b = rng.uniform(size=(24, 16))
        c0 = rng.uniform(size=(16, 16))
        out = gemm_f64x(
            F64X.from_numpy(a),
            F64X.from_numpy(b),
            9,
            alpha=2.5,
            beta=-0.5,
            c=F64X.from_numpy(c0),
        ).to_numpy()
        ref = 2.5 * (a @ b) - 0.5 * c0
        np.testing.assert_allclose(out, ref, rtol=1e-14)

    def test_zero_matrix(self):
        a = np.zeros((8, 8))
        b = np.ones((8, 8))
        out = gemm_f64x(F64X.from_numpy(a), F64X.from_numpy(b), 9).to_numpy()
        np.testing.assert_array_equal(out, np.zeros((8, 8)))

    def test_negative_values(self):
        rng = np.random.default_rng(10)
        a = rng.normal(size=(32, 32))
        b = rng.normal(size=(32, 32))
        out = gemm_f64x(F64X.from_numpy(a), F64X.from_numpy(b), 10).to_numpy()
        err = error_metrics(out, a, b)
        assert err["relative_residual"] < 1e-15


class TestDeviceZgemm:
    def test_complex_residual(self):
        a = generate_input("urand01", (32, 48), seed=11, complex_=True)
        b = generate_input("urand01", (48, 24), seed=12, complex_=True)
        re, im = zgemm_f64x(
            F64X.from_numpy(a.real.copy()),
            F64X.from_numpy(a.imag.copy()),
            F64X.from_numpy(b.real.copy()),
            F64X.from_numpy(b.imag.copy()),
            9,
        )
        c = re.to_numpy() + 1j * im.to_numpy()
        err = error_metrics(c, a, b)
        assert err["relative_residual"] < 1e-15

    def test_complex_alpha_beta(self):
        rng = np.random.default_rng(13)
        a = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
        b = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
        c0 = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
        alpha, beta = 1.5 - 0.5j, 0.25 + 2j
        re, im = zgemm_f64x(
            F64X.from_numpy(a.real.copy()),
            F64X.from_numpy(a.imag.copy()),
            F64X.from_numpy(b.real.copy()),
            F64X.from_numpy(b.imag.copy()),
            10,
            alpha=alpha,
            beta=beta,
            c_re=F64X.from_numpy(c0.real.copy()),
            c_im=F64X.from_numpy(c0.imag.copy()),
        )
        out = re.to_numpy() + 1j * im.to_numpy()
        ref = alpha * (a @ b) + beta * c0
        np.testing.assert_allclose(out, ref, rtol=1e-13)
