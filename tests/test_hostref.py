"""Exactness and accuracy tests for the host reference engine."""

from fractions import Fraction

import numpy as np
import pytest

from ozimmu_tpu.hostref import (
    ZERO_ROW_PEXP,
    gemm_fp64,
    reconstruct_fp64,
    split_fp64,
    zgemm_fp64,
)
from ozimmu_tpu.schedule import bits_per_int8
from ozimmu_tpu.testing import error_metrics, generate_input


def exact_value(digits, pexp, b, r, c):
    """Exact rational reconstruction of one element from its digits."""
    if pexp[r] == ZERO_ROW_PEXP:
        return Fraction(0)
    acc = Fraction(0)
    for plane in range(digits.shape[0]):
        i = plane + 1
        acc += Fraction(int(digits[plane, r, c])) * Fraction(2) ** (1 - i * b)
    return acc * Fraction(2) ** int(pexp[r])


class TestSplitExactness:
    @pytest.mark.parametrize("ns", [8, 9, 12, 18])
    def test_uniform_row_exact(self, ns):
        """With ns*b >= 53 + max exponent gap, split is error-free."""
        rng = np.random.default_rng(0)
        x = rng.uniform(0.25, 1.0, size=(8, 16))  # tiny exponent spread
        b = bits_per_int8(16)
        digits, pexp = split_fp64(x, ns, b)
        rec = reconstruct_fp64(digits, pexp, b)
        if ns * b >= 53 + 3:
            np.testing.assert_array_equal(rec, x)

    def test_exact_rational_identity(self):
        """Fraction-level check of the digit identity for spread exponents."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 8)) * np.exp2(rng.integers(-20, 20, size=(4, 8)))
        ns, b = 18, 7  # 126 bits: covers 53 + gap for gap <= 73
        digits, pexp = split_fp64(x, ns, b)
        E = ((x.view(np.uint64) >> 52) & 0x7FF).astype(np.int64)
        Erow = E.max(axis=1)
        for r in range(4):
            for c in range(8):
                gap = int(Erow[r] - E[r, c])
                if 53 + gap <= ns * b and E[r, c] > 0:
                    assert exact_value(digits, pexp, b, r, c) == Fraction(x[r, c])

    def test_digit_range(self):
        x = generate_input("exp_rand-2", (16, 32), seed=3)
        b = bits_per_int8(32)
        digits, _ = split_fp64(x, 9, b)
        assert digits.max() <= 2**b - 1
        assert digits.min() >= -(2**b - 1)

    def test_sign_handling(self):
        x = np.array([[1.5, -1.5, 0.0, -0.0]])
        digits, pexp = split_fp64(x, 4, 7)
        rec = reconstruct_fp64(digits, pexp, 7)
        np.testing.assert_array_equal(rec[0, :2], [1.5, -1.5])
        assert rec[0, 2] == 0 and rec[0, 3] == 0

    def test_zero_row(self):
        x = np.zeros((3, 5))
        x[1] = 1.0
        digits, pexp = split_fp64(x, 4, 7)
        assert pexp[0] == ZERO_ROW_PEXP and pexp[2] == ZERO_ROW_PEXP
        assert (digits[:, 0] == 0).all() and (digits[:, 2] == 0).all()
        np.testing.assert_array_equal(reconstruct_fp64(digits, pexp, 7)[1], x[1])

    def test_subnormal_row_is_nulled(self):
        # Reference semantics: rows whose max exponent field is 0 give C=0.
        x = np.full((1, 4), 2.0**-1060)
        digits, pexp = split_fp64(x, 9, 7)
        assert pexp[0] == ZERO_ROW_PEXP
        assert (digits == 0).all()


class TestGemmExact:
    def test_small_exact_vs_fraction(self):
        """For tiny k and enough slices, the emulated GEMM is exact."""
        rng = np.random.default_rng(2)
        m = n = k = 4
        a = rng.uniform(0.5, 1.0, size=(m, k))
        b = rng.uniform(0.5, 1.0, size=(k, n))
        c = gemm_fp64(a, b, num_split=18)
        for i in range(m):
            for j in range(n):
                exact = sum(
                    (Fraction(a[i, l]) * Fraction(b[l, j]) for l in range(k)),
                    Fraction(0),
                )
                assert c[i, j] == pytest.approx(float(exact), rel=1e-15, abs=0)

    def test_matches_f64_matmul_closely(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(size=(64, 96))
        b = rng.uniform(size=(96, 48))
        c = gemm_fp64(a, b, num_split=9)
        err = error_metrics(c, a, b)
        assert err["relative_residual"] < 1e-15

    @pytest.mark.parametrize("ns", [8, 10, 12, 16])
    def test_split_sweep_residual(self, ns):
        rng = np.random.default_rng(4)
        a = rng.uniform(size=(48, 64)) - 0.5
        b = rng.uniform(size=(64, 32)) - 0.5
        c = gemm_fp64(a, b, num_split=ns)
        err = error_metrics(c, a, b)
        assert err["relative_residual"] < 1e-15

    def test_alpha_beta(self):
        rng = np.random.default_rng(5)
        a = rng.uniform(size=(8, 8))
        b = rng.uniform(size=(8, 8))
        c0 = rng.uniform(size=(8, 8))
        out = gemm_fp64(a, b, 9, alpha=2.5, beta=-0.5, c=c0)
        ref = 2.5 * (a @ b) - 0.5 * c0
        np.testing.assert_allclose(out, ref, rtol=1e-14)

    def test_beta_zero_ignores_nan_c(self):
        rng = np.random.default_rng(6)
        a = rng.uniform(size=(4, 4))
        b = rng.uniform(size=(4, 4))
        c0 = np.full((4, 4), np.nan)
        out = gemm_fp64(a, b, 9, alpha=1.0, beta=0.0, c=c0)
        assert np.isfinite(out).all()

    def test_exponent_spread_accuracy_improves_with_ns(self):
        a = generate_input("exp_rand-4", (32, 64), seed=7)
        b = generate_input("exp_rand-4", (64, 32), seed=8)
        errs = [
            error_metrics(gemm_fp64(a, b, ns), a, b)["relative_residual"]
            for ns in (4, 8, 14)
        ]
        assert errs[2] <= errs[1] <= errs[0] * 1.001
        assert errs[2] < 1e-14


class TestZgemm:
    def test_complex_matches_numpy(self):
        a = generate_input("urand01", (24, 32), seed=9, complex_=True)
        b = generate_input("urand01", (32, 16), seed=10, complex_=True)
        c = zgemm_fp64(a, b, num_split=9)
        err = error_metrics(c, a, b)
        assert err["relative_residual"] < 1e-15

    def test_complex_alpha_beta(self):
        rng = np.random.default_rng(11)
        a = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
        b = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
        c0 = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
        alpha, beta = 1.5 - 0.5j, 0.25 + 2j
        out = zgemm_fp64(a, b, 10, alpha=alpha, beta=beta, c=c0)
        ref = alpha * (a @ b) + beta * c0
        np.testing.assert_allclose(out, ref, rtol=1e-13)


class TestDispatchStability:
    """Regression tripwire for an XLA:CPU multi-device-client bug (found
    2026-08-18): fused loops with ragged partitions could return
    DIFFERENT results per dispatch of the SAME executable on the same
    inputs (corrupting a partition-boundary tile — row k/2, first columns
    at [250, 9]).  The split's vectorized window extraction dodges the
    racy fusion shape; this test re-dispatches the previously-affected
    graphs and asserts bitwise-stable outputs, so any regression (or a
    new XLA manifestation) fails loudly instead of flaking bitwise tests
    elsewhere."""

    def test_split_cols_stable_at_ragged_shape(self):
        import jax

        from ozimmu_tpu.core.f64x import F64X
        from ozimmu_tpu.ops.split import split_f64x_cols
        from ozimmu_tpu.schedule import bits_per_int8

        rng = np.random.default_rng(81)
        x = F64X.from_numpy(rng.normal(size=(250, 9)))
        bb = bits_per_int8(250)
        fn = jax.jit(lambda h, lo: split_f64x_cols(F64X(h, lo), 9, bb))
        d0, p0 = map(np.asarray, fn(x.hi, x.lo))
        for _ in range(6):
            d, p = map(np.asarray, fn(x.hi, x.lo))
            np.testing.assert_array_equal(d, d0)
            np.testing.assert_array_equal(p, p0)

    def test_full_engine_stable_at_ragged_shape(self):
        import ozimmu_tpu as oz

        rng = np.random.default_rng(81)
        a = rng.normal(size=(13, 250)) + 1j * rng.normal(size=(13, 250))
        b = rng.normal(size=(250, 9)) + 1j * rng.normal(size=(250, 9))
        w0 = oz.gemm(a, b, mode="fp64_int8_9")
        for _ in range(3):
            w = oz.gemm(a, b, mode="fp64_int8_9")
            np.testing.assert_array_equal(
                np.ascontiguousarray(w).view(np.uint64),
                np.ascontiguousarray(w0).view(np.uint64),
            )
