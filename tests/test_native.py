"""Native oracle tests: build, metrics parity, split cross-validation."""

import numpy as np
import pytest

from ozimmu_tpu import hostref, native
from ozimmu_tpu.testing import generate_input, reference_gemm


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    return lib


class TestNativeOracle:
    def test_metrics_match_numpy(self, lib):
        rng = np.random.default_rng(0)
        a, b = rng.uniform(size=(48, 64)), rng.uniform(size=(64, 32))
        c = np.asarray(a @ b)
        got = native.error_metrics_native(c, a, b)
        ref = reference_gemm(a, b)
        diff = c.astype(np.longdouble) - ref
        residual = float(
            np.sqrt(np.sum(diff * diff) / np.sum(ref * ref))
        )
        assert got["relative_residual"] == pytest.approx(residual, rel=1e-6)

    def test_complex_metrics(self, lib):
        a = generate_input("urand01", (24, 32), seed=1, complex_=True)
        b = generate_input("urand01", (32, 16), seed=2, complex_=True)
        c = a @ b
        got = native.error_metrics_native(c, a, b)
        assert got["relative_residual"] < 1e-15

    def test_ref_gemm(self, lib):
        rng = np.random.default_rng(3)
        a, b = rng.uniform(size=(16, 24)), rng.uniform(size=(24, 8))
        ref = native.ref_gemm_native(a, b)
        np.testing.assert_allclose(ref, a @ b, rtol=1e-15)

    def test_ref_gemm_complex_falls_back(self, lib):
        # complex operands must return None (only the real symbol
        # exists; viewing complex as f64 would drop imaginary parts)
        a = generate_input("urand01", (8, 8), seed=5, complex_=True)
        b = generate_input("urand01", (8, 8), seed=6, complex_=True)
        assert native.ref_gemm_native(a, b) is None
        assert native.ref_gemm_native(a.real, b) is None

    def test_split_cross_validation(self, lib):
        """Native and numpy splits must agree bit-for-bit."""
        x = generate_input("exp_rand-4", (32, 48), seed=4)
        x[0, :] = 0.0
        for ns in (3, 9, 18):
            b = 7
            dn, pn = native.split_fp64_native(x, ns, b)
            dh, ph = hostref.split_fp64(x, ns, b)
            np.testing.assert_array_equal(dn, dh)
            sel = ph > -(10**5)
            np.testing.assert_array_equal(pn[sel], ph[sel])
            assert (pn[~sel] == np.iinfo(np.int32).min).all()
