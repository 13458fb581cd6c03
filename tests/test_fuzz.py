"""Deterministic fuzz sweep: random shapes x modes x ops x epilogues.

Every configuration is seeded, so failures are exactly reproducible.
Covers the seams individual unit tests miss: odd/prime shapes hitting
both engine paths' padding, transposes combined with alpha/beta, real
and complex, and all three input distributions.
"""

import numpy as np
import pytest

import ozimmu_tpu as oz
from ozimmu_tpu.testing import error_metrics, generate_input

DISTS = ["urand01", "normal01", "exp_rand-1"]
OPS = ["N", "T"]


def _case(rng):
    m = int(rng.integers(1, 200))
    k = int(rng.integers(2, 300))
    n = int(rng.integers(1, 200))
    ns = int(rng.integers(9, 19))  # ns >= 9: full coverage for these dists
    dist = DISTS[int(rng.integers(0, len(DISTS)))]
    op_a = OPS[int(rng.integers(0, 2))]
    op_b = OPS[int(rng.integers(0, 2))]
    alpha = float(rng.choice([1.0, -1.0, 2.5, 0.125]))
    beta = float(rng.choice([0.0, 1.0, -0.5]))
    return m, k, n, ns, dist, op_a, op_b, alpha, beta


class TestFuzzReal:
    @pytest.mark.parametrize("seed", range(12))
    def test_random_config(self, seed):
        rng = np.random.default_rng(1000 + seed)
        m, k, n, ns, dist, op_a, op_b, alpha, beta = _case(rng)
        a = generate_input(dist, (m, k) if op_a == "N" else (k, m), seed=seed)
        b = generate_input(dist, (k, n) if op_b == "N" else (n, k), seed=seed + 500)
        c0 = generate_input("normal01", (m, n), seed=seed + 900) if beta else None
        got = oz.gemm(a, b, mode=f"fp64_int8_{ns}", op_a=op_a, op_b=op_b,
                      alpha=alpha, beta=beta, c=c0)
        ae = a if op_a == "N" else a.T
        be = b if op_b == "N" else b.T
        ref = alpha * (ae.astype(np.longdouble) @ be.astype(np.longdouble))
        if beta:
            ref = ref + beta * c0.astype(np.longdouble)
        num = np.linalg.norm((got - ref).astype(np.float64))
        den = np.linalg.norm(ref.astype(np.float64)) or 1.0
        assert num / den < 1e-15, (m, k, n, ns, dist, op_a, op_b, alpha, beta)


@pytest.mark.slow
class TestFuzzTraced:
    """The in-jit functional surface must bit-match the host API for any
    random configuration (CPU backend: both are exact)."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_config(self, seed):
        import jax
        import jax.numpy as jnp

        from ozimmu_tpu import traced

        rng = np.random.default_rng(3000 + seed)
        m, k, n, ns, dist, _, _, alpha, beta = _case(rng)
        ns = min(ns, 16)
        a = generate_input(dist, (m, k), seed=seed)
        b = generate_input(dist, (k, n), seed=seed + 500)
        c0 = generate_input("normal01", (m, n), seed=seed + 900) if beta else None
        if c0 is None:
            got = jax.jit(
                lambda x, y: traced.gemm(x, y, num_split=ns, alpha=alpha)
            )(jnp.asarray(a), jnp.asarray(b))
        else:
            got = jax.jit(
                lambda x, y, z: traced.gemm(
                    x, y, num_split=ns, alpha=alpha, beta=beta, c=z
                )
            )(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c0))
        host = oz.gemm(a, b, mode=f"fp64_int8_{ns}", alpha=alpha, beta=beta, c=c0)
        np.testing.assert_array_equal(
            np.asarray(got).view(np.uint64), host.view(np.uint64),
            err_msg=str((m, k, n, ns, dist, alpha, beta)),
        )


class TestFuzzComplexSgemm:
    """Complex f32 demotion across random shapes: must track a
    complex64-demoted reference at f32-grade accuracy (never silently
    full-precision)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_random_config(self, seed):
        rng = np.random.default_rng(4000 + seed)
        m = int(rng.integers(8, 120))
        k = int(rng.integers(8, 160))
        n = int(rng.integers(8, 120))
        a = generate_input("normal01", (m, k), seed=seed, complex_=True)
        b = generate_input("normal01", (k, n), seed=seed + 500, complex_=True)
        got = oz.gemm(a, b, mode="sgemm")
        ref32 = (a.astype(np.complex64) @ b.astype(np.complex64)).astype(np.complex128)
        ref64 = a @ b
        r32 = np.linalg.norm(got - ref32) / np.linalg.norm(ref32)
        r64 = np.linalg.norm(got - ref64) / np.linalg.norm(ref64)
        assert r32 < 1e-5, (m, k, n, r32)
        assert r64 > 1e-10, (m, k, n, r64)  # really demoted


@pytest.mark.slow
class TestFuzzComplex:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_config(self, seed):
        rng = np.random.default_rng(2000 + seed)
        m, k, n, ns, dist, op_a, op_b, _, _ = _case(rng)
        alpha = complex(rng.choice([1.0, 2.0]), rng.choice([0.0, -1.0]))
        beta = complex(rng.choice([0.0, 1.0]), 0.0)
        a = generate_input(dist, (m, k) if op_a == "N" else (k, m),
                           seed=seed, complex_=True)
        b = generate_input(dist, (k, n) if op_b == "N" else (n, k),
                           seed=seed + 500, complex_=True)
        c0 = (generate_input("normal01", (m, n), seed=seed + 900, complex_=True)
              if beta != 0 else None)
        got = oz.gemm(a, b, mode=f"fp64_int8_{ns}", op_a=op_a, op_b=op_b,
                      alpha=alpha, beta=beta, c=c0)
        ae = a if op_a == "N" else a.T
        be = b if op_b == "N" else b.T
        ref = alpha * (ae.astype(np.clongdouble) @ be.astype(np.clongdouble))
        if beta != 0:
            ref = ref + beta * c0.astype(np.clongdouble)
        num = np.linalg.norm((got - ref).astype(np.complex128))
        den = np.linalg.norm(ref.astype(np.complex128)) or 1.0
        assert num / den < 1e-15, (m, k, n, ns, dist, op_a, op_b, alpha, beta)
