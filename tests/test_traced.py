"""Jittable functional API (ozimmu_tpu.traced): in-jit engine calls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ozimmu_tpu as oz
from ozimmu_tpu import traced


def _mk(shape, seed, complex_=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape)
    if complex_:
        x = x + 1j * rng.normal(size=shape)
    return jnp.asarray(x)


class TestTracedGemm:
    def test_bitwise_matches_host_api(self):
        # on CPU (true f64) the traced path must reproduce the host path
        # bit for bit
        a, b = _mk((48, 64), 0), _mk((64, 32), 1)
        out = jax.jit(lambda x, y: traced.gemm(x, y, num_split=9))(a, b)
        host = oz.gemm(np.asarray(a), np.asarray(b), mode="fp64_int8_9")
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint64), host.view(np.uint64)
        )

    def test_alpha_beta(self):
        a, b, c = _mk((32, 40), 2), _mk((40, 24), 3), _mk((32, 24), 4)
        out = jax.jit(
            lambda x, y, z: traced.gemm(x, y, alpha=2.5, beta=-0.5, c=z)
        )(a, b, c)
        host = oz.gemm(
            np.asarray(a), np.asarray(b), mode="fp64_int8_9",
            alpha=2.5, beta=-0.5, c=np.asarray(c),
        )
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint64), host.view(np.uint64)
        )

    @pytest.mark.slow
    def test_complex(self):
        a = _mk((24, 32), 5, complex_=True)
        b = _mk((32, 16), 6, complex_=True)
        c = _mk((24, 16), 7, complex_=True)
        al, be = 1.5 - 0.5j, 0.25 + 1.0j
        out = jax.jit(
            lambda x, y, z: traced.gemm(x, y, num_split=10, alpha=al, beta=be, c=z)
        )(a, b, c)
        host = oz.gemm(
            np.asarray(a), np.asarray(b), mode="fp64_int8_10",
            alpha=al, beta=be, c=np.asarray(c),
        )
        np.testing.assert_array_equal(np.asarray(out), host)

    def test_batched(self):
        a, b = _mk((3, 16, 24), 8), _mk((3, 24, 12), 9)
        out = jax.jit(lambda x, y: traced.gemm_batched(x, y))(a, b)
        host = oz.gemm_batched(np.asarray(a), np.asarray(b), mode="fp64_int8_9")
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint64), host.view(np.uint64)
        )

    def test_composes_inside_jit(self):
        # the whole point: engine inside a larger jitted computation
        a, b = _mk((32, 32), 10), _mk((32, 32), 11)

        @jax.jit
        def f(x, y):
            g = traced.matmul(x, y)
            return jnp.trace(g) + traced.gemm(g, y, alpha=0.5)[0, 0]

        v = f(a, b)
        g = np.asarray(a) @ np.asarray(b)
        ref = np.trace(g) + 0.5 * (g @ np.asarray(b))[0, 0]
        np.testing.assert_allclose(float(v), ref, rtol=1e-14)

    @pytest.mark.slow
    def test_vmap_composes(self):
        a, b = _mk((2, 16, 16), 12), _mk((2, 16, 16), 13)
        out = jax.vmap(lambda x, y: traced.gemm(x, y))(a, b)
        host = oz.gemm_batched(np.asarray(a), np.asarray(b), mode="fp64_int8_9")
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint64), host.view(np.uint64)
        )

    def test_validation(self):
        a, b = _mk((8, 8), 14), _mk((9, 8), 15)
        with pytest.raises(ValueError, match="mismatch"):
            traced.gemm(a, b)
        with pytest.raises(ValueError, match="requires c"):
            traced.gemm(a, _mk((8, 8), 16), beta=1.0)
