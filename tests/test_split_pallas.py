"""Fused Pallas split kernel vs the XLA elementwise path — bit-exact over
random, wide-exponent, subnormal, zero, and negative inputs (interpret mode
on CPU; compiled on real TPU via OZ_TEST_PLATFORM=tpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ozimmu_tpu.core.f64x import F64X
from ozimmu_tpu.ops.split import row_exponent, split_with_row_exp
from ozimmu_tpu.ops.split_pallas import split_digits_pallas
from ozimmu_tpu.schedule import bits_per_int8
from ozimmu_tpu.testing import generate_input

INTERPRET = jax.default_backend() != "tpu"


def _check(x: np.ndarray, ns: int, b: int, axis: int, br=256, bc=256):
    fx = F64X.from_numpy(x)
    e = row_exponent(fx, axis)
    want, _ = split_with_row_exp(fx, e, ns, b, axis=axis)
    got = split_digits_pallas(
        fx.hi, fx.lo, e, ns, b, axis, br, bc, INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


class TestSplitPallas:
    @pytest.mark.parametrize("axis", [0, 1])
    @pytest.mark.parametrize(
        "ns,b",
        [
            (3, 7),
            (9, 7),
            pytest.param(13, 7, marks=pytest.mark.slow),
            pytest.param(18, 7, marks=pytest.mark.slow),
            (9, 5),
        ],
    )
    def test_exp_spread_bitwise(self, axis, ns, b):
        x = generate_input("exp_rand-8", (160, 224), seed=7)
        _check(x, ns, b, axis, br=64, bc=128)

    @pytest.mark.parametrize(
        "axis", [0, pytest.param(1, marks=pytest.mark.slow)]
    )
    def test_special_values(self, axis):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((64, 128))
        x[0, :] = 0.0  # zero row
        x[:, 0] = 0.0  # zero col
        x[1, 1] = 5e-324  # smallest subnormal
        x[2, 2] = -1e-310  # negative subnormal
        x[3, 3] = -0.0
        x[4, 4] = 1e300
        x[5, 5] = -1e-300
        _check(x, 9, 7, axis, br=32, bc=128)

    @pytest.mark.slow
    def test_all_zero_matrix(self):
        _check(np.zeros((32, 128)), 9, 7, 1, br=32, bc=128)

    def test_unaligned_padding(self):
        x = generate_input("normal01", (100, 200), seed=1)
        _check(x, 8, 7, 1, br=64, bc=128)
        _check(x, 8, 7, 0, br=64, bc=128)

    @pytest.mark.slow
    def test_uniform_big(self):
        x = generate_input("urand01", (256, 384), seed=2)
        _check(x, 9, 7, 1)
        _check(x, 9, 7, 0)
