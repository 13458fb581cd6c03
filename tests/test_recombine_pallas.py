"""Fused Pallas recombination vs the XLA-op path (interpret mode on CPU;
the same checks run compiled on real TPU via OZ_TEST_PLATFORM=tpu)."""

import jax
import numpy as np
import pytest

from ozimmu_tpu.core.f64x import F64X
from ozimmu_tpu.ops.recombine import recombine
from ozimmu_tpu.ops.recombine_pallas import recombine_pallas
from ozimmu_tpu.ops.split import split_f64x, split_f64x_cols
from ozimmu_tpu.schedule import bits_per_int8
from ozimmu_tpu.testing import generate_input

INTERPRET = jax.default_backend() != "tpu"


def _run_both(m, n, k, ns, seed=0, block_k=512):
    b = bits_per_int8(k)
    a = generate_input("normal01", (m, k), seed=seed)
    bm = generate_input("normal01", (k, n), seed=seed + 1)
    da, _ = split_f64x(F64X.from_numpy(a), ns, b)
    db, _ = split_f64x_cols(F64X.from_numpy(bm), ns, b)
    Sx = recombine(da, db, ns, b, k)
    Sp = recombine_pallas(da, db, ns, b, k, 256, 256, block_k, INTERPRET)
    return Sx, Sp


class TestRecombinePallas:
    def test_single_k_block_bitwise(self):
        """One k step => identical fold order => bitwise equality."""
        Sx, Sp = _run_both(256, 256, 384, ns=9)
        for x, p in zip(Sx, Sp):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(p))

    def test_multi_k_block_close(self):
        """Multiple k steps reorder the folds; value agreement stays far
        below the f64 target."""
        Sx, Sp = _run_both(256, 128, 1024, ns=8, block_k=256)
        vx = sum(np.asarray(t, np.float64) for t in Sx)
        vp = sum(np.asarray(t, np.float64) for t in Sp)
        rel = np.max(np.abs(vx - vp) / np.maximum(np.abs(vx), 1e-300))
        assert rel < 4e-16

    def test_unaligned_shapes_padded(self):
        Sx, Sp = _run_both(200, 136, 272, ns=6, block_k=128)
        vx = sum(np.asarray(t, np.float64) for t in Sx)
        vp = sum(np.asarray(t, np.float64) for t in Sp)
        rel = np.max(np.abs(vx - vp) / np.maximum(np.abs(vx), 1e-300))
        assert rel < 4e-16

    @pytest.mark.parametrize("ns", [3, 12])
    def test_split_counts(self, ns):
        Sx, Sp = _run_both(128, 128, 256, ns=ns, block_k=128)
        vx = sum(np.asarray(t, np.float64) for t in Sx)
        vp = sum(np.asarray(t, np.float64) for t in Sp)
        rel = np.max(np.abs(vx - vp) / np.maximum(np.abs(vx), 1e-300))
        assert rel < 4e-16
