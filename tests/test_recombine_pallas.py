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

    def test_multi_k_block_bitwise(self):
        """Group accumulation stays int32 across k steps, so the fold order
        (and every rounding) matches the XLA path exactly."""
        Sx, Sp = _run_both(256, 128, 1024, ns=8, block_k=256)
        for x, p in zip(Sx, Sp):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(p))

    def test_unaligned_shapes_padded(self):
        Sx, Sp = _run_both(200, 136, 272, ns=6, block_k=128)
        for x, p in zip(Sx, Sp):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(p))

    @pytest.mark.parametrize(
        "ns", [3, pytest.param(12, marks=pytest.mark.slow)]
    )
    def test_split_counts(self, ns):
        Sx, Sp = _run_both(128, 128, 256, ns=ns, block_k=128)
        for x, p in zip(Sx, Sp):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(p))


class TestPickBlocks:
    def test_tile_granule_preserved(self):
        """Regression: VMEM-fit shrinking must keep blocks on the (8, 128)
        granule — k=640-style shapes once produced bk=320//2=160-ish blocks
        that Mosaic rejects."""
        import os
        from ozimmu_tpu.ops.recombine_pallas import _pick_blocks

        os.environ.pop("OZIMMU_VMEM_BUDGET_MB", None)
        for ns, g in [(9, 9), (18, 18), (13, 13)]:
            for m, n, k in [(512, 640, 640), (4096, 4096, 4096), (129, 257, 641)]:
                bm, bn, bk = _pick_blocks(ns, g, m, n, k, 256, 256, 1024)
                assert bm % 128 == 0 and bn % 128 == 0 and bk % 128 == 0, (
                    ns, m, n, k, bm, bn, bk)
