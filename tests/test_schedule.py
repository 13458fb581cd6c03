"""Unit tests for slice-pair scheduling and chunk-width rules."""

import math

import numpy as np
import pytest

from ozimmu_tpu.schedule import (
    bits_per_int8,
    group_schedule,
    max_safe_pairs_per_group,
    pair_schedule,
)


class TestBitsPerInt8:
    def test_reference_formula(self):
        # b = min(7, (31 - ceil(log2 k)) // 2)  (reference split.cu:520-536)
        for k in [1, 2, 3, 7, 8, 1023, 1024, 1025, 4096, 65536, 2**17, 2**17 + 1, 2**20]:
            log2k = 0 if k <= 1 else math.ceil(math.log2(k))
            expected = min(7, (31 - log2k) // 2)
            assert bits_per_int8(k) == expected, k

    def test_known_values(self):
        assert bits_per_int8(0) == 0
        assert bits_per_int8(1) == 7
        assert bits_per_int8(1024) == 7
        assert bits_per_int8(2**17) == 7
        assert bits_per_int8(2**17 + 1) == 6
        assert bits_per_int8(2**19) == 6

    def test_no_int32_overflow_single_pair(self):
        for k in [1, 100, 1024, 2**17, 2**20, 2**25]:
            b = bits_per_int8(k)
            if b > 0:
                assert k * (2**b - 1) ** 2 <= 2**31 - 1


class TestPairSchedule:
    @pytest.mark.parametrize("ns", range(1, 19))
    def test_count(self, ns):
        assert len(pair_schedule(ns)) == ns * (ns + 1) // 2

    @pytest.mark.parametrize("ns", [3, 9, 18])
    def test_constraints_and_order(self, ns):
        pairs = pair_schedule(ns)
        sums = [i + j for i, j in pairs]
        assert sums == sorted(sums)  # ascending significance order
        for i, j in pairs:
            assert 1 <= i <= ns and 1 <= j <= ns
            assert i + j <= ns + 1
        assert len(set(pairs)) == len(pairs)

    def test_ns3_exact(self):
        # reference config.cu:86-92 emits j ascending within each sum
        assert pair_schedule(3) == [(1, 1), (2, 1), (1, 2), (3, 1), (2, 2), (1, 3)]


class TestGroupSchedule:
    @pytest.mark.parametrize("ns,k", [(3, 1024), (9, 1024), (18, 64), (9, 2**17)])
    def test_flatten_preserves_order(self, ns, k):
        groups = group_schedule(ns, k)
        flat = [p for g in groups for p in g.pairs]
        assert flat == pair_schedule(ns)

    def test_groups_share_t(self):
        for g in group_schedule(9, 1024):
            assert all(i + j == g.t for i, j in g.pairs)

    def test_overflow_safety(self):
        for k in [64, 1024, 2**17]:
            b = bits_per_int8(k)
            for g in group_schedule(18, k, b):
                assert len(g.pairs) * k * (2**b - 1) ** 2 <= 2**31 - 1

    def test_max_safe_pairs(self):
        assert max_safe_pairs_per_group(2**17, 7) == 1
        assert max_safe_pairs_per_group(1024, 7) >= 18

    def test_weights(self):
        groups = group_schedule(3, 16)
        b = bits_per_int8(16)
        ws = {g.t: g.weight_log2(b) for g in groups}
        assert ws == {2: 2 - 2 * b, 3: 2 - 3 * b, 4: 2 - 4 * b}
