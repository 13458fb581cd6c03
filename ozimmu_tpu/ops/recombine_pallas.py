"""Fused Pallas recombination: all slice-pair MXU matmuls + extended
accumulation in one kernel, no partial products ever touching HBM.

The XLA-op path (ops/recombine.py) materializes each t-group's int32
partial product in HBM between matmuls — ~ns round trips of the m*n int32
buffer, exactly the structure SURVEY.md §7 flags as the thing NOT to copy
from the reference (one-kernel-per-pair, gemm.cu:385-403).  This kernel
keeps everything on-chip:

  grid (m/BM, n/BN, k/BK), k innermost ("arbitrary" = sequential):
    - per step, DMA pipelines bring in A digits [ns, BM, BK] and
      B digits [ns, BK, BN];
    - every scheduled t-group's pair products run on the MXU and are
      accumulated into a per-group int32 VMEM accumulator.  This is
      provably overflow-free: the schedule's chunk cap
      (schedule.max_safe_pairs_per_group) bounds the group's magnitude
      over the FULL contraction length, a fortiori over any prefix of
      k-steps;
    - only the final k step pays floating-point cost: each group's int32
      total is split exactly into two f32 terms (16-bit halves) and
      folded into a triple-f32 accumulator, renormalized, and emitted as
      [3, BM, BN].

Keeping the accumulation in int32 until the end matters twice over: the
per-step VPU work drops from ~2*G triple-float folds (~13 f32 ops each)
to G int32 adds — without it the fold costs as much VPU time as the MXU
matmuls cost MXU time — and the result becomes bit-identical to the XLA
path (ops/recombine.py), which computes exactly the same int32 group
totals and folds them in the same order.

x64 note: Mosaic on this toolchain cannot legalize the int64 values that
x64-mode tracing injects into grid index maps, so the pallas_call is
traced under ``jax.enable_x64(False)`` — every dtype here is explicit, so
the kernel is bit-identical either way.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schedule import group_schedule
from . import tf32x3
from .recombine import acc_shift

Triple = Tuple[jax.Array, jax.Array, jax.Array]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fold_experiment() -> str:
    """Measurement-only fold-variant switch (read at trace time).  Empty
    (production) = the exact triple-f32 fold; "double2" = the inexact
    2-component falsification variant documented in the kernel below."""
    import os

    return os.environ.get("OZIMMU_FOLD_EXPERIMENT", "")


def _make_kernel(num_split: int, b: int, k_true: int):
    # group caps derive from the true contraction length (zero padding
    # cannot increase magnitudes) and must match the XLA path's grouping
    groups = group_schedule(num_split, k_true, b)
    shift = acc_shift(num_split, b)

    def kernel(da_ref, db_ref, o0_ref, o1_ref, o2_ref, *gacc):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            for gref in gacc:
                gref[:] = jnp.zeros_like(gref)

        for g, gref in zip(groups, gacc):
            d = gref[:]
            for (i, j) in g.pairs:
                d = d + jax.lax.dot_general(
                    da_ref[i - 1], db_ref[j - 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            gref[:] = d

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            acc = (
                jnp.zeros_like(o0_ref),
                jnp.zeros_like(o0_ref),
                jnp.zeros_like(o0_ref),
            )
            if _fold_experiment() == "double2":
                # MEASUREMENT-ONLY fold variant (OZIMMU_FOLD_EXPERIMENT=
                # double2): a 2-component cascade (7 f32 ops/term) instead
                # of the exact 3-component one (13 ops/term).  ~48-bit
                # accumulator — NOT exact, never a production path; exists
                # to falsify "the fold cost is reducible": if even this
                # ~2x-cheaper fold doesn't move end-to-end time, the fold
                # is VPU-issue-slot-bound and §11's speed-of-light claim
                # closes (VERDICT r4 weak #3 / next #8).
                d0 = jnp.zeros_like(o0_ref)
                d1 = jnp.zeros_like(o0_ref)
                for g, gref in zip(groups, gacc):
                    d = gref[:]
                    w = g.weight_log2(b) + shift
                    hi = jax.lax.shift_right_arithmetic(d, 16)
                    lo = d - jax.lax.shift_left(hi, 16)
                    for term in (
                        hi.astype(jnp.float32) * np.float32(2.0 ** (w + 16)),
                        lo.astype(jnp.float32) * np.float32(2.0**w),
                    ):
                        s, e = tf32x3.two_sum(d0, term)
                        d0, d1 = s, d1 + e
                acc = (d0, d1, jnp.zeros_like(d0))
            else:
                for g, gref in zip(groups, gacc):
                    d = gref[:]
                    w = g.weight_log2(b) + shift
                    hi = jax.lax.shift_right_arithmetic(d, 16)
                    lo = d - jax.lax.shift_left(hi, 16)
                    acc = tf32x3.add_term(
                        acc, hi.astype(jnp.float32) * np.float32(2.0 ** (w + 16))
                    )
                    acc = tf32x3.add_term(
                        acc, lo.astype(jnp.float32) * np.float32(2.0**w)
                    )
            t = tf32x3.renorm(acc)
            o0_ref[:] = t[0]
            o1_ref[:] = t[1]
            o2_ref[:] = t[2]

    return kernel, len(groups)


def _pick_blocks(ns: int, n_groups: int, m: int, n: int, k: int,
                 block_m: int, block_n: int, block_k: int):
    """Shrink the k block until the double-buffered digit slabs, the
    per-group int32 accumulators, and the output triple fit in ~12 MiB of
    the core's ~16 MiB VMEM."""
    import os

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    budget = int(
        float(os.environ.get("OZIMMU_VMEM_BUDGET_MB", 12)) * 1024 * 1024
    )
    bm0, bn0, bk0 = bm, bn, bk
    while True:
        slabs = 2 * ns * bk * (bm + bn)  # double-buffered int8 in-blocks
        accs = 4 * (n_groups + 3) * bm * bn  # int32 group accs + f32 triple
        if slabs + accs <= budget or (bk <= 128 and bm <= 128 and bn <= 128):
            break
        # shrink while preserving the (8, 128) tile granule
        if bk > 128:
            bk = max(128, (bk // 2 // 128) * 128)
        elif max(bm, bn) > 128:
            if bm >= bn:
                bm = max(128, (bm // 2 // 128) * 128)
            else:
                bn = max(128, (bn // 2 // 128) * 128)
    if (bm, bn, bk) != (bm0, bn0, bk0):
        # observable in bench logs (see split_pallas: calibration guard)
        from ..utils.log import log

        log(
            f"recombine_pallas: VMEM model shrank blocks "
            f"({bm0}, {bn0}, {bk0}) -> ({bm}, {bn}, {bk}) at ns={ns} "
            f"(m={m} n={n} k={k})"
        )
    return bm, bn, bk


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8), inline=True)
def recombine_pallas(
    da: jax.Array,
    db: jax.Array,
    num_split: int,
    b: int,
    k: int,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
) -> Triple:
    """Drop-in fused replacement for :func:`ops.recombine.recombine`.

    ``da``: int8 [ns, m, k]; ``db``: int8 [ns, k, n].  Returns the same
    2^ACC_SHIFT-scaled triple-f32 accumulator [m, n], bit-identical to the
    XLA path.
    """
    ns, m, k_in = da.shape
    n = db.shape[2]
    kernel, n_groups = _make_kernel(num_split, b, k)
    bm, bn, bk = _pick_blocks(ns, n_groups, m, n, k_in, block_m, block_n, block_k)
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    k_pad = _round_up(k_in, bk)
    # zero padding is exact: zero digits contribute zero products (the
    # reference's padded-ld trick, gemm.cu:369-372)
    if (m_pad, k_pad) != (m, k_in):
        da = jnp.pad(da, ((0, 0), (0, m_pad - m), (0, k_pad - k_in)))
    if (k_pad, n_pad) != (k_in, n):
        db = jnp.pad(db, ((0, 0), (0, k_pad - k_in), (0, n_pad - n)))

    grid = (m_pad // bm, n_pad // bn, k_pad // bk)
    out_sds = jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32)

    with jax.enable_x64(False):
        o0, o1, o2 = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(out_sds, out_sds, out_sds),
            in_specs=[
                pl.BlockSpec(
                    (ns, bm, bk), lambda i, j, kk: (0, i, kk), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (ns, bk, bn), lambda i, j, kk: (0, kk, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bm, bn), jnp.int32) for _ in range(n_groups)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n_pad * k_pad * num_split * (num_split + 1) // 2,
                bytes_accessed=ns * (m_pad * k_pad + k_pad * n_pad) + 12 * m_pad * n_pad,
                transcendentals=0,
            ),
            interpret=interpret,
        )(da, db)

    if (m_pad, n_pad) != (m, n):
        o0, o1, o2 = o0[:m, :n], o1[:m, :n], o2[:m, :n]
    return (o0, o1, o2)
