"""Fused Pallas recombination: all slice-pair MXU matmuls + extended
accumulation in one kernel, no partial products ever touching HBM.

The XLA-op path (ops/recombine.py) materializes each t-group's int32
partial product in HBM between matmuls — ~ns round trips of the m*n int32
buffer, exactly the structure SURVEY.md §7 flags as the thing NOT to copy
from the reference (one-kernel-per-pair, gemm.cu:385-403).  This kernel
keeps everything on-chip:

  grid (m/BM, n/BN, k/BK), k innermost ("arbitrary" = sequential):
    - per step, DMA pipelines bring in A digits [ns, BM, BK] and
      B digits [ns, BK, BK->BN];
    - for every scheduled t-group: D_t = sum of pair products on the MXU
      (int32, provably overflow-free per the schedule's chunk cap —
      a fortiori for a BK-slab of the contraction);
    - D_t is split exactly into two f32 terms (16-bit halves) and folded
      into a triple-f32 accumulator held in VMEM scratch;
    - the final k step renormalizes and emits the triple [3, BM, BN].

Numerics: per-step folding adds (k/BK)*ns*2 exact terms per element in a
fixed order — deterministic, with accumulated error < 2^-60 relative,
far below the f64 target (see tests/test_recombine_pallas.py for the
cross-check against the XLA path and the hostref oracle).

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


def _make_kernel(num_split: int, b: int, k_true: int):
    # group caps derive from the true contraction length (zero padding
    # cannot increase magnitudes) and must match the XLA path's grouping
    groups = group_schedule(num_split, k_true, b)
    shift = acc_shift(num_split, b)

    def kernel(da_ref, db_ref, o0_ref, o1_ref, o2_ref, a0, a1, a2):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            a0[:] = jnp.zeros_like(a0)
            a1[:] = jnp.zeros_like(a1)
            a2[:] = jnp.zeros_like(a2)

        acc = (a0[:], a1[:], a2[:])
        for g in groups:
            d = None
            for (i, j) in g.pairs:
                p = jax.lax.dot_general(
                    da_ref[i - 1], db_ref[j - 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                d = p if d is None else d + p
            w = g.weight_log2(b) + shift
            hi = jax.lax.shift_right_arithmetic(d, 16)
            lo = d - jax.lax.shift_left(hi, 16)
            acc = tf32x3.add_term(acc, hi.astype(jnp.float32) * np.float32(2.0 ** (w + 16)))
            acc = tf32x3.add_term(acc, lo.astype(jnp.float32) * np.float32(2.0**w))
        a0[:], a1[:], a2[:] = acc

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            t = tf32x3.renorm((a0[:], a1[:], a2[:]))
            o0_ref[:] = t[0]
            o1_ref[:] = t[1]
            o2_ref[:] = t[2]

    return kernel


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8), inline=True)
def recombine_pallas(
    da: jax.Array,
    db: jax.Array,
    num_split: int,
    b: int,
    k: int,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,  # [ns,256,1024] int8 blocks double-buffered blow VMEM
    interpret: bool = False,
) -> Triple:
    """Drop-in fused replacement for :func:`ops.recombine.recombine`.

    ``da``: int8 [ns, m, k]; ``db``: int8 [ns, k, n].  Returns the same
    2^ACC_SHIFT-scaled triple-f32 accumulator [m, n].
    """
    ns, m, k_in = da.shape
    n = db.shape[2]
    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k_in, 128))
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    k_pad = _round_up(k_in, bk)
    # zero padding is exact: zero digits contribute zero products (the
    # reference's padded-ld trick, gemm.cu:369-372)
    if (m_pad, k_pad) != (m, k_in):
        da = jnp.pad(da, ((0, 0), (0, m_pad - m), (0, k_pad - k_in)))
    if (k_pad, n_pad) != (k_in, n):
        db = jnp.pad(db, ((0, 0), (0, k_pad - k_in), (0, n_pad - n)))

    kernel = _make_kernel(num_split, b, k)
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
                pltpu.VMEM((bm, bn), jnp.float32),
                pltpu.VMEM((bm, bn), jnp.float32),
                pltpu.VMEM((bm, bn), jnp.float32),
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
