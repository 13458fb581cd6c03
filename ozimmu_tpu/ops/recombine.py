"""MXU recombination: slice-pair int8 matmuls + exact extended accumulation.

Replaces the reference's per-pair loop (src/gemm.cu:385-403: 45 separate
``cublasGemmEx`` int8 GEMMs + 45 f64 accumulate kernels for ns=9) with a
TPU-first structure:

  1. Pairs sharing ``t = i + j`` have the same recombination weight
     ``2^(2 - b t)``, so their partial products are summed *inside the
     MXU contraction*: the group's A slices are concatenated along k and
     the B slices along k, turning g pairs into ONE int8 dot_general of
     contraction length ``g*k`` (int32 accumulate).  The schedule's group
     chunking guarantees no int32 overflow (schedule.group_schedule).
     ~ns matmuls instead of ns(ns+1)/2 kernel launches.

  2. Each group's int32 result is split exactly into two f32 terms
     (high/low 16-bit halves) and folded into a triple-float32 accumulator
     (~71-bit) in ascending-t order — deterministic, and strictly more
     accurate than the reference's per-step f64 rounding
     (gemm.cu:77-102).

Scaling: accumulation happens in a ``2^ACC_SHIFT``-biased space so every
f32 component stays inside the normal-number range (TPU flushes
denormals).  ``ACC_SHIFT = b*(ns+1) - 64`` puts the smallest group weight
at exactly 2^-62 and the largest possible head magnitude at
``2^(b(ns-1) - 31) <= 2^88``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schedule import group_schedule
from . import tf32x3

Triple = tf32x3.Triple


def acc_shift(num_split: int, b: int) -> int:
    """Exponent bias of the accumulation space (see module docstring)."""
    return b * (num_split + 1) - 64


def _group_dot(da: jax.Array, db: jax.Array, pairs) -> jax.Array:
    """Sum of A_i @ B_j over the group's pairs as one int8->int32 matmul.

    ``da``: int8 [ns, m, k]; ``db``: int8 [ns, k, n].
    Identity: sum_g A_{i_g} @ B_{j_g} == concat_k(A_{i_g}) @ concat_k(B_{j_g}).
    """
    if len(pairs) == 1:
        i, j = pairs[0]
        a = da[i - 1]
        bm = db[j - 1]
    else:
        a = jnp.concatenate([da[i - 1] for i, _ in pairs], axis=1)
        bm = jnp.concatenate([db[j - 1] for _, j in pairs], axis=0)
    return jax.lax.dot_general(
        a, bm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def use_pallas_engine(m: int, n: int, k: int) -> bool:
    """Engine selection: OZIMMU_ENGINE = pallas | xla | auto (default).

    Auto picks the fused Pallas kernel on TPU backends for shapes large
    enough to tile (the XLA path serves tiny shapes and non-TPU backends).
    Read at trace time.
    """
    import os

    mode = os.environ.get("OZIMMU_ENGINE", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu" and min(m, n, k) >= 128


def recombine_auto(
    da: jax.Array, db: jax.Array, num_split: int, b: int, k: int
) -> Triple:
    """Dispatch between the fused Pallas kernel and the XLA-op path."""
    m, n = da.shape[1], db.shape[2]
    if use_pallas_engine(m, n, k):
        from .recombine_pallas import recombine_pallas

        return recombine_pallas(da, db, num_split, b, k)
    return recombine(da, db, num_split, b, k)


@partial(jax.jit, static_argnums=(2, 3, 4), inline=True)
def recombine(
    da: jax.Array,
    db: jax.Array,
    num_split: int,
    b: int,
    k: int,
) -> Triple:
    """Weighted recombination of all scheduled slice pairs.

    Returns the triple-f32 accumulator ``S_shifted`` [m, n] such that the
    mathematical partial result is::

        sum_{i+j<=ns+1} (A_i @ B_j) * 2^(2 - b(i+j))
            == S_shifted * 2^(-ACC_SHIFT)

    The caller folds ``2^(pa + pb + ACC_SHIFT^-1)`` in the epilogue.
    """
    totals = group_totals(da, db, num_split, k, b)
    return fold_group_totals(totals, num_split, k, b)


def group_totals(da, db, num_split: int, k: int, b: int):
    """Int32 partial products of every scheduled t-group (a list, in
    ascending-t schedule order).  Exact — summable across k-shards or
    k-chunks without overflow (the schedule's chunk cap bounds the FULL
    contraction; pass the GLOBAL k)."""
    return [
        _group_dot(da, db, g.pairs) for g in group_schedule(num_split, k, b)
    ]


def fold_group_totals(totals, num_split: int, k: int, b: int) -> Triple:
    """Deterministic fold of the int32 group totals into the triple-f32
    accumulator (ascending t; each total split exactly into two f32
    16-bit-half terms)."""
    shift = acc_shift(num_split, b)
    m, n = totals[0].shape
    acc = tf32x3.zeros((m, n))
    for g, d in zip(group_schedule(num_split, k, b), totals):
        w = g.weight_log2(b) + shift  # in [-62, ...]
        hi = jax.lax.shift_right_arithmetic(d, np.int32(16))  # [-2^15, 2^15)
        lo = d - jax.lax.shift_left(hi, np.int32(16))  # [0, 2^16)
        acc = tf32x3.add_term(acc, hi.astype(jnp.float32) * np.float32(2.0 ** (w + 16)))
        acc = tf32x3.add_term(acc, lo.astype(jnp.float32) * np.float32(2.0**w))
    return tf32x3.renorm(acc)
