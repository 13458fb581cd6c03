"""Distributed 2D-sharded FP64 GEMM over a JAX device mesh.

The reference is strictly single-GPU (SURVEY.md §2: no NCCL/MPI, one CUDA
stream); this layer is the TPU-native scale-out the north star requires
(BASELINE.json configs[4]).  The problem decomposition makes distribution
cheap in exactly one place, and this implementation exploits it: the int8
slice planes are ~8x smaller than the f64 operands they encode, so all
cross-device traffic is int8 (plus tiny int32 exponent vectors) and rides
ICI.  No f64 word ever crosses a chip boundary.

Algorithm (SUMMA-style, blocks on a (x, y) mesh):

  A [m, k] sharded P(x, y)   block [m/x, k/y] per device
  B [k, n] sharded P(x, y)   block [k/x, n/y]

  1. row/col max exponents: local int32 max + ``lax.pmax`` along the
     contraction axis (the distributed equivalent of the in-kernel
     reduction in reference split.cu:14-67);
  2. local mantissa split -> int8 digit planes (exact, embarrassingly
     parallel);
  3. ``all_gather`` A's planes along ``y`` and B's planes along ``x``
     (int8, tiled) so every device owns full-k slabs;
  4. local fused MXU recombination + exact epilogue -> C block P(x, y).

Communication per device: ns*(m/x)*k + ns*k*(n/y) int8 bytes — for ns=9
that is ~9/8 the bytes of ONE f64 operand gather, vs 8x that for a naive
f64 SUMMA.  XLA overlaps the (independent) A/B gathers with the splits.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.f64x import F64X
from ..ops.pack import pack_f64x
from ..ops.recombine import acc_shift, recombine_auto
from ..ops.split import row_exponent, split_with_row_exp
from ..schedule import bits_per_int8

try:  # jax>=0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = jax.shard_map
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _local_split(x: F64X, mesh_axis: Optional[str], ns: int, b: int, axis: int):
    """Split a k-sharded block against the GLOBAL max exponent along the
    contraction axis (``axis`` of the local block)."""
    e_row = row_exponent(x, axis)
    if mesh_axis is not None:
        e_row = jax.lax.pmax(e_row, mesh_axis)
    return split_with_row_exp(x, e_row, ns, b, axis=axis)


def sharded_gemm_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
):
    """Build the jittable sharded GEMM: (F64X, F64X) -> F64X.

    Input A is sharded P(x, y), B is sharded P(x, y), output C is P(x, y).
    ``k_global`` fixes the chunk-width rule (must be A's global k).
    """
    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")

    spec2d = P(axis_x, axis_y)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d, spec2d, spec2d, spec2d),
        out_specs=(spec2d, spec2d),
        check_vma=False,
    )
    def _kernel(a_hi, a_lo, b_hi, b_lo):
        a = F64X(a_hi, a_lo)  # local block [m/x, k/y]
        bm = F64X(b_hi, b_lo)  # local block [k/x, n/y]

        # 1-2. global row/col exponents + local split (natural layouts,
        # no plane transposes)
        da, pa = _local_split(a, axis_y, num_split, b, axis=1)  # [ns, m/x, k/y]
        db, pb = _local_split(bm, axis_x, num_split, b, axis=0)  # [ns, k/x, n/y]

        # 3. int8 plane gathers along the contraction axis
        da_full = jax.lax.all_gather(da, axis_y, axis=2, tiled=True)  # [ns, m/x, k]
        db_full = jax.lax.all_gather(db, axis_x, axis=1, tiled=True)  # [ns, k, n/y]

        # 4. local recombination + pack
        S = recombine_auto(da_full, db_full, num_split, b, k_global)
        E = (pa[:, None] + pb[None, :] - acc_shift(num_split, b)).astype(jnp.int32)
        out = pack_f64x(S, E)
        return out.hi, out.lo

    def fn(a: F64X, bm: F64X) -> F64X:
        hi, lo = _kernel(a.hi, a.lo, bm.hi, bm.lo)
        return F64X(hi, lo)

    return fn


def sharded_gemm_k_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_k: str = "k",
):
    """1D k-sharded (contraction-parallel) DGEMM: A [m, k/P], B [k/P, n].

    The third parallelism strategy, for the tall-contraction regime
    (huge k, modest m*n — e.g. Gram matrices, reductions of long feature
    streams) where 2D SUMMA sharding has nothing to split.  Each device
    computes its local int32 group totals (exact partials of the full-k
    contraction, overflow-safe by the schedule's chunk cap) and a
    ``psum_scatter`` along the k axis both reduces them and leaves C
    row-sharded — int32 sums are order-independent, so the result is
    bit-identical to the single-chip engine.  Cross-chip traffic is the
    int32 group totals (the m*n-proportional analogue of the int8-plane
    gathers of the other variants).

    In/out: A, B sharded ``P(None, 'k')`` / ``P('k', None)``; C comes
    back ``P('k', None)`` (row-sharded).  m must divide by the mesh size.
    """
    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    from ..ops.recombine import fold_group_totals, group_totals

    spec_a = P(None, axis_k)
    spec_b = P(axis_k, None)
    spec_c = P(axis_k, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_a, spec_a, spec_b, spec_b),
        out_specs=(spec_c, spec_c),
        check_vma=False,
    )
    def _kernel(a_hi, a_lo, b_hi, b_lo):
        a = F64X(a_hi, a_lo)  # local [m, k/P]
        bm = F64X(b_hi, b_lo)  # local [k/P, n]

        da, pa = _local_split(a, axis_k, num_split, b, axis=1)
        db, pb = _local_split(bm, axis_k, num_split, b, axis=0)

        totals = group_totals(da, db, num_split, k_global, b)
        # reduce the exact int32 partials over k AND scatter C rows
        totals = [
            jax.lax.psum_scatter(t, axis_k, scatter_dimension=0, tiled=True)
            for t in totals
        ]
        S = fold_group_totals(totals, num_split, k_global, b)
        # row scales for the local row chunk
        m_local = totals[0].shape[0]
        row0 = jax.lax.axis_index(axis_k) * m_local
        pa_c = jax.lax.dynamic_slice_in_dim(pa, row0, m_local)
        E = (pa_c[:, None] + pb[None, :] - acc_shift(num_split, b)).astype(jnp.int32)
        out = pack_f64x(S, E)
        return out.hi, out.lo

    def fn(a: F64X, bm: F64X) -> F64X:
        hi, lo = _kernel(a.hi, a.lo, bm.hi, bm.lo)
        return F64X(hi, lo)

    return fn


def sharded_gemm_ring_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
):
    """Ring-streamed (Cannon) DGEMM for SQUARE meshes: the huge-problem
    variant.

    The all-gather formulation (:func:`sharded_gemm_fn`) materializes
    full-k int8 slabs on every device — at the north-star scale
    (131072^3 on 16 chips, BASELINE.json configs[4]) that is tens of GB
    per operand and crowds HBM.  This variant streams instead, Cannon
    style: after an initial skew (A's mesh row i rotated by i, B's mesh
    column j rotated by j — done in log2(q) masked ``ppermute`` rounds),
    device (i, j) holds A k-panel (i+j+s) mod q and B k-panel (i+j+s)
    mod q at every step s, so one neighbour ``ppermute`` per ring per
    step keeps the panels aligned.  Peak memory is TWO panels per
    operand instead of the full-k slab (q-fold less); total ICI bytes
    are the same int8 planes, and XLA overlaps the step-s+1 permute
    with the step-s MXU contraction.

    The k contraction accumulates exact int32 group totals across steps
    (the schedule's chunk cap bounds the FULL k), folded once at the
    end — results are bit-identical to the single-chip engine and to
    :func:`sharded_gemm_fn`.
    """
    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    from ..ops.recombine import fold_group_totals, group_totals

    x_sz, y_sz = (mesh.shape[axis_x], mesh.shape[axis_y])
    if x_sz != y_sz:
        raise ValueError(
            f"ring (Cannon) DGEMM needs a square mesh, got {x_sz}x{y_sz}; "
            "use sharded_gemm_fn (all-gather) instead"
        )
    q = x_sz
    spec2d = P(axis_x, axis_y)

    def _skew(planes, ring_axis, amount_idx):
        """Rotate ``planes`` along ``ring_axis`` by a per-device amount
        (the other mesh coordinate), in log2(q) masked ppermute rounds."""
        r = 0
        while (1 << r) < q:
            sh = 1 << r
            rot = jax.lax.ppermute(
                planes, ring_axis, [((p + sh) % q, p) for p in range(q)]
            )
            take = ((amount_idx >> r) & 1) == 1
            planes = jnp.where(take, rot, planes)
            r += 1
        return planes

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d, spec2d, spec2d, spec2d),
        out_specs=(spec2d, spec2d),
        check_vma=False,
    )
    def _kernel(a_hi, a_lo, b_hi, b_lo):
        a = F64X(a_hi, a_lo)  # local block [m/x, k/y]: A k-panel j
        bm = F64X(b_hi, b_lo)  # local block [k/x, n/y]: B k-panel i

        da, pa = _local_split(a, axis_y, num_split, b, axis=1)
        db, pb = _local_split(bm, axis_x, num_split, b, axis=0)

        i_idx = jax.lax.axis_index(axis_x)
        j_idx = jax.lax.axis_index(axis_y)
        # skew: device (i, j) ends up holding A panel (i+j)%q and
        # B panel (i+j)%q
        da = _skew(da, axis_y, i_idx)
        db = _skew(db, axis_x, j_idx)

        shift_y = [((p + 1) % q, p) for p in range(q)]  # dst j <- src j+1
        shift_x = [((p + 1) % q, p) for p in range(q)]
        totals = group_totals(da, db, num_split, k_global, b)
        for _ in range(1, q):
            da = jax.lax.ppermute(da, axis_y, shift_y)
            db = jax.lax.ppermute(db, axis_x, shift_x)
            step = group_totals(da, db, num_split, k_global, b)
            totals = [t + s for t, s in zip(totals, step)]

        S = fold_group_totals(totals, num_split, k_global, b)
        E = (pa[:, None] + pb[None, :] - acc_shift(num_split, b)).astype(jnp.int32)
        out = pack_f64x(S, E)
        return out.hi, out.lo

    def fn(a: F64X, bm: F64X) -> F64X:
        hi, lo = _kernel(a.hi, a.lo, bm.hi, bm.lo)
        return F64X(hi, lo)

    return fn


def sharded_gemm(
    a: np.ndarray,
    b: np.ndarray,
    num_split: int,
    mesh: Mesh,
    axis_x: str = "x",
    axis_y: str = "y",
    ring: bool = False,
) -> np.ndarray:
    """Host-convenience wrapper: shard numpy operands, run, gather back.

    ``ring=True`` selects the Cannon-streamed variant (square meshes,
    q-fold lower peak memory — for problems whose gathered int8 slabs
    would not fit in HBM).
    """
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    spec = NamedSharding(mesh, P(axis_x, axis_y))
    ax = F64X.from_numpy(np.ascontiguousarray(a, np.float64))
    bx = F64X.from_numpy(np.ascontiguousarray(b, np.float64))
    ax = F64X(jax.device_put(ax.hi, spec), jax.device_put(ax.lo, spec))
    bx = F64X(jax.device_put(bx.hi, spec), jax.device_put(bx.lo, spec))
    make = sharded_gemm_ring_fn if ring else sharded_gemm_fn
    fn = jax.jit(make(mesh, num_split, k, axis_x, axis_y))
    out = fn(ax, bx)
    return out.to_numpy().reshape(m, n)


def make_mesh_2d(n_devices: Optional[int] = None, axis_x: str = "x", axis_y: str = "y") -> Mesh:
    """Largest 2D mesh (x*y = n) with x as square as possible."""
    devs = jax.devices()
    n = n_devices or len(devs)
    x = int(np.floor(np.sqrt(n)))
    while n % x:
        x -= 1
    return Mesh(np.array(devs[:n]).reshape(x, n // x), (axis_x, axis_y))
