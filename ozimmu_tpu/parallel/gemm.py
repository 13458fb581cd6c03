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


def _epilogue_local(S, E, alpha: float, beta: float, c: Optional[F64X]) -> F64X:
    """``alpha*(acc) + beta*c`` on the LOCAL C block — THE single-chip
    epilogue (core.gemm._epilogue_SE; reference axby gemm.cu:124-158).
    It is elementwise, so applying it per shard is distribution-invariant
    and the result stays bitwise-identical to the single-chip engine —
    one shared implementation, so a rounding-contract change can never
    silently diverge between the local and distributed paths."""
    from ..core.gemm import _epilogue_SE

    return _epilogue_SE(S, E, alpha, beta, c)


def _wrap_kernel(mesh, body, spec_a, spec_b, spec_c, with_c: bool):
    """shard_map-wrap ``body(a, b[, c]) -> F64X`` over F64X hi/lo planes."""
    if with_c:
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec_a, spec_a, spec_b, spec_b, spec_c, spec_c),
            out_specs=(spec_c, spec_c),
            check_vma=False,
        )
        def _kernel(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo):
            out = body(F64X(a_hi, a_lo), F64X(b_hi, b_lo), F64X(c_hi, c_lo))
            return out.hi, out.lo

        def fn(a: F64X, bm: F64X, c: F64X) -> F64X:
            hi, lo = _kernel(a.hi, a.lo, bm.hi, bm.lo, c.hi, c.lo)
            return F64X(hi, lo)
    else:
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec_a, spec_a, spec_b, spec_b),
            out_specs=(spec_c, spec_c),
            check_vma=False,
        )
        def _kernel(a_hi, a_lo, b_hi, b_lo):
            out = body(F64X(a_hi, a_lo), F64X(b_hi, b_lo), None)
            return out.hi, out.lo

        def fn(a: F64X, bm: F64X) -> F64X:
            hi, lo = _kernel(a.hi, a.lo, bm.hi, bm.lo)
            return F64X(hi, lo)

    return fn


def sharded_gemm_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: float = 1.0,
    beta: float = 0.0,
):
    """Build the jittable sharded GEMM computing ``alpha*(a@b) + beta*c``.

    Returns ``fn(a, b)`` for beta == 0 or ``fn(a, b, c)`` otherwise — the
    full reference gemm contract (gemm.cu:524-653), distributed.  Input A
    is sharded P(x, y), B is sharded P(x, y), C (when present) and the
    output are P(x, y).  ``k_global`` fixes the chunk-width rule (must be
    A's global k).
    """
    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    alpha, beta = float(alpha), float(beta)

    spec2d = P(axis_x, axis_y)

    def _body(a: F64X, bm: F64X, c: Optional[F64X]) -> F64X:
        # a: local block [m/x, k/y]; bm: local block [k/x, n/y]
        # 1-2. global row/col exponents + local split (natural layouts,
        # no plane transposes)
        da, pa = _local_split(a, axis_y, num_split, b, axis=1)  # [ns, m/x, k/y]
        db, pb = _local_split(bm, axis_x, num_split, b, axis=0)  # [ns, k/x, n/y]

        # 3. int8 plane gathers along the contraction axis
        da_full = jax.lax.all_gather(da, axis_y, axis=2, tiled=True)  # [ns, m/x, k]
        db_full = jax.lax.all_gather(db, axis_x, axis=1, tiled=True)  # [ns, k, n/y]

        # 4. local recombination + exact epilogue
        S = recombine_auto(da_full, db_full, num_split, b, k_global)
        E = (pa[:, None] + pb[None, :] - acc_shift(num_split, b)).astype(jnp.int32)
        return _epilogue_local(S, E, alpha, beta, c)

    return _wrap_kernel(mesh, _body, spec2d, spec2d, spec2d, with_c=beta != 0.0)


def sharded_gemm_k_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_k: str = "k",
    alpha: float = 1.0,
    beta: float = 0.0,
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
    alpha, beta = float(alpha), float(beta)
    from ..ops.recombine import fold_group_totals, group_totals

    spec_a = P(None, axis_k)
    spec_b = P(axis_k, None)
    spec_c = P(axis_k, None)

    def _body(a: F64X, bm: F64X, c: Optional[F64X]) -> F64X:
        # a: local [m, k/P]; bm: local [k/P, n]; c: local rows [m/P, n]
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
        return _epilogue_local(S, E, alpha, beta, c)

    return _wrap_kernel(mesh, _body, spec_a, spec_b, spec_c, with_c=beta != 0.0)


def sharded_zgemm_k_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_k: str = "k",
    alpha: complex = 1.0 + 0j,
    beta: complex = 0.0 + 0j,
):
    """1D k-sharded (contraction-parallel) complex GEMM — the ZGEMM
    analogue of :func:`sharded_gemm_k_fn`, completing the variant matrix
    (tall-k complex Gram/covariance matrices).

    Each of the four pass combinations (reference gemm.cu:412-521)
    accumulates exact int32 group totals of the local k panel and
    ``psum_scatter``s them along k (order-independent int32 sums — the
    result is bitwise-identical to the single-chip complex engine); the
    shared complex fold then runs on the row-sharded C block.  Cross-chip
    traffic: 4x the int32 group totals of the real variant.

    In/out: A planes ``P(None, k)``, B planes ``P(k, None)``; C planes
    and the (re, im) output come back ``P(k, None)`` (row-sharded).
    """
    from ..core.gemm import ZGEMM_PASSES, _zfold_passes
    from ..ops.recombine import fold_group_totals, group_totals

    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    alpha, beta = complex(alpha), complex(beta)
    spec_a = P(None, axis_k)
    spec_b = P(axis_k, None)
    spec_c = P(axis_k, None)
    shift = np.int32(acc_shift(num_split, b))

    def _body(a_re, a_im, b_re, b_im, c_re, c_im):
        da, pa = {}, {}
        for idx, xx in ((0, a_re), (1, a_im)):
            da[idx], pa[idx] = _local_split(xx, axis_k, num_split, b, axis=1)
        db, pb = {}, {}
        for idx, xx in ((0, b_re), (1, b_im)):
            db[idx], pb[idx] = _local_split(xx, axis_k, num_split, b, axis=0)

        SEs = []
        for ap, bp in ZGEMM_PASSES:
            totals = group_totals(da[ap], db[bp], num_split, k_global, b)
            totals = [
                jax.lax.psum_scatter(t, axis_k, scatter_dimension=0, tiled=True)
                for t in totals
            ]
            S = fold_group_totals(totals, num_split, k_global, b)
            m_local = totals[0].shape[0]
            row0 = jax.lax.axis_index(axis_k) * m_local
            pa_c = jax.lax.dynamic_slice_in_dim(pa[ap], row0, m_local)
            E = (pa_c[:, None] + pb[bp][None, :] - shift).astype(jnp.int32)
            SEs.append((S, E))
        m_l, n_l = SEs[0][1].shape
        return _zfold_passes(SEs, m_l, n_l, alpha, beta, c_re, c_im)

    with_c = beta != 0
    in_specs = (spec_a,) * 4 + (spec_b,) * 4 + ((spec_c,) * 4 if with_c else ())

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(spec_c,) * 4,
        check_vma=False,
    )
    def _kernel(*planes):
        xs = [F64X(planes[2 * i], planes[2 * i + 1]) for i in range(len(planes) // 2)]
        if with_c:
            out_re, out_im = _body(*xs)
        else:
            out_re, out_im = _body(*xs, None, None)
        return out_re.hi, out_re.lo, out_im.hi, out_im.lo

    def fn(*xs):
        flat = []
        for x in xs:
            flat.extend((x.hi, x.lo))
        rh, rl, ih, il = _kernel(*flat)
        return F64X(rh, rl), F64X(ih, il)

    return fn


def _skew(planes, ring_axis, amount_idx, q):
    """Rotate ``planes`` along ``ring_axis`` by a per-device amount (the
    other mesh coordinate), in log2(q) masked ppermute rounds — the
    Cannon initial alignment."""
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


def sharded_gemm_ring_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: float = 1.0,
    beta: float = 0.0,
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
    alpha, beta = float(alpha), float(beta)
    from ..ops.recombine import fold_group_totals, group_totals

    x_sz, y_sz = (mesh.shape[axis_x], mesh.shape[axis_y])
    if x_sz != y_sz:
        raise ValueError(
            f"ring (Cannon) DGEMM needs a square mesh, got {x_sz}x{y_sz}; "
            "use sharded_gemm_fn (all-gather) instead"
        )
    q = x_sz
    spec2d = P(axis_x, axis_y)

    def _body(a: F64X, bm: F64X, c: Optional[F64X]) -> F64X:
        # a: local block [m/x, k/y]: A k-panel j; bm: [k/x, n/y]: B k-panel i
        da, pa = _local_split(a, axis_y, num_split, b, axis=1)
        db, pb = _local_split(bm, axis_x, num_split, b, axis=0)

        i_idx = jax.lax.axis_index(axis_x)
        j_idx = jax.lax.axis_index(axis_y)
        # skew: device (i, j) ends up holding A panel (i+j)%q and
        # B panel (i+j)%q
        da = _skew(da, axis_y, i_idx, q)
        db = _skew(db, axis_x, j_idx, q)

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
        return _epilogue_local(S, E, alpha, beta, c)

    return _wrap_kernel(mesh, _body, spec2d, spec2d, spec2d, with_c=beta != 0.0)


def sharded_gemm_stream_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: float = 1.0,
    beta: float = 0.0,
):
    """Panel-streamed (true SUMMA) DGEMM for ANY mesh shape — the
    rectangular-mesh huge-problem variant (VERDICT r4 item 4: Cannon
    requires square meshes, leaving non-square over-budget cases with no
    feasible plan).

    Classic SUMMA broadcast formulation: the global contraction is cut
    into L = lcm(xs, ys) aligned k-panels; at step u the A panel's owner
    column broadcasts it along y and the B panel's owner row broadcasts
    it along x (a masked ``psum`` — zeros from non-owners — which XLA
    lowers to a ring all-reduce and overlaps with the step-u MXU
    contraction), and every device accumulates the panel product into its
    exact int32 group totals.  Peak memory is the local split planes plus
    ONE broadcast panel pair — ~min(xs, ys)-fold less than the all-gather
    slabs.  Total ICI bytes are ~2x the all-gather formulation's (ring
    all-reduce moves each byte twice), the price of rectangular-mesh
    streaming; results are bitwise-identical to every other variant
    (int32 sums are order-independent).
    """
    import math

    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    alpha, beta = float(alpha), float(beta)
    from ..ops.recombine import fold_group_totals, group_totals

    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]
    L = xs * ys // math.gcd(xs, ys)
    if k_global % L:
        raise ValueError(
            f"streamed SUMMA needs k ({k_global}) divisible by lcm(mesh) = {L}"
        )
    w = k_global // L
    per_y = L // ys  # k-panels per y-device (A) / x-device (B)
    per_x = L // xs
    spec2d = P(axis_x, axis_y)

    def _bcast_panel(planes, owner, idx, off, width, gather_axis, mesh_axis):
        pan = jax.lax.dynamic_slice_in_dim(planes, off, width, axis=gather_axis)
        pan = jnp.where(idx == owner, pan, jnp.zeros((), planes.dtype))
        return jax.lax.psum(pan, mesh_axis)

    def _body(a: F64X, bm: F64X, c: Optional[F64X]) -> F64X:
        da, pa = _local_split(a, axis_y, num_split, b, axis=1)  # [ns, m/x, k/ys]
        db, pb = _local_split(bm, axis_x, num_split, b, axis=0)  # [ns, k/xs, n/y]
        iy = jax.lax.axis_index(axis_y)
        ix = jax.lax.axis_index(axis_x)
        totals = None
        for u in range(L):
            oy, ly = divmod(u, per_y)
            ox, lx = divmod(u, per_x)
            a_pan = _bcast_panel(da, oy, iy, ly * w, w, 2, axis_y)
            b_pan = _bcast_panel(db, ox, ix, lx * w, w, 1, axis_x)
            step = group_totals(a_pan, b_pan, num_split, k_global, b)
            totals = (
                step if totals is None else [t + s for t, s in zip(totals, step)]
            )
        S = fold_group_totals(totals, num_split, k_global, b)
        E = (pa[:, None] + pb[None, :] - acc_shift(num_split, b)).astype(jnp.int32)
        return _epilogue_local(S, E, alpha, beta, c)

    return _wrap_kernel(mesh, _body, spec2d, spec2d, spec2d, with_c=beta != 0.0)


def sharded_zgemm_stream_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: complex = 1.0 + 0j,
    beta: complex = 0.0 + 0j,
):
    """Panel-streamed (true SUMMA) complex GEMM for ANY mesh shape — the
    ZGEMM analogue of :func:`sharded_gemm_stream_fn`: both (re, im) plane
    sets broadcast per step, and each step accumulates the exact int32
    group totals of all four pass combinations (reference pass structure
    gemm.cu:412-521).  Bitwise-identical to the other complex variants."""
    import math

    from ..core.gemm import ZGEMM_PASSES, _zfold_passes
    from ..ops.recombine import fold_group_totals, group_totals

    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    alpha, beta = complex(alpha), complex(beta)
    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]
    L = xs * ys // math.gcd(xs, ys)
    if k_global % L:
        raise ValueError(
            f"streamed SUMMA needs k ({k_global}) divisible by lcm(mesh) = {L}"
        )
    w = k_global // L
    per_y = L // ys
    per_x = L // xs
    spec2d = P(axis_x, axis_y)
    shift = np.int32(acc_shift(num_split, b))

    def _bcast_panel(planes, owner, idx, off, width, gather_axis, mesh_axis):
        pan = jax.lax.dynamic_slice_in_dim(planes, off, width, axis=gather_axis)
        pan = jnp.where(idx == owner, pan, jnp.zeros((), planes.dtype))
        return jax.lax.psum(pan, mesh_axis)

    def _body(a_re, a_im, b_re, b_im, c_re, c_im):
        da, pa = {}, {}
        for idx, xx in ((0, a_re), (1, a_im)):
            da[idx], pa[idx] = _local_split(xx, axis_y, num_split, b, axis=1)
        db, pb = {}, {}
        for idx, xx in ((0, b_re), (1, b_im)):
            db[idx], pb[idx] = _local_split(xx, axis_x, num_split, b, axis=0)
        iy = jax.lax.axis_index(axis_y)
        ix = jax.lax.axis_index(axis_x)
        totals = {pc: None for pc in ZGEMM_PASSES}
        for u in range(L):
            oy, ly = divmod(u, per_y)
            ox, lx = divmod(u, per_x)
            a_pans = {
                i: _bcast_panel(da[i], oy, iy, ly * w, w, 2, axis_y)
                for i in (0, 1)
            }
            b_pans = {
                i: _bcast_panel(db[i], ox, ix, lx * w, w, 1, axis_x)
                for i in (0, 1)
            }
            for pc in ZGEMM_PASSES:
                step = group_totals(
                    a_pans[pc[0]], b_pans[pc[1]], num_split, k_global, b
                )
                totals[pc] = (
                    step
                    if totals[pc] is None
                    else [t + s for t, s in zip(totals[pc], step)]
                )
        SEs = []
        for ap, bp in ZGEMM_PASSES:
            S = fold_group_totals(totals[(ap, bp)], num_split, k_global, b)
            E = (pa[ap][:, None] + pb[bp][None, :] - shift).astype(jnp.int32)
            SEs.append((S, E))
        m_l, n_l = SEs[0][1].shape
        return _zfold_passes(SEs, m_l, n_l, alpha, beta, c_re, c_im)

    with_c = beta != 0
    n_in = 12 if with_c else 8

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d,) * n_in,
        out_specs=(spec2d,) * 4,
        check_vma=False,
    )
    def _kernel(*planes):
        xs_ = [F64X(planes[2 * i], planes[2 * i + 1]) for i in range(n_in // 2)]
        if with_c:
            out_re, out_im = _body(*xs_)
        else:
            out_re, out_im = _body(*xs_, None, None)
        return out_re.hi, out_re.lo, out_im.hi, out_im.lo

    def fn(*xs_):
        flat = []
        for x in xs_:
            flat.extend((x.hi, x.lo))
        rh, rl, ih, il = _kernel(*flat)
        return F64X(rh, rl), F64X(ih, il)

    return fn


def sharded_zgemm_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: complex = 1.0 + 0j,
    beta: complex = 0.0 + 0j,
):
    """Distributed 4-pass complex GEMM: ``alpha*(a@b) + beta*c`` for
    complex128 operands carried as (re, im) F64X plane pairs.

    The TPU-native ZGEMM scale-out (reference complex engine
    gemm.cu:412-521 has no distributed analogue): each of the four re/im
    plane sets is split locally and its int8 planes gathered along the
    contraction axis exactly like the real SUMMA variant — 2x the planes
    of DGEMM per operand, still int8-only traffic — then the four
    recombination passes and the complex fold (shared with the single-chip
    engine, core.gemm._zfold_passes) run locally per C block.

    Returns ``fn(a_re, a_im, b_re, b_im)`` for beta == 0 or
    ``fn(a_re, a_im, b_re, b_im, c_re, c_im)`` otherwise; all arrays are
    F64X sharded P(x, y); output is an (out_re, out_im) F64X pair P(x, y).
    """
    from ..core.gemm import ZGEMM_PASSES, _zfold_passes

    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    alpha, beta = complex(alpha), complex(beta)
    spec2d = P(axis_x, axis_y)
    shift = acc_shift(num_split, b)

    def _body(a_re, a_im, b_re, b_im, c_re, c_im):
        a_planes = {}
        for idx, x in ((0, a_re), (1, a_im)):
            d, p = _local_split(x, axis_y, num_split, b, axis=1)
            d = jax.lax.all_gather(d, axis_y, axis=2, tiled=True)
            a_planes[idx] = (d, p)
        b_planes = {}
        for idx, x in ((0, b_re), (1, b_im)):
            d, p = _local_split(x, axis_x, num_split, b, axis=0)
            d = jax.lax.all_gather(d, axis_x, axis=1, tiled=True)
            b_planes[idx] = (d, p)
        SEs = []
        for ap, bp in ZGEMM_PASSES:
            da, pa = a_planes[ap]
            db, pb = b_planes[bp]
            S = recombine_auto(da, db, num_split, b, k_global)
            E = (pa[:, None] + pb[None, :] - np.int32(shift)).astype(jnp.int32)
            SEs.append((S, E))
        m_l, n_l = SEs[0][1].shape
        return _zfold_passes(SEs, m_l, n_l, alpha, beta, c_re, c_im)

    with_c = beta != 0
    n_in = 12 if with_c else 8

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d,) * n_in,
        out_specs=(spec2d,) * 4,
        check_vma=False,
    )
    def _kernel(*planes):
        xs = [F64X(planes[2 * i], planes[2 * i + 1]) for i in range(n_in // 2)]
        if with_c:
            out_re, out_im = _body(*xs)
        else:
            out_re, out_im = _body(*xs, None, None)
        return out_re.hi, out_re.lo, out_im.hi, out_im.lo

    def fn(*xs):
        flat = []
        for x in xs:
            flat.extend((x.hi, x.lo))
        rh, rl, ih, il = _kernel(*flat)
        return F64X(rh, rl), F64X(ih, il)

    return fn


def sharded_zgemm_ring_fn(
    mesh: Mesh,
    num_split: int,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: complex = 1.0 + 0j,
    beta: complex = 0.0 + 0j,
):
    """Ring-streamed (Cannon) complex GEMM for SQUARE meshes.

    The complex analogue of :func:`sharded_gemm_ring_fn`: all four re/im
    plane sets are skewed once and rotate around the ring together; each
    step accumulates the exact int32 group totals of all FOUR pass
    combinations (re*re, im*im, im*re, re*im), folded once at the end
    into the shared complex fold (core.gemm._zfold_passes).  Peak memory
    is two k-panels per plane set instead of the full-k slab — the
    huge-problem complex variant the round-2 ring lacked.

    Same in/out contract as :func:`sharded_zgemm_fn` (all operands F64X
    sharded P(x, y)); bitwise-identical to it and to the single-chip
    engine.
    """
    from ..core.gemm import ZGEMM_PASSES, _zfold_passes
    from ..ops.recombine import fold_group_totals, group_totals

    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    alpha, beta = complex(alpha), complex(beta)
    x_sz, y_sz = (mesh.shape[axis_x], mesh.shape[axis_y])
    if x_sz != y_sz:
        raise ValueError(
            f"ring (Cannon) ZGEMM needs a square mesh, got {x_sz}x{y_sz}; "
            "use sharded_zgemm_fn (all-gather) instead"
        )
    q = x_sz
    spec2d = P(axis_x, axis_y)
    shift = np.int32(acc_shift(num_split, b))

    def _body(a_re, a_im, b_re, b_im, c_re, c_im):
        da, pa = {}, {}
        for idx, xx in ((0, a_re), (1, a_im)):
            da[idx], pa[idx] = _local_split(xx, axis_y, num_split, b, axis=1)
        db, pb = {}, {}
        for idx, xx in ((0, b_re), (1, b_im)):
            db[idx], pb[idx] = _local_split(xx, axis_x, num_split, b, axis=0)

        i_idx = jax.lax.axis_index(axis_x)
        j_idx = jax.lax.axis_index(axis_y)
        for idx in (0, 1):
            da[idx] = _skew(da[idx], axis_y, i_idx, q)
            db[idx] = _skew(db[idx], axis_x, j_idx, q)

        shift_y = [((p + 1) % q, p) for p in range(q)]
        shift_x = [((p + 1) % q, p) for p in range(q)]
        totals = {
            pc: group_totals(da[pc[0]], db[pc[1]], num_split, k_global, b)
            for pc in ZGEMM_PASSES
        }
        for _ in range(1, q):
            for idx in (0, 1):
                da[idx] = jax.lax.ppermute(da[idx], axis_y, shift_y)
                db[idx] = jax.lax.ppermute(db[idx], axis_x, shift_x)
            for pc in ZGEMM_PASSES:
                step = group_totals(da[pc[0]], db[pc[1]], num_split, k_global, b)
                totals[pc] = [t + s for t, s in zip(totals[pc], step)]

        SEs = []
        for ap, bp in ZGEMM_PASSES:
            S = fold_group_totals(totals[(ap, bp)], num_split, k_global, b)
            E = (pa[ap][:, None] + pb[bp][None, :] - shift).astype(jnp.int32)
            SEs.append((S, E))
        m_l, n_l = SEs[0][1].shape
        return _zfold_passes(SEs, m_l, n_l, alpha, beta, c_re, c_im)

    with_c = beta != 0
    n_in = 12 if with_c else 8

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d,) * n_in,
        out_specs=(spec2d,) * 4,
        check_vma=False,
    )
    def _kernel(*planes):
        xs = [F64X(planes[2 * i], planes[2 * i + 1]) for i in range(n_in // 2)]
        if with_c:
            out_re, out_im = _body(*xs)
        else:
            out_re, out_im = _body(*xs, None, None)
        return out_re.hi, out_re.lo, out_im.hi, out_im.lo

    def fn(*xs):
        flat = []
        for x in xs:
            flat.extend((x.hi, x.lo))
        rh, rl, ih, il = _kernel(*flat)
        return F64X(rh, rl), F64X(ih, il)

    return fn


def _local_loss_totals(x: F64X, mesh_axis: Optional[str], b: int, axis: int):
    """Partial mantissa-loss totals of a local block against the GLOBAL
    scale-group max exponent along the contraction axis — the estimator
    analogue of :func:`_local_split`."""
    from ..core.f64x import exponent_field
    from ..ops.mantissa_loss import loss_totals_with_group_exp

    e_group = jnp.max(exponent_field(x), axis=axis)
    if mesh_axis is not None:
        e_group = jax.lax.pmax(e_group, mesh_axis)
    return loss_totals_with_group_exp(x, e_group, b, axis)


def sharded_loss_totals_fn(
    mesh: Mesh,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
):
    """Jittable DISTRIBUTED mantissa-loss estimator (reference
    split.cu:300-518, scaled out): per-device partial loss totals for all
    16 candidate split counts against pmax-combined global row/col
    exponents, ``psum``-reduced over the mesh.  Exact int64 sums, so the
    totals are bitwise-identical to the single-chip estimator on the same
    global operands.  Traffic: one int32 exponent-vector pmax per operand
    plus a 16-lane int64 psum — negligible next to the GEMM itself.

    Returns ``fn(a, b) -> int64[16]`` (replicated) for F64X operands
    sharded P(x, y) like :func:`sharded_gemm_fn`'s inputs.
    """
    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    spec2d = P(axis_x, axis_y)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d,) * 4,
        out_specs=P(),
        check_vma=False,
    )
    def _kernel(a_hi, a_lo, b_hi, b_lo):
        la = _local_loss_totals(F64X(a_hi, a_lo), axis_y, b, axis=1)
        lb = _local_loss_totals(F64X(b_hi, b_lo), axis_x, b, axis=0)
        return jax.lax.psum(la + lb, (axis_x, axis_y))

    def fn(a: F64X, bm: F64X) -> jax.Array:
        return _kernel(a.hi, a.lo, bm.hi, bm.lo)

    return fn


def sharded_zloss_totals_fn(
    mesh: Mesh,
    k_global: int,
    axis_x: str = "x",
    axis_y: str = "y",
):
    """Distributed complex estimator: ONE shared loss counter over all
    four re/im planes (reference split.cu:69-152 feeding 300-518 — the
    same single-counter semantics as ops.mantissa_loss.complex_loss_totals,
    VERDICT r2 item 3, now on the distributed surface too).

    Returns ``fn(a_re, a_im, b_re, b_im) -> int64[16]`` for F64X plane
    pairs sharded P(x, y) like :func:`sharded_zgemm_fn`'s inputs.
    """
    b = bits_per_int8(k_global)
    if b <= 0:
        raise ValueError(f"global k={k_global} too large for int8 emulation")
    spec2d = P(axis_x, axis_y)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d,) * 8,
        out_specs=P(),
        check_vma=False,
    )
    def _kernel(arh, arl, aih, ail, brh, brl, bih, bil):
        tot = (
            _local_loss_totals(F64X(arh, arl), axis_y, b, axis=1)
            + _local_loss_totals(F64X(aih, ail), axis_y, b, axis=1)
            + _local_loss_totals(F64X(brh, brl), axis_x, b, axis=0)
            + _local_loss_totals(F64X(bih, bil), axis_x, b, axis=0)
        )
        return jax.lax.psum(tot, (axis_x, axis_y))

    def fn(a_re: F64X, a_im: F64X, b_re: F64X, b_im: F64X) -> jax.Array:
        return _kernel(
            a_re.hi, a_re.lo, a_im.hi, a_im.lo,
            b_re.hi, b_re.lo, b_im.hi, b_im.lo,
        )

    return fn


def sharded_dgemm_native_fn(
    mesh: Mesh,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha: float = 1.0,
    beta: float = 0.0,
):
    """Distributed NATIVE-f64 GEMM — the DGEMM fallback target of the
    distributed AUTO path (single-chip analogue: core/api.py DGEMM branch;
    reference gemm.cu:592-599 cublasGemmEx fallback).

    Plain f64 SUMMA: all_gather A along y and B along x, one local f64
    dot per device (on TPU, XLA's double-double emulation — same
    semantics as the single-chip fallback), elementwise epilogue.  f64
    words DO cross the ICI here (8x the int8-plane bytes).  Note this is
    only the AUTO fallback target where native f64 really is the most
    accurate option (CPU backend, or OZIMMU_AUTO_FALLBACK=dgemm): on TPU
    the double-float "native" is LESS accurate than the int8_18 path, so
    the shared selection loop (ops.mantissa_loss.auto_fallback_mode)
    prefers the deepest int8 mode there and this function is reached only
    by explicit request.  Same in/out shardings as
    :func:`sharded_gemm_fn`, operating on plain f64 arrays.
    """
    alpha, beta = float(alpha), float(beta)
    spec2d = P(axis_x, axis_y)
    with_c = beta != 0.0
    n_in = 3 if with_c else 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2d,) * n_in,
        out_specs=spec2d,
        check_vma=False,
    )
    def _kernel(a, bm, *rest):
        a_full = jax.lax.all_gather(a, axis_y, axis=1, tiled=True)  # [m/x, k]
        b_full = jax.lax.all_gather(bm, axis_x, axis=0, tiled=True)  # [k, n/y]
        s = jnp.dot(a_full, b_full, preferred_element_type=jnp.float64)
        out = alpha * s if alpha != 1.0 else s
        if with_c:
            out = out + beta * rest[0]
        return out

    return _kernel


def sharded_auto_mode_select(
    a: np.ndarray,
    b: np.ndarray,
    mesh: Mesh,
    threshold: Optional[float] = None,
    axis_x: str = "x",
    axis_y: str = "y",
):
    """Distributed AUTO mode selection (reference split.cu:473-493 over
    mesh-sharded operands): shard the operands exactly as the engine
    will, run the distributed estimator, apply the shared selection loop.

    Bitwise-identical totals to the single-chip estimator (exact int64
    partial sums; padding contributes zero loss because zero elements are
    skipped), so on shapes the mesh divides evenly the selection is
    IDENTICAL to ``ozimmu_tpu.auto_mode_select``.  On padded shapes the
    chunk-width ``b`` follows the PADDED k (what the distributed engine
    actually uses), a documented deviation.  The average divides by the
    TRUE element count (real planes for complex — the shared-counter
    semantics).  Returns a ComputeMode (int8 mode or DGEMM fallback).
    """
    import math

    from ..core.handle import default_handle
    from ..ops.mantissa_loss import select_mode_from_totals

    if threshold is None:
        threshold = default_handle().avg_mantissa_loss_threshold
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]

    def up(v, q):
        return -(-v // q) * q

    m_p, n_p = up(m, xs), up(n, ys)
    k_p = up(k, xs * ys // math.gcd(xs, ys))

    def pad(x, rows, cols):
        if x.shape == (rows, cols):
            return x
        out = np.zeros((rows, cols), dtype=x.dtype)
        out[: x.shape[0], : x.shape[1]] = x
        return out

    spec = NamedSharding(mesh, P(axis_x, axis_y))

    def put(x) -> F64X:
        fx = F64X.from_numpy(np.ascontiguousarray(x, np.float64))
        return F64X(jax.device_put(fx.hi, spec), jax.device_put(fx.lo, spec))

    if np.iscomplexobj(a) or np.iscomplexobj(b):
        a = pad(np.asarray(a, dtype=np.complex128), m_p, k_p)
        b = pad(np.asarray(b, dtype=np.complex128), k_p, n_p)
        fn = jax.jit(sharded_zloss_totals_fn(mesh, k_p, axis_x, axis_y))
        totals = jax.device_get(
            fn(put(a.real), put(a.imag), put(b.real), put(b.imag))
        )
        denom = 2.0 * (m * k + k * n)
    else:
        a = pad(np.asarray(a, dtype=np.float64), m_p, k_p)
        b = pad(np.asarray(b, dtype=np.float64), k_p, n_p)
        fn = jax.jit(sharded_loss_totals_fn(mesh, k_p, axis_x, axis_y))
        totals = jax.device_get(fn(put(a), put(b)))
        denom = float(m * k + k * n)
    return select_mode_from_totals(totals, denom, threshold)


#: variant name -> (real fn factory, complex fn factory); every entry is
#: bitwise-identical to the others — the choice is purely memory/traffic
_VARIANT_FNS = {
    "summa": (sharded_gemm_fn, sharded_zgemm_fn),
    "ring": (sharded_gemm_ring_fn, sharded_zgemm_ring_fn),
    "stream": (sharded_gemm_stream_fn, sharded_zgemm_stream_fn),
}


def _apply_op_host(x: np.ndarray, op) -> np.ndarray:
    """BLAS op on a host operand: N / T / C (conjugate transpose; exact —
    the reference degrades OP_C to OP_T, src/cublas.cu:50-56)."""
    from ..types import Operation

    op = Operation.parse(op)
    if op is Operation.N:
        return x
    if op is Operation.C and np.iscomplexobj(x):
        return np.conj(x).T
    return x.T


def sharded_gemm(
    a: np.ndarray,
    b: np.ndarray,
    num_split: int,
    mesh: Mesh,
    axis_x: str = "x",
    axis_y: str = "y",
    ring: bool = False,
    alpha=1.0,
    beta=0.0,
    c: Optional[np.ndarray] = None,
    op_a="N",
    op_b="N",
    variant: Optional[str] = None,
) -> np.ndarray:
    """Host-convenience wrapper: shard numpy operands, run, gather back.

    ``variant`` picks the communication formulation: "summa" (all-gather,
    default), "ring" (Cannon, square meshes, 2-panel peak memory) or
    "stream" (panel-streamed true SUMMA — any mesh shape, panel-pair
    peak memory).  ``ring=True`` is the back-compat alias for
    ``variant="ring"``.  Complex128 operands route to the distributed
    ZGEMM of the same variant.
    ``op_a``/``op_b`` accept N/T/C (conjugate transpose — exact, unlike
    the reference's silent OP_C -> OP_T degradation).

    Dims need not divide the mesh: operands are zero-padded up to shard
    multiples and the output sliced back.  Zero rows/cols are exact in the
    engine (zero digit planes, no effect on row/col max exponents), so
    padding only costs the padded fraction of compute.
    """
    import math

    a = _apply_op_host(np.asarray(a), op_a)
    b = _apply_op_host(np.asarray(b), op_b)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    if beta != 0 and c is None:
        raise ValueError("beta != 0 requires c")
    if variant is None:
        variant = "ring" if ring else "summa"
    if variant not in _VARIANT_FNS:
        raise ValueError(
            f"variant must be one of {sorted(_VARIANT_FNS)}, got {variant!r}"
        )

    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]

    def up(v, q):
        return -(-v // q) * q

    # A is P(x, y): m | x, k | y.  B is P(x, y): k | x, n | y.
    m_p, n_p = up(m, xs), up(n, ys)
    k_p = up(k, xs * ys // math.gcd(xs, ys))

    def pad(x, rows, cols):
        if x.shape == (rows, cols):
            return x
        out = np.zeros((rows, cols), dtype=x.dtype)
        out[: x.shape[0], : x.shape[1]] = x
        return out

    if (m_p, n_p, k_p) != (m, n, k):
        a = pad(np.asarray(a), m_p, k_p)
        b = pad(np.asarray(b), k_p, n_p)
        if c is not None:
            c = pad(np.asarray(c), m_p, n_p)
        out = sharded_gemm(
            a, b, num_split, mesh, axis_x, axis_y, variant=variant,
            alpha=alpha, beta=beta, c=c,
        )
        return out[:m, :n]

    spec = NamedSharding(mesh, P(axis_x, axis_y))

    def put(x) -> F64X:
        fx = F64X.from_numpy(np.ascontiguousarray(x, np.float64))
        return F64X(jax.device_put(fx.hi, spec), jax.device_put(fx.lo, spec))

    if np.iscomplexobj(a) or np.iscomplexobj(b):
        a = np.asarray(a, dtype=np.complex128)
        b = np.asarray(b, dtype=np.complex128)
        zmake = _VARIANT_FNS[variant][1]
        fn = jax.jit(
            zmake(
                mesh, num_split, k, axis_x, axis_y, complex(alpha), complex(beta)
            )
        )
        ops = [put(a.real), put(a.imag), put(b.real), put(b.imag)]
        if beta != 0:
            c = np.asarray(c, dtype=np.complex128)
            ops += [put(c.real), put(c.imag)]
        out_re, out_im = fn(*ops)
        return (
            out_re.to_numpy().reshape(m, n) + 1j * out_im.to_numpy().reshape(m, n)
        )

    make = _VARIANT_FNS[variant][0]
    fn = jax.jit(make(mesh, num_split, k, axis_x, axis_y, float(alpha), float(beta)))
    if beta != 0:
        out = fn(put(a), put(b), put(c))
    else:
        out = fn(put(a), put(b))
    return out.to_numpy().reshape(m, n)


def _check_presharded_divisible(m, n, k, xs, ys):
    import math

    k_gran = xs * ys // math.gcd(xs, ys)
    if m % xs or n % ys or k % k_gran:
        raise ValueError(
            f"pre-sharded operands must divide the mesh exactly: "
            f"(m={m}) % {xs}, (n={n}) % {ys}, (k={k}) % {k_gran} must all "
            "be 0 — pad at construction time (shard_local_f64x can "
            "synthesize the zero border per shard)"
        )


def sharded_gemm_presharded(
    a: F64X,
    b: F64X,
    num_split: int,
    mesh: Mesh,
    axis_x: str = "x",
    axis_y: str = "y",
    variant: Optional[str] = None,
    alpha: float = 1.0,
    beta: float = 0.0,
    c: Optional[F64X] = None,
) -> F64X:
    """Distributed DGEMM on PRE-SHARDED F64X operands — no host
    materialization, no gather: in and out stay on the mesh.

    This is the north-star-scale entry (BASELINE.json configs[4]):
    combined with :func:`ozimmu_tpu.parallel.launch.shard_local_f64x`
    the full program touches only O(shard) host memory per process,
    where the :func:`sharded_gemm` numpy wrapper would need the ~137 GB
    global operands on EVERY host at 131072^3.

    Operands must be sharded ``P(axis_x, axis_y)`` with shapes dividing
    the mesh exactly (no implicit padding — the point is to never build
    a global array).  ``variant`` is "summa" | "ring" | None
    (auto via :func:`select_variant`, restricted to the two 2D-layout
    variants).  Returns the C block F64X, sharded ``P(axis_x, axis_y)``.
    """
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    if beta != 0 and c is None:
        raise ValueError("beta != 0 requires c")
    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]
    _check_presharded_divisible(m, n, k, xs, ys)
    if variant is None:
        variant = select_variant(m, n, k, num_split, mesh, axis_x, axis_y)
        if variant == "k":  # k-variant needs P(None, k) layouts; the 2D
            variant = "summa"  # pre-sharded entry keeps the 2D layout
    if variant not in _VARIANT_FNS:
        raise ValueError(
            f"variant must be one of {sorted(_VARIANT_FNS)}, got {variant!r}"
        )
    make = _VARIANT_FNS[variant][0]
    fn = jax.jit(make(mesh, num_split, k, axis_x, axis_y, float(alpha), float(beta)))
    return fn(a, b, c) if beta != 0 else fn(a, b)


def sharded_zgemm_presharded(
    a_re: F64X,
    a_im: F64X,
    b_re: F64X,
    b_im: F64X,
    num_split: int,
    mesh: Mesh,
    axis_x: str = "x",
    axis_y: str = "y",
    variant: Optional[str] = None,
    alpha: complex = 1.0 + 0j,
    beta: complex = 0.0 + 0j,
    c_re: Optional[F64X] = None,
    c_im: Optional[F64X] = None,
    conj_a: bool = False,
    conj_b: bool = False,
) -> Tuple[F64X, F64X]:
    """Distributed ZGEMM on pre-sharded (re, im) F64X plane pairs — the
    complex analogue of :func:`sharded_gemm_presharded`.

    ``conj_a``/``conj_b`` conjugate an operand IN PLACE ON DEVICE (one
    sign-bit XOR on the imaginary plane, core.f64x.neg) — the exact
    Operation.C the reference's shim silently degrades to a plain
    transpose (src/cublas.cu:50-56).  Note conjugation only; transposes
    must be applied at construction (resharding a transpose is a layout
    change, not an engine concern).
    """
    from ..core.f64x import neg

    m, k = a_re.shape
    n = b_re.shape[1]
    if b_re.shape[0] != k:
        raise ValueError(f"shape mismatch: {a_re.shape} @ {b_re.shape}")
    if beta != 0 and c_re is None:
        raise ValueError("beta != 0 requires c")
    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]
    _check_presharded_divisible(m, n, k, xs, ys)
    if conj_a:
        a_im = neg(a_im)
    if conj_b:
        b_im = neg(b_im)
    if variant is None:
        variant = select_variant(
            m, n, k, num_split, mesh, axis_x, axis_y, complex_=True
        )
        if variant == "k":
            variant = "summa"
    if variant not in _VARIANT_FNS:
        raise ValueError(
            f"variant must be one of {sorted(_VARIANT_FNS)}, got {variant!r}"
        )
    zmake = _VARIANT_FNS[variant][1]
    fn = jax.jit(
        zmake(mesh, num_split, k, axis_x, axis_y, complex(alpha), complex(beta))
    )
    ops = [a_re, a_im, b_re, b_im]
    if beta != 0:
        ops += [c_re, c_im]
    return fn(*ops)


def summa_device_bytes(
    m: int, n: int, k: int, num_split: int, xs: int, ys: int,
    complex_: bool = False,
) -> int:
    """Per-device peak bytes of the all-gather (SUMMA) variant.

    Dominated by the GATHERED slabs each device holds: A's digit planes
    over the full k (ns * m/x * k int8) and B's (ns * k * n/y), plus the
    local operand bit planes and the output-block accumulator."""
    f = 2 if complex_ else 1
    mx, ny = -(-m // xs), -(-n // ys)
    return f * (
        num_split * (mx * k + k * ny)      # gathered int8 digit planes
        + 8 * (mx * (k // ys) + (k // xs) * ny)  # local operand bits
        + (8 + 16 + 4) * mx * ny           # C bits + triple + int32
    )


def ring_device_bytes(
    m: int, n: int, k: int, num_split: int, q: int, complex_: bool = False
) -> int:
    """Per-device peak bytes of the Cannon ring variant on a q x q mesh:
    TWO resident k-panels per operand instead of the full-k slab."""
    f = 2 if complex_ else 1
    mq, nq, kq = -(-m // q), -(-n // q), -(-k // q)
    return f * (
        2 * num_split * (mq * kq + kq * nq)  # two in-flight panel pairs
        + 8 * (mq * kq + kq * nq)            # local operand bits
        + (8 + 16 + 4) * mq * nq             # C bits + accumulators
    )


def stream_device_bytes(
    m: int, n: int, k: int, num_split: int, xs: int, ys: int,
    complex_: bool = False,
) -> int:
    """Per-device peak bytes of the panel-streamed (true SUMMA) variant:
    resident local split planes + ONE broadcast k-panel pair (double-
    buffered: XLA overlaps the step-u+1 psum with the step-u dot)."""
    import math

    f = 2 if complex_ else 1
    L = xs * ys // math.gcd(xs, ys)
    mx, ny = -(-m // xs), -(-n // ys)
    kys, kxs, w = -(-k // ys), -(-k // xs), -(-k // L)
    return f * (
        num_split * (mx * kys + kxs * ny)   # resident local split planes
        + 2 * num_split * (mx * w + w * ny)  # in-flight broadcast panels
        + 8 * (mx * kys + kxs * ny)          # local operand bit planes
        + (8 + 16 + 4) * mx * ny             # C bits + triple + int32
    )


def select_variant(
    m: int,
    n: int,
    k: int,
    num_split: int,
    mesh: Mesh,
    axis_x: str = "x",
    axis_y: str = "y",
    complex_: bool = False,
    hbm_bytes: Optional[int] = None,
) -> str:
    """Topology/shape -> distributed-variant choice:
    "summa" | "ring" | "stream" | "k".

    The decision procedure documented in parallel/launch.py, as code:

    * tall contraction (k >= 8 * max(m, n)) -> "k": the 1D k-sharded
      psum_scatter variant moves only int32 group totals (4 pass sets
      for complex);
    * all-gather slabs fit the HBM budget -> "summa": fewest collective
      steps, XLA overlaps the two independent gathers;
    * over budget, square mesh, ring fits -> "ring": Cannon streaming,
      neighbour-only traffic, 2 resident panels;
    * over budget otherwise -> "stream": panel-streamed true SUMMA,
      works on ANY mesh shape (~2x the ICI bytes — ring all-reduce);
    * nothing fits -> ValueError (the budget decision is honest: no
      variant with a feasible memory model exists; raise instead of
      returning a plan that will OOM).
    """
    if hbm_bytes is None:
        from ..schedule import hbm_budget_bytes

        hbm_bytes = hbm_budget_bytes()
    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]
    P_sz = xs * ys
    f = 2 if complex_ else 1
    if (
        k >= 8 * max(m, n)
        # the k variant keeps the FULL m x n output block and its
        # accumulators on every device — only eligible when that fits
        # (complex: re/im planes double the bits, passes run sequentially)
        and f * ((8 + 16 + 4) * m * n + 8 * (m + n) * (-(-k // P_sz)))
        <= hbm_bytes
    ):
        return "k"
    if summa_device_bytes(m, n, k, num_split, xs, ys, complex_) <= hbm_bytes:
        return "summa"
    if (
        xs == ys
        and xs > 1
        and ring_device_bytes(m, n, k, num_split, xs, complex_) <= hbm_bytes
    ):
        return "ring"
    if stream_device_bytes(m, n, k, num_split, xs, ys, complex_) <= hbm_bytes:
        return "stream"
    raise ValueError(
        f"no distributed variant fits the HBM budget ({hbm_bytes} B/device) "
        f"for m={m} n={n} k={k} ns={num_split} on a {xs}x{ys} mesh "
        f"(streamed minimum ~"
        f"{stream_device_bytes(m, n, k, num_split, xs, ys, complex_)} B); "
        "use a larger mesh or raise OZIMMU_HBM_BUDGET_MB"
    )


def _sharded_dgemm_native(
    a: np.ndarray,
    b: np.ndarray,
    mesh: Mesh,
    axis_x: str,
    axis_y: str,
    alpha,
    beta,
    c: Optional[np.ndarray],
) -> np.ndarray:
    """Host wrapper for the distributed native-f64 fallback: pad, shard,
    run :func:`sharded_dgemm_native_fn`, gather, slice.  Complex operands
    run the four real plane products distributed and fold re/im with the
    complex alpha/beta on the host (single-chip analogue:
    core/api.py complex-DGEMM branch — plain native arithmetic)."""
    import math

    m, k = a.shape
    n = b.shape[1]
    xs, ys = mesh.shape[axis_x], mesh.shape[axis_y]

    def up(v, q):
        return -(-v // q) * q

    m_p, n_p = up(m, xs), up(n, ys)
    k_p = up(k, xs * ys // math.gcd(xs, ys))

    def pad(x, rows, cols):
        if x.shape == (rows, cols):
            return np.asarray(x)
        out = np.zeros((rows, cols), dtype=x.dtype)
        out[: x.shape[0], : x.shape[1]] = x
        return out

    spec = NamedSharding(mesh, P(axis_x, axis_y))

    def put(x):
        return jax.device_put(
            jnp.asarray(np.ascontiguousarray(x, np.float64)), spec
        )

    if np.iscomplexobj(a) or np.iscomplexobj(b):
        a = pad(np.asarray(a, np.complex128), m_p, k_p)
        b = pad(np.asarray(b, np.complex128), k_p, n_p)
        fn = jax.jit(sharded_dgemm_native_fn(mesh, axis_x, axis_y, 1.0, 0.0))
        ar, ai = put(a.real), put(a.imag)
        br, bi = put(b.real), put(b.imag)
        re = np.asarray(jax.device_get(fn(ar, br))) - np.asarray(
            jax.device_get(fn(ai, bi))
        )
        im = np.asarray(jax.device_get(fn(ar, bi))) + np.asarray(
            jax.device_get(fn(ai, br))
        )
        out = complex(alpha) * (re + 1j * im)[:m, :n]
        if beta != 0:
            out = out + complex(beta) * np.asarray(c, np.complex128)
        return out

    a = pad(np.asarray(a, np.float64), m_p, k_p)
    b = pad(np.asarray(b, np.float64), k_p, n_p)
    fn = jax.jit(
        sharded_dgemm_native_fn(mesh, axis_x, axis_y, float(alpha), float(beta))
    )
    if beta != 0:
        out = fn(put(a), put(b), put(pad(np.asarray(c, np.float64), m_p, n_p)))
    else:
        out = fn(put(a), put(b))
    return np.asarray(jax.device_get(out))[:m, :n]


def sharded_gemm_auto(
    a: np.ndarray,
    b: np.ndarray,
    num_split="auto",
    mesh: Optional[Mesh] = None,
    axis_x: str = "x",
    axis_y: str = "y",
    alpha=1.0,
    beta=0.0,
    c: Optional[np.ndarray] = None,
    threshold: Optional[float] = None,
    op_a="N",
    op_b="N",
) -> np.ndarray:
    """:func:`sharded_gemm` with BOTH automatic decisions:

    * ``num_split`` may be an int (fixed split count), ``"auto"`` /
      ``ComputeMode.FP64_INT8_AUTO`` (the default — distributed
      mantissa-loss estimation via :func:`sharded_auto_mode_select`,
      reference split.cu:300-518, including the native-DGEMM fallback,
      distributed as :func:`sharded_dgemm_native_fn`), or any
      ``fp64_int8_N`` ComputeMode;
    * the communication VARIANT (summa / ring / k-sharded) is chosen by
      :func:`select_variant` — all variants are bitwise-identical, so
      that choice is purely a memory/traffic decision.
    """
    from ..types import ComputeMode
    from ..utils.log import log

    if mesh is None:
        mesh = make_mesh_2d()
    a = _apply_op_host(np.asarray(a), op_a)
    b = _apply_op_host(np.asarray(b), op_b)
    m, k = a.shape
    n = b.shape[1]
    complex_ = bool(np.iscomplexobj(a) or np.iscomplexobj(b))

    if isinstance(num_split, str):
        num_split = ComputeMode(num_split if "_" in num_split
                                else f"fp64_int8_{num_split}")
    if num_split is ComputeMode.FP64_INT8_AUTO:
        sel = sharded_auto_mode_select(a, b, mesh, threshold, axis_x, axis_y)
        log(f"AUTO selected mode = {sel.value} (distributed)")
        if sel is ComputeMode.DGEMM:
            return _sharded_dgemm_native(
                a, b, mesh, axis_x, axis_y, alpha, beta, c
            )
        num_split = sel.num_split
    elif isinstance(num_split, ComputeMode):
        num_split = num_split.num_split

    v = select_variant(m, n, k, num_split, mesh, axis_x, axis_y, complex_)
    if v == "k":
        from jax.sharding import Mesh as _Mesh

        kmesh = _Mesh(mesh.devices.reshape(-1), ("k",))
        return sharded_gemm_k(
            a, b, num_split, kmesh, alpha=alpha, beta=beta, c=c
        )
    return sharded_gemm(
        a, b, num_split, mesh, axis_x, axis_y, variant=v,
        alpha=alpha, beta=beta, c=c,
    )


def sharded_gemm_k(
    a: np.ndarray,
    b: np.ndarray,
    num_split: int,
    mesh: Optional[Mesh] = None,
    axis_k: str = "k",
    alpha: float = 1.0,
    beta: float = 0.0,
    c: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Host-convenience wrapper for the 1D contraction-parallel variant.

    Shards A ``P(None, k)`` / B ``P(k, None)`` over a 1D mesh (default:
    all devices), zero-pads m and k up to shard multiples (the
    ``psum_scatter`` row-scatter needs m | P), runs, gathers back.
    Complex128 operands route to :func:`sharded_zgemm_k_fn`.
    """
    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.array(devs), (axis_k,))
    P_sz = mesh.shape[axis_k]
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    if beta != 0 and c is None:
        raise ValueError("beta != 0 requires c")
    complex_ = bool(np.iscomplexobj(a) or np.iscomplexobj(b))
    dt = np.complex128 if complex_ else np.float64

    def up(v, q):
        return -(-v // q) * q

    m_p, k_p = up(m, P_sz), up(k, P_sz)
    if (m_p, k_p) != (m, k):
        ap = np.zeros((m_p, k_p), dtype=dt)
        ap[:m, :k] = a
        bp = np.zeros((k_p, n), dtype=dt)
        bp[:k, :] = b
        cp = None
        if c is not None:
            cp = np.zeros((m_p, n), dtype=dt)
            cp[:m, :] = c
        return sharded_gemm_k(
            ap, bp, num_split, mesh, axis_k, alpha=alpha, beta=beta, c=cp
        )[:m, :n]

    sa = NamedSharding(mesh, P(None, axis_k))
    sb = NamedSharding(mesh, P(axis_k, None))
    sc = NamedSharding(mesh, P(axis_k, None))

    def put(x, s) -> F64X:
        fx = F64X.from_numpy(np.ascontiguousarray(x, np.float64))
        return F64X(jax.device_put(fx.hi, s), jax.device_put(fx.lo, s))

    if complex_:
        a = np.asarray(a, dtype=np.complex128)
        b = np.asarray(b, dtype=np.complex128)
        zfn = jax.jit(
            sharded_zgemm_k_fn(
                mesh, num_split, k, axis_k, complex(alpha), complex(beta)
            )
        )
        ops = [put(a.real, sa), put(a.imag, sa), put(b.real, sb), put(b.imag, sb)]
        if beta != 0:
            c = np.asarray(c, dtype=np.complex128)
            ops += [put(c.real, sc), put(c.imag, sc)]
        out_re, out_im = zfn(*ops)
        return (
            out_re.to_numpy().reshape(m, n) + 1j * out_im.to_numpy().reshape(m, n)
        )

    fn = jax.jit(
        sharded_gemm_k_fn(mesh, num_split, k, axis_k, float(alpha), float(beta))
    )
    if beta != 0:
        out = fn(put(a, sa), put(b, sb), put(c, sc))
    else:
        out = fn(put(a, sa), put(b, sb))
    return out.to_numpy().reshape(m, n)


def make_mesh_2d(n_devices: Optional[int] = None, axis_x: str = "x", axis_y: str = "y") -> Mesh:
    """Largest 2D mesh (x*y = n) with x as square as possible.

    Device order comes from ``mesh_utils.create_device_mesh`` so mesh
    neighbours are physical ICI neighbours on real TPU slices (ring/SUMMA
    collectives then ride single-hop links).  Results are device-order
    independent (the engine's cross-chip sums are exact int32), so the
    reshape fallback — used for virtual CPU meshes, whose devices have no
    topology — is bitwise-identical, just slower on real hardware.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    x = int(np.floor(np.sqrt(n)))
    while n % x:
        x -= 1
    shape = (x, n // x)
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devs[:n])
    except Exception:  # virtual/CPU devices: no topology info to exploit
        arr = np.array(devs[:n]).reshape(shape)
    return Mesh(arr, (axis_x, axis_y))
