"""HPL-class dense solvers on the emulated-FP64 engine.

The reference library's production pitch is accelerating LU-based FP64
solvers (HPL) by rerouting their GEMMs through int8 tensor cores — its
LD_PRELOAD shim exists so an unmodified HPL binary's `cublasDgemm_v2`
calls land in the engine (reference src/cublas.cu:280-295; paper cited
at README.md:80-88).  This module provides that workload as a native
capability instead of relying on interception: a right-looking blocked
LU factorization with partial pivoting whose trailing-matrix updates —
asymptotically 100% of the O(n^3) FLOPs — run through the engine's full
``alpha*op(A)@op(B) + beta*C`` contract, plus triangular solves, and
``solve`` with optional HPL-AI-style iterative refinement (factor in a
cheap mode such as ``fp64_int8_6`` or ``sgemm``, recover f64-level
accuracy with f64 residual corrections).

Numerics: only the GEMM updates use the selected compute mode; the
panel factorizations and triangular solves (O(n^2 * nb) work) run in
host f64, exactly like HPL running over the reference's shim keeps
everything but cuBLAS GEMM calls in ordinary FP64 code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .core.api import gemm

try:  # LAPACK/BLAS host paths for the O(n^2*nb) non-GEMM work.  The
    # pure-numpy loops below remain as fallbacks; both compute the same
    # factorization (partial pivoting over the full trailing column).
    from scipy.linalg import lu_factor as _sp_lu_factor
    from scipy.linalg import lu_solve as _sp_lu_solve
    from scipy.linalg import solve_triangular as _sp_solve_triangular
except ImportError:  # pragma: no cover - scipy is present in CI
    _sp_lu_factor = _sp_lu_solve = _sp_solve_triangular = None

__all__ = ["lu_factor", "lu_solve", "solve", "cholesky", "cho_solve"]


def _panel_factor(a: np.ndarray, j: int, jb: int, piv: np.ndarray) -> None:
    """Unblocked partial-pivot LU of the panel ``a[j:, j:j+jb]``, in place.

    Pivot rows are swapped across the FULL width of ``a`` (LAPACK getrf
    convention, so already-computed L columns stay consistent) and the
    absolute row indices are recorded in ``piv[j:j+jb]``.

    Uses LAPACK ``getrf`` on the panel when scipy is available (the
    panel is O(n*nb^2) work — a Python column loop would dominate the
    engine GEMMs at benchmark sizes), falling back to a numpy loop.
    """
    n = a.shape[0]
    if _sp_lu_factor is not None:
        import warnings

        from scipy.linalg import LinAlgWarning

        try:
            with warnings.catch_warnings():
                # scipy warns (only) on singular factors; leave every
                # other warning alone
                warnings.simplefilter("ignore", category=LinAlgWarning)
                lu, p_loc = _sp_lu_factor(
                    a[j:, j : j + jb], check_finite=False
                )
        except ValueError:
            # scipy < 1.10 rejects rectangular (tall-panel) input with
            # ValueError('expected square matrix') — fall through to the
            # numpy panel loop below, which computes the same factorization
            _numpy_panel_factor(a, j, jb, piv)
            return
        d = np.diagonal(lu)
        if np.any(d == 0):  # we raise instead (reference getrf info > 0)
            jj = j + int(np.flatnonzero(d == 0)[0])
            raise np.linalg.LinAlgError(
                f"singular matrix: zero pivot at column {jj}"
            )
        for i in range(jb):  # swap FULL rows of a, in factorization order
            p = j + int(p_loc[i])
            piv[j + i] = p
            if p != j + i:
                a[[j + i, p], :] = a[[p, j + i], :]
        a[j:, j : j + jb] = lu
        return
    _numpy_panel_factor(a, j, jb, piv)


def _numpy_panel_factor(a: np.ndarray, j: int, jb: int, piv: np.ndarray) -> None:
    """Pure-numpy unblocked panel factorization (fallback when scipy is
    absent or too old for rectangular ``lu_factor``)."""
    n = a.shape[0]
    for jj in range(j, j + jb):
        p = jj + int(np.argmax(np.abs(a[jj:, jj])))
        if a[p, jj] == 0:
            raise np.linalg.LinAlgError(
                f"singular matrix: zero pivot at column {jj}"
            )
        piv[jj] = p
        if p != jj:
            a[[jj, p], :] = a[[p, jj], :]
        if jj + 1 < n:
            a[jj + 1 :, jj] /= a[jj, jj]
            if jj + 1 < j + jb:
                a[jj + 1 :, jj + 1 : j + jb] -= np.outer(
                    a[jj + 1 :, jj], a[jj, jj + 1 : j + jb]
                )


def _unit_lower_solve(l11: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve ``L11 @ X = B`` with L11 unit lower triangular, in place on B."""
    if _sp_solve_triangular is not None:
        b[:] = _sp_solve_triangular(
            l11, b, lower=True, unit_diagonal=True, check_finite=False
        )
        return b
    for i in range(1, l11.shape[0]):
        b[i, :] -= l11[i, :i] @ b[:i, :]
    return b


def lu_factor(
    a,
    *,
    mode=None,
    block: int = 256,
    handle=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Blocked LU factorization with partial pivoting: ``P @ A = L @ U``.

    Right-looking algorithm: each iteration factors a ``block``-column
    panel in host f64, then applies the trailing-matrix update
    ``A22 -= L21 @ U12`` through :func:`ozimmu_tpu.gemm` with
    ``alpha=-1, beta=1, c=A22`` in the selected compute mode — the same
    division of labor HPL has when running over the reference shim
    (panel/TRSM in FP64 on host, GEMM on the emulation engine).

    Returns ``(lu, piv)`` in the LAPACK ``getrf`` convention: ``lu``
    holds L (unit diagonal, below) and U (on/above the diagonal);
    ``piv[i]`` is the row swapped with row ``i`` at step ``i``.

    ``mode`` accepts everything :func:`ozimmu_tpu.gemm` does, including
    ``"fp64_int8_auto"`` (per-update loss-driven selection) and cheap
    modes for refinement-based solvers.  Real f64 or complex128 input.
    """
    a = np.array(a, order="C", copy=True)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"lu_factor needs a square 2D matrix, got {a.shape}")
    if not np.iscomplexobj(a):
        a = a.astype(np.float64, copy=False)
    n = a.shape[0]
    nb = max(1, min(int(block), n))
    piv = np.arange(n)

    for j in range(0, n, nb):
        jb = min(nb, n - j)
        _panel_factor(a, j, jb, piv)
        rest = j + jb
        if rest >= n:
            break
        # U12 = L11^{-1} @ A12  (unit lower triangular solve, host f64)
        _unit_lower_solve(a[j:rest, j:rest], a[j:rest, rest:])
        # trailing update through the engine: A22 -= L21 @ U12
        a[rest:, rest:] = gemm(
            np.ascontiguousarray(a[rest:, j:rest]),
            np.ascontiguousarray(a[j:rest, rest:]),
            mode=mode,
            alpha=-1.0,
            beta=1.0,
            c=np.ascontiguousarray(a[rest:, rest:]),
            handle=handle,
        )
    return a, piv


def lu_solve(lu_and_piv: Tuple[np.ndarray, np.ndarray], b) -> np.ndarray:
    """Solve ``A @ x = b`` from :func:`lu_factor` output (host f64,
    O(n^2) forward/back substitution)."""
    lu, piv = lu_and_piv
    n = lu.shape[0]
    x = np.array(b, copy=True)
    if not (np.iscomplexobj(x) or np.iscomplexobj(lu)):
        x = x.astype(np.float64, copy=False)
    elif not np.iscomplexobj(x):
        x = x.astype(np.complex128)
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    if x.shape[0] != n:
        raise ValueError(f"rhs rows {x.shape[0]} != matrix size {n}")
    if _sp_lu_solve is not None:  # LAPACK getrs (same piv convention)
        out = _sp_lu_solve((lu, np.asarray(piv)), x, check_finite=False)
        return out[:, 0] if vec else out
    for i in range(n):  # apply pivots in factorization order
        p = piv[i]
        if p != i:
            x[[i, p], :] = x[[p, i], :]
    for i in range(1, n):  # L y = P b (unit diagonal)
        x[i, :] -= lu[i, :i] @ x[:i, :]
    for i in range(n - 1, -1, -1):  # U x = y
        if i + 1 < n:
            x[i, :] -= lu[i, i + 1 :] @ x[i + 1 :, :]
        x[i, :] /= lu[i, i]
    return x[:, 0] if vec else x


def solve(
    a,
    b,
    *,
    mode=None,
    block: int = 256,
    refine: int = 0,
    handle=None,
    factor: Optional[Tuple[np.ndarray, np.ndarray]] = None,
):
    """Solve ``A @ x = b`` via blocked LU on the engine.

    ``refine > 0`` adds that many steps of iterative refinement with
    host-f64 residuals (``r = b - A @ x`` is an O(n^2) matvec): the
    HPL-AI recipe — factor cheaply (e.g. ``mode="fp64_int8_6"`` at ~2.5x
    the ns=9 GEMM rate, or ``"sgemm"``), then each correction solve
    against the same cheap factors multiplies the accuracy until it
    converges at the f64 working precision.  With ``mode="fp64_int8_9"``
    the factorization is already at the f64 rounding floor and
    ``refine=0`` suffices.

    Pass ``factor=(lu, piv)`` (from :func:`lu_factor`) to reuse an
    existing factorization across solves.
    """
    fac = factor if factor is not None else lu_factor(
        a, mode=mode, block=block, handle=handle
    )
    a = np.asarray(a)
    x = lu_solve(fac, b)
    for _ in range(int(refine)):
        r = np.asarray(b) - a @ x
        x = x + lu_solve(fac, r)
    return x


def cholesky(
    a,
    *,
    mode=None,
    block: int = 256,
    handle=None,
) -> np.ndarray:
    """Blocked Cholesky factorization ``A = L @ L^H`` (lower), SPD/HPD input.

    Right-looking algorithm, same division of labor as :func:`lu_factor`
    (and as HPL-class solvers over the reference shim): the diagonal
    block factors in host f64 (O(n * nb^2) work), the panel solve
    ``L21 = A21 @ L11^-H`` is a host triangular solve, and the trailing
    Hermitian update ``A22 -= L21 @ L21^H`` — asymptotically all the
    O(n^3/3) FLOPs — runs through :func:`ozimmu_tpu.gemm` with
    ``alpha=-1, beta=1, c=A22`` in the selected compute mode.

    Only the lower triangle of ``a`` is read.  Returns L with the strict
    upper triangle zeroed.  Raises ``LinAlgError`` if a diagonal block is
    not positive definite.
    """
    a = np.array(a, order="C", copy=True)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"cholesky needs a square 2D matrix, got {a.shape}")
    if not np.iscomplexobj(a):
        a = a.astype(np.float64, copy=False)
    n = a.shape[0]
    nb = max(1, min(int(block), n))

    for j in range(0, n, nb):
        jb = min(nb, n - j)
        rest = j + jb
        # host f64: factor the diagonal block (reads its lower triangle)
        try:
            l11 = np.linalg.cholesky(a[j:rest, j:rest])
        except np.linalg.LinAlgError as e:
            raise np.linalg.LinAlgError(
                f"matrix is not positive definite (diagonal block at {j})"
            ) from e
        a[j:rest, j:rest] = l11
        if rest >= n:
            break
        # host f64: panel solve L21 = A21 @ L11^-H  (triangular, O(n*nb^2))
        l21 = a[rest:, j:rest]
        if _sp_solve_triangular is not None:
            # L21 @ L11^H = A21  <=>  L11 @ (L21^H) = A21^H  (BLAS trsm)
            l21[:] = np.conj(
                _sp_solve_triangular(
                    l11, np.conj(l21).T, lower=True, check_finite=False
                )
            ).T
        else:
            for i in range(jb):  # forward substitution on columns of L21
                l21[:, i] = (
                    l21[:, i] - l21[:, :i] @ np.conj(l11[i, :i])
                ) / np.conj(l11[i, i])
        # engine: trailing Hermitian update A22 -= L21 @ L21^H
        a[rest:, rest:] = gemm(
            np.ascontiguousarray(l21),
            np.ascontiguousarray(np.conj(l21)),
            op_b="T",
            mode=mode,
            alpha=-1.0,
            beta=1.0,
            c=np.ascontiguousarray(a[rest:, rest:]),
            handle=handle,
        )
    return np.tril(a)


def cho_solve(l: np.ndarray, b) -> np.ndarray:
    """Solve ``A @ x = b`` from :func:`cholesky` output (host f64,
    O(n^2) forward/back substitution with ``L`` and ``L^H``)."""
    l = np.asarray(l)
    n = l.shape[0]
    x = np.array(b, copy=True)
    if not (np.iscomplexobj(x) or np.iscomplexobj(l)):
        x = x.astype(np.float64, copy=False)
    elif not np.iscomplexobj(x):
        x = x.astype(np.complex128)
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    if x.shape[0] != n:
        raise ValueError(f"rhs rows {x.shape[0]} != matrix size {n}")
    if _sp_solve_triangular is not None:  # two BLAS trsm calls
        y = _sp_solve_triangular(l, x, lower=True, check_finite=False)
        out = _sp_solve_triangular(
            l, y, lower=True, trans="C", check_finite=False
        )
        return out[:, 0] if vec else out
    for i in range(n):  # L y = b
        if i:
            x[i, :] -= l[i, :i] @ x[:i, :]
        x[i, :] /= l[i, i]
    lh = np.conj(l)
    for i in range(n - 1, -1, -1):  # L^H x = y
        if i + 1 < n:
            x[i, :] -= lh[i + 1 :, i] @ x[i + 1 :, :]
        x[i, :] /= lh[i, i]
    return x[:, 0] if vec else x
