"""Drop-in interception of float64 matmuls in JAX programs.

TPU replacement for the reference's LD_PRELOAD cuBLAS shim
(src/cublas.cu:103-513): instead of hijacking dynamic-linker symbols, this
module monkey-patches ``jnp.dot``, ``jnp.matmul``, ``jnp.einsum`` and
``jax.lax.dot_general`` so qualifying float64/complex128 contractions are
rerouted through the Ozaki int8 engine.

Gate (reference cublas.cu:142-148): mode != dgemm AND m, n, k are all >=
their ``OZIMMU_INTERCEPT_THRESHOLD_{M,N,K}`` thresholds AND dtypes are
f64/c128.  (The reference compares n against the K threshold — a bug noted
in SURVEY.md; here each dimension uses its own threshold.)  The compute
mode is read from ``OZIMMU_COMPUTE_MODE`` *per call* (cublas.cu:18-48)
unless pinned via ``enable(mode=...)``.

Works both eagerly and under ``jax.jit``:

  * eager numpy/CPU arrays: exact bit-level conversion;
  * traced arrays (incl. on TPU, where XLA f64 is a lossy double-float and
    bitcasts don't compile): the value is peeled into exact f32 components
    arithmetically and packed into exact bits on device.  Interception
    then computes the *exact* product of the stored values — strictly more
    accurate and faster than XLA's own emulated-f64 matmul.

Usage::

    import ozimmu_tpu.intercept as ozi
    ozi.enable(mode="fp64_int8_9")      # global
    ...
    ozi.disable()

    with ozi.intercept(mode="fp64_int8_auto"):
        c = jnp.dot(a, b)               # rerouted when it qualifies
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.f64x import F64X
from ..core.gemm import _gemm_core, _zgemm_core
from ..core.handle import Handle, default_handle
from ..ops import tf32x3
from ..ops.pack import pack_f64x, unpack_f64x
from ..types import ComputeMode
from ..utils.env import env_compute_mode, env_flag
from ..utils.log import error, log
from ..utils.profiling import culip_timer

_state = threading.local()


def _tls():
    if not hasattr(_state, "active"):
        _state.active = False
        _state.mode = None
        _state.handle = None
        _state.in_engine = False
    return _state


# ---------------------------------------------------------------------------
# traced f64 <-> F64X conversion (works under jit on any backend)
# ---------------------------------------------------------------------------


def f64_to_f64x_traced(x: jax.Array) -> F64X:
    """Peel a (possibly emulated) f64 tracer into exact IEEE bits.

    Three rounds of round-to-f32-and-subtract capture >= 72 bits — i.e.
    everything a true f64 (CPU) or a double-float (TPU) can hold — then
    the pack kernel reassembles exact f64 bits on device.
    """
    t0 = x.astype(jnp.float32)
    r1 = x - t0.astype(jnp.float64)
    t1 = r1.astype(jnp.float32)
    r2 = r1 - t1.astype(jnp.float64)
    t2 = r2.astype(jnp.float32)
    E = jnp.zeros(x.shape, dtype=jnp.int32)
    return pack_f64x((t0, t1, t2), E)


def f64x_to_f64_traced(x: F64X) -> jax.Array:
    """Best-effort conversion back to the platform's f64 representation."""
    t, E = unpack_f64x(x)
    s = tf32x3.scale_pow2(t, E)
    return (
        s[0].astype(jnp.float64) + s[1].astype(jnp.float64) + s[2].astype(jnp.float64)
    )


# ---------------------------------------------------------------------------
# gating and routing
# ---------------------------------------------------------------------------


def _current_mode(handle: Handle) -> ComputeMode:
    tls = _tls()
    if tls.mode is not None:
        return tls.mode
    env = env_compute_mode()  # read per call, reference cublas.cu:18-48
    if env is not None:
        try:
            return ComputeMode.parse(env)
        except ValueError:
            return ComputeMode.DGEMM
    return ComputeMode.DGEMM  # no mode configured -> no interception


def _qualifies(m: int, n: int, k: int, dtype, mode: ComputeMode, handle: Handle) -> bool:
    if mode in (ComputeMode.DGEMM,):
        return False
    if dtype not in (jnp.float64, np.float64, jnp.complex128, np.complex128):
        return False
    return (
        m >= handle.intercept_threshold_m
        and n >= handle.intercept_threshold_n
        and k >= handle.intercept_threshold_k
    )


def _route_2d(a: jax.Array, b: jax.Array, mode: ComputeMode, handle: Handle) -> jax.Array:
    tls = _tls()
    tls.in_engine = True
    try:
        ax = f64_to_f64x_traced(a)
        bx = f64_to_f64x_traced(b)
        if mode is ComputeMode.FP64_INT8_AUTO:
            # in traced contexts the loss sweep would force host sync;
            # fall back to a fixed robust default there.
            if isinstance(a, jax.core.Tracer):
                mode = ComputeMode.FP64_INT8_9
            else:
                from ..ops.mantissa_loss import auto_mode_select

                mode = auto_mode_select(ax, bx, a.shape[1], handle.avg_mantissa_loss_threshold)
                log(f"AUTO selected mode = {mode.value} (intercept)")
                if not mode.is_int8:
                    return None  # fall through to native
        out = _gemm_core(ax, bx, mode.num_split, 1.0, 0.0)
        return f64x_to_f64_traced(out)
    finally:
        tls.in_engine = False


def _route_complex_2d(a, b, mode: ComputeMode, handle: Handle):
    """ZGEMM interception (reference cublasZgemm_v2, cublas.cu:297-313)."""
    tls = _tls()
    tls.in_engine = True
    try:
        ar = f64_to_f64x_traced(jnp.real(a))
        ai = f64_to_f64x_traced(jnp.imag(a))
        br = f64_to_f64x_traced(jnp.real(b))
        bi = f64_to_f64x_traced(jnp.imag(b))
        if mode is ComputeMode.FP64_INT8_AUTO:
            if isinstance(a, jax.core.Tracer):
                mode = ComputeMode.FP64_INT8_9
            else:
                from ..ops.mantissa_loss import auto_mode_select

                k = a.shape[1]
                th = handle.avg_mantissa_loss_threshold
                picks = [
                    auto_mode_select(ar, br, k, th),
                    auto_mode_select(ai, bi, k, th),
                ]
                if any(not p.is_int8 for p in picks):
                    return None  # fall through to native
                mode = ComputeMode.from_num_split(
                    max(p.num_split for p in picks)
                )
                log(f"AUTO selected mode = {mode.value} (intercept, complex)")
        out_re, out_im = _zgemm_core(
            ar, ai, br, bi, mode.num_split, 1.0 + 0j, 0.0 + 0j
        )
        return jax.lax.complex(
            f64x_to_f64_traced(out_re), f64x_to_f64_traced(out_im)
        )
    finally:
        tls.in_engine = False


def _route_batched(a, b, mode: ComputeMode, handle: Handle):
    """Batched DGEMM interception ([B, m, k] @ [B, k, n]; reference's
    strided-batched shim loops per batch, cublas.cu:380-406 — here one
    vmapped engine call)."""
    tls = _tls()
    tls.in_engine = True
    try:
        if mode is ComputeMode.FP64_INT8_AUTO:
            mode = ComputeMode.FP64_INT8_9  # one robust mode per batch
        ax = f64_to_f64x_traced(a)  # conversion is elementwise: 3D is fine
        bx = f64_to_f64x_traced(b)
        ns = mode.num_split
        out = jax.vmap(lambda x, y: _gemm_core(x, y, ns, 1.0, 0.0))(ax, bx)
        return f64x_to_f64_traced(out)
    finally:
        tls.in_engine = False


# ---------------------------------------------------------------------------
# patched entry points
# ---------------------------------------------------------------------------

_orig = {}


def _patched_dot_general(lhs, rhs, dimension_numbers, *args, **kwargs):
    tls = _tls()
    orig = _orig["dot_general"]
    if not tls.active or tls.in_engine:
        return orig(lhs, rhs, dimension_numbers, *args, **kwargs)
    try:
        ((lc, rc), (lb, rb)) = dimension_numbers
        # callers pass contraction/batch dims as tuples OR lists
        lc, rc, lb, rb = tuple(lc), tuple(rc), tuple(lb), tuple(rb)
        handle = tls.handle or default_handle()
        mode = _current_mode(handle)
        ldt = getattr(lhs, "dtype", None)
        rdt = getattr(rhs, "dtype", None)
        if (
            ldt == rdt
            and ldt in (jnp.float64, jnp.complex128)
            and lhs.ndim == 2
            and rhs.ndim == 2
            and len(lb) == 0
            and len(rb) == 0
            and len(lc) == 1
            and len(rc) == 1
        ):
            a = lhs if lc == (1,) else lhs.T
            b = rhs if rc == (0,) else rhs.T
            m, k = a.shape
            n = b.shape[1]
            if _qualifies(m, n, k, ldt, mode, handle):
                route = _route_complex_2d if ldt == jnp.complex128 else _route_2d
                with culip_timer(f"intercept_dot_general-m{m}-n{n}-k{k}"):
                    r = route(jnp.asarray(a), jnp.asarray(b), mode, handle)
                if r is not None:
                    return r
        elif (
            ldt == rdt
            and ldt == jnp.float64
            and lhs.ndim == 3
            and rhs.ndim == 3
            and lb == (0,)
            and rb == (0,)
            and lc == (2,)
            and rc == (1,)
        ):
            bsz, m, k = lhs.shape
            n = rhs.shape[2]
            if _qualifies(m, n, k, ldt, mode, handle):
                with culip_timer(
                    f"intercept_dot_general_batched-b{bsz}-m{m}-n{n}-k{k}"
                ):
                    r = _route_batched(
                        jnp.asarray(lhs), jnp.asarray(rhs), mode, handle
                    )
                if r is not None:
                    return r
    except Exception as e:  # fall back to native on any issue — but LOUDLY
        # (a silent fallback once masked three rerouting bugs; the error
        # channel is on by default, reference utils.hpp:133-137 logs its
        # fallbacks the same way)
        tls.in_engine = False
        error(f"interception fell back to native: {type(e).__name__}: {e}")
    return orig(lhs, rhs, dimension_numbers, *args, **kwargs)


def enable(mode=None, handle: Optional[Handle] = None) -> None:
    """Globally patch jnp/lax matmul entry points.

    Three patch points are required (verified by bitwise-vs-engine tests):

    * ``jax._src.lax.lax.dot_general`` — the DEFINING module.  jnp.dot,
      jnp.matmul, ``@`` and tensordot resolve ``lax.dot_general`` as a
      module attribute at call time against this module, so patching only
      the public re-export would silently miss every jnp entry point.
    * ``jax.lax.dot_general`` — the public re-export, for direct callers.
    * ``jnp.einsum`` captured the original function as an import-time
      keyword DEFAULT (``_dot_general=lax.dot_general``), so its
      ``__kwdefaults__`` entry is swapped to the patched function.
    """
    tls = _tls()
    if not _orig:
        import jax._src.lax.lax as _lax_internal
        import jax._src.numpy.einsum as _einsum_mod

        _orig["dot_general"] = _lax_internal.dot_general
        _lax_internal.dot_general = _patched_dot_general
        jax.lax.dot_general = _patched_dot_general
        for fn in (_einsum_mod.einsum, getattr(jnp, "einsum", None)):
            kwd = getattr(fn, "__kwdefaults__", None) or {}
            if kwd.get("_dot_general") is _orig["dot_general"]:
                kwd["_dot_general"] = _patched_dot_general
    tls.active = True
    tls.mode = ComputeMode.parse(mode) if mode is not None else None
    tls.handle = handle
    # jnp.dot/matmul are themselves jit-wrapped: traces cached BEFORE this
    # call baked in the original dot_general and would keep serving the
    # native path (and vice versa after disable).  Clearing the trace
    # caches restores per-call semantics — the LD_PRELOAD behavior the
    # reference shim has by construction.
    jax.clear_caches()
    log("interception enabled")


def disable() -> None:
    tls = _tls()
    tls.active = False
    tls.mode = None
    tls.handle = None
    jax.clear_caches()
    log("interception disabled")


@contextlib.contextmanager
def intercept(mode=None, handle: Optional[Handle] = None):
    prev = (_tls().active, _tls().mode, _tls().handle)
    enable(mode, handle)
    try:
        yield
    finally:
        _tls().active, _tls().mode, _tls().handle = prev
        jax.clear_caches()
