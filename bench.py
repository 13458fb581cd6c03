"""Headline benchmark: effective FP64 TFLOPS of emulated DGEMM on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFLOPS", "vs_baseline": R}

``value``  — effective FP64 TFLOPS (2*m*n*k / t) of fp64_int8_9 DGEMM.
``vs_baseline`` — speedup over the platform's own f64 matmul
  (``jnp.dot`` with preferred_element_type=f64 — on TPU that is XLA's
  double-float emulation, the only "native DGEMM" the platform has).

Timing methodology: the benchmark runs N dependent engine iterations
inside a single jit (each iteration's B operand is perturbed by one
mantissa bit of the previous C, forcing real execution) and differences
two run lengths — this cancels the multi-millisecond dispatch/transfer
latency of remote-tunnel setups.  Diagnostics go to stderr; stdout gets
exactly the one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin hooks get_backend and only honors the config
    # setting — the env var alone would still dial the remote tunnel
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/ozimmu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial

from ozimmu_tpu.core.f64x import F64X
from ozimmu_tpu.core.gemm import _gemm_core
from ozimmu_tpu.testing import error_metrics

M = int(os.environ.get("OZ_BENCH_M", 16384))  # north-star size (BASELINE.md)
NS = int(os.environ.get("OZ_BENCH_NS", 9))
ITERS = int(os.environ.get("OZ_BENCH_ITERS", 4 if M >= 16384 else 6))
# column-panel chunking (bitwise-identical; cuts peak HBM ~NCHUNKS-fold
# for the B planes / accumulator — what fits 16384^3 in 16 GB).  Default:
# the engine's own auto selection (schedule.auto_n_chunks), i.e. the same
# code path a plain oz.gemm/traced.gemm user gets.
_nc_env = os.environ.get("OZ_BENCH_NCHUNKS", "auto")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


from ozimmu_tpu.schedule import auto_n_chunks

NCHUNKS = auto_n_chunks(M, M, M, NS) if _nc_env == "auto" else int(_nc_env)


@partial(jax.jit, static_argnums=(4, 5, 6))
def chain_engine(a_hi, a_lo, b_hi, b_lo, ns, iters, n_chunks):
    from ozimmu_tpu.core.gemm import gemm_f64x

    def body(i, carry):
        a_lo, b_lo = carry
        # the production dispatch path (auto-chunk resolved above so the
        # native-baseline chunking below can mirror it)
        out = gemm_f64x(F64X(a_hi, a_lo), F64X(b_hi, b_lo), ns, n_chunks=n_chunks)
        # dependency: flip one low mantissa bit of BOTH operands per
        # element so neither operand's split can be hoisted out of the
        # loop — each iteration pays the full gemm cost
        dep = out.lo & np.uint32(1)
        return a_lo ^ dep[: a_lo.shape[0], : a_lo.shape[1]], b_lo ^ dep

    a_lo, b_lo = jax.lax.fori_loop(0, iters, body, (a_lo, b_lo))
    return jnp.sum(b_lo.astype(jnp.uint32) & np.uint32(1), dtype=jnp.int32)


@partial(jax.jit, static_argnums=(2, 3))
def chain_native(a, b, iters, nchunks):
    def body(i, b):
        if nchunks > 1:
            # block-chunked: XLA's emulated-f64 dot materializes EACH
            # operand as a bf16[4, ., .] expansion (8 GB per full
            # 16384^2 operand), so both sides are sliced — and the block
            # sweep is a ROLLED fori_loop so only one block's temps are
            # ever live.  Every block's [0,0] element feeds the
            # perturbation, chaining all blocks and iterations causally;
            # full 2mnk FLOPs retained.
            wm = a.shape[0] // nchunks
            wn = b.shape[1] // nchunks

            def blk(t, s):
                bi = t // nchunks
                bj = t % nchunks
                ai = jax.lax.dynamic_slice_in_dim(a, bi * wm, wm, axis=0)
                bjp = jax.lax.dynamic_slice_in_dim(b, bj * wn, wn, axis=1)
                cij = jnp.dot(ai, bjp, preferred_element_type=jnp.float64)
                return s + cij[0, 0]

            s = jax.lax.fori_loop(
                0, nchunks * nchunks, blk, jnp.zeros((), dtype=jnp.float64)
            )
            return b + s * 1e-30
        c = jnp.dot(a, b, preferred_element_type=jnp.float64)
        # true data dependency (not DCE-able), negligible value drift
        return b + c * 1e-30

    b = jax.lax.fori_loop(0, iters, body, b)
    return jnp.sum(b)


def timed(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    return time.perf_counter() - t0


def committed_headlines():
    """Solver/complex headlines measured on-chip and committed as
    artifacts (tests/artifacts/{hpl_v5e,zgemm_v5e_8192}.json — repro
    commands inside).  Attached to the JSON line with a _committed
    suffix so the driver's record carries them alongside the live GEMM
    measurement; they are NOT measured by this run."""
    extra = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for key, fname, field in (
        ("hpl_gflops_committed", "hpl_v5e.json", "value"),
        ("zgemm_tflops_committed", "zgemm_v5e_8192.json", "value"),
    ):
        try:
            with open(os.path.join(root, "tests", "artifacts", fname)) as f:
                extra[key] = json.load(f)[field]
        except Exception:
            pass
    return extra


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} platform: {dev.platform}")
    device_gen = M > 8192 or os.environ.get("OZ_BENCH_DEVICE_GEN") == "1"
    rng = np.random.default_rng(0)

    # --- accuracy check (small, once, host-verifiable) -------------------
    am = rng.uniform(size=(1024, 1024))
    bm = rng.uniform(size=(1024, 1024))
    c = _gemm_core(F64X.from_numpy(am), F64X.from_numpy(bm), NS, 1.0, 0.0)
    err = error_metrics(c.to_numpy().reshape(1024, 1024), am, bm)
    log(f"accuracy @1024^3 ns={NS}: residual={err['relative_residual']:.3e} "
        f"max_rel={err['max_relative_error']:.3e}")

    if device_gen:
        # operands generated ON DEVICE (uniform f32 widened to exact f64
        # bits): at 16384^2 the host->device transfer of 8 GiB of bit
        # planes over a remote tunnel would dominate the whole benchmark
        from ozimmu_tpu.core.f64x import from_f32

        log(f"generating {M}x{M} operands on device")
        genx = jax.jit(
            lambda k: from_f32(jax.random.uniform(k, (M, M), dtype=jnp.float32))
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        ax = genx(k1)
        bx = genx(k2)
        jax.block_until_ready(bx.hi)
    else:
        a = rng.uniform(size=(M, M))
        b = rng.uniform(size=(M, M))
        ax = F64X.from_numpy(a)
        bx = F64X.from_numpy(b)

    # --- engine timing ----------------------------------------------------
    # HBM-OOM insurance for unattended runs: the working-set estimate has
    # slack for XLA temporaries, but if the device still OOMs at the
    # auto-selected panel count, double it (bitwise-identical) and retry.
    global NCHUNKS
    nc = NCHUNKS
    while True:
        try:
            t1 = timed(chain_engine, ax.hi, ax.lo, bx.hi, bx.lo, NS, ITERS, nc)
            t2 = timed(chain_engine, ax.hi, ax.lo, bx.hi, bx.lo, NS, 2 * ITERS, nc)
            break
        except Exception as e:
            if nc >= min(M, 64):
                raise
            log(f"engine run failed at n_chunks={nc} ({type(e).__name__}); "
                f"retrying with {2 * nc}")
            nc *= 2
    NCHUNKS = nc
    per_iter = max((t2 - t1) / ITERS, 1e-9)
    tflops = 2 * M**3 / per_iter / 1e12
    log(f"engine: {per_iter*1e3:.3f} ms/GEMM -> {tflops:.2f} effective FP64 TFLOPS @ {M}^3 ns={NS} n_chunks={nc}")

    # --- native f64 baseline ---------------------------------------------
    # NEVER fatal: the headline JSON line below is emitted whatever happens
    # here (the reference harness always prints its per-case CSV row,
    # test/main_test.cu:143-151 — BENCH_r03 died in this section and lost
    # the round's number).  On failure vs_baseline is null.
    native_tflops = None
    if os.environ.get("OZ_BENCH_SKIP_NATIVE") == "1":
        # tuning runs: engine-only timing, vs_baseline null
        log("native baseline skipped (OZ_BENCH_SKIP_NATIVE=1)")
        vs = None
        print(
            json.dumps(
                {
                    "metric": f"fp64_int8_{NS} effective FP64 TFLOPS (m=n=k={M})",
                    "value": round(tflops, 3),
                    "unit": "TFLOPS",
                    "vs_baseline": vs,
                    **committed_headlines(),
                }
            )
        )
        return
    try:
        # free the engine operands first: at M=16384 the F64X bit planes
        # (2 GiB per operand) plus two f64 operands plus XLA's bf16[4,m,k]
        # double-float expansion temporaries cannot coexist in 16 GB HBM —
        # exactly the RESOURCE_EXHAUSTED that killed round 3's run.
        del ax, bx
        if device_gen:
            genf = jax.jit(
                lambda k: jax.random.uniform(k, (M, M), dtype=jnp.float64)
            )
            k1, k2 = jax.random.split(jax.random.PRNGKey(1))
            aj = genf(k1)
            bj = genf(k2)
            jax.block_until_ready(bj)
        else:
            aj = jnp.asarray(a, dtype=jnp.float64)
            bj = jnp.asarray(b, dtype=jnp.float64)
        # same OOM-retry discipline as the engine loop: the block-chunked
        # native chain keeps only one block's expansion temps live, and
        # doubling the block count halves them.  Start unchunked — the
        # STRONGEST baseline the platform can run (fewer blocks is faster
        # for the native chain) — independent of the engine's panelling.
        nc_n = 1
        while True:
            try:
                n1 = timed(chain_native, aj, bj, ITERS, nc_n)
                n2 = timed(chain_native, aj, bj, 2 * ITERS, nc_n)
                break
            except Exception as e:
                if nc_n >= min(M, 64):
                    raise
                log(f"native run failed at n_chunks={nc_n} "
                    f"({type(e).__name__}); retrying with {2 * nc_n}")
                nc_n = max(2 * nc_n, 2)
        native_per_iter = max((n2 - n1) / ITERS, 1e-9)
        native_tflops = 2 * M**3 / native_per_iter / 1e12
        log(f"native f64: {native_per_iter*1e3:.3f} ms/GEMM -> "
            f"{native_tflops:.2f} TFLOPS (n_chunks={nc_n})")
    except Exception as e:
        log(f"native baseline unavailable ({type(e).__name__}: {e}); "
            "emitting vs_baseline null")

    vs = round(tflops / native_tflops, 3) if native_tflops else None
    print(
        json.dumps(
            {
                "metric": f"fp64_int8_{NS} effective FP64 TFLOPS (m=n=k={M})",
                "value": round(tflops, 3),
                "unit": "TFLOPS",
                "vs_baseline": vs,
                **committed_headlines(),
            }
        )
    )


if __name__ == "__main__":
    main()
