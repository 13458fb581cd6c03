"""Chunked-complex on-chip headline: effective FP64 ZGEMM TFLOPS at
m=n=k >= 8192 (x4 accounting, reference test/main_test.cu:140-141).

Same methodology as bench.py (dependent iterations inside one jit,
difference of two run lengths; operands generated on device), OOM-
protected by the same n_chunks doubling retry.  Writes the result to
``tests/artifacts/zgemm_v5e.json`` and prints one JSON line.

Run from the repo root on the real chip:
    OZ_ZBENCH_M=8192 python tools/bench_zgemm.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ozimmu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial

from ozimmu_tpu.core.f64x import F64X, from_f32
from ozimmu_tpu.schedule import auto_n_chunks

M = int(os.environ.get("OZ_ZBENCH_M", 8192))
NS = int(os.environ.get("OZ_ZBENCH_NS", 9))
ITERS = int(os.environ.get("OZ_ZBENCH_ITERS", 2 if M >= 16384 else 4))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@partial(jax.jit, static_argnums=(8, 9, 10))
def chain_zgemm(arh, arl, aih, ail, brh, brl, bih, bil, ns, iters, n_chunks):
    from ozimmu_tpu.core.gemm import zgemm_f64x

    def body(i, carry):
        brl, bil = carry
        o_re, o_im = zgemm_f64x(
            F64X(arh, arl), F64X(aih, ail),
            F64X(brh, brl), F64X(bih, bil),
            ns, n_chunks=n_chunks,
        )
        # flip one low mantissa bit of both B planes per element so the
        # B splits (and all four passes) re-execute every iteration
        dep_r = o_re.lo & np.uint32(1)
        dep_i = o_im.lo & np.uint32(1)
        return brl ^ dep_r, bil ^ dep_i

    brl, bil = jax.lax.fori_loop(0, iters, body, (brl, bil))
    return jnp.sum(brl.astype(jnp.uint32) & np.uint32(1), dtype=jnp.int32)


def timed(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    return time.perf_counter() - t0


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} platform: {dev.platform}")

    # accuracy check at a host-verifiable size, complex
    rng = np.random.default_rng(0)
    am = rng.uniform(size=(1024, 1024)) + 1j * rng.uniform(size=(1024, 1024))
    bm = rng.uniform(size=(1024, 1024)) + 1j * rng.uniform(size=(1024, 1024))
    import ozimmu_tpu as oz

    cm = oz.gemm(am, bm, mode=f"fp64_int8_{NS}")
    ref = am @ bm
    resid = np.linalg.norm(cm - ref) / np.linalg.norm(ref)
    log(f"accuracy @1024^3 zgemm ns={NS}: residual={resid:.3e}")

    log(f"generating {M}x{M} complex operands on device")
    genx = jax.jit(
        lambda k: from_f32(jax.random.uniform(k, (M, M), dtype=jnp.float32))
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    ar, ai, br, bi = (genx(k) for k in keys)
    jax.block_until_ready(bi.hi)

    nc_env = os.environ.get("OZ_ZBENCH_NCHUNKS", "auto")
    nc = (
        auto_n_chunks(M, M, M, NS, complex_=True)
        if nc_env == "auto"
        else int(nc_env)
    )
    while True:
        try:
            t1 = timed(
                chain_zgemm, ar.hi, ar.lo, ai.hi, ai.lo,
                br.hi, br.lo, bi.hi, bi.lo, NS, ITERS, nc,
            )
            t2 = timed(
                chain_zgemm, ar.hi, ar.lo, ai.hi, ai.lo,
                br.hi, br.lo, bi.hi, bi.lo, NS, 2 * ITERS, nc,
            )
            break
        except Exception as e:
            if nc >= min(M, 64):
                raise
            log(f"zgemm run failed at n_chunks={nc} ({type(e).__name__}); "
                f"retrying with {2 * nc}")
            nc *= 2
    per_iter = max((t2 - t1) / ITERS, 1e-9)
    # x4 accounting: a complex MAC is 4 real MACs (main_test.cu:140-141)
    tflops = 4 * 2 * M**3 / per_iter / 1e12
    log(f"zgemm engine: {per_iter*1e3:.3f} ms/ZGEMM -> {tflops:.2f} "
        f"effective FP64 TFLOPS (x4) @ {M}^3 ns={NS} n_chunks={nc}")

    out = {
        "metric": f"zgemm fp64_int8_{NS} effective FP64 TFLOPS x4 (m=n=k={M})",
        "value": round(tflops, 3),
        "unit": "TFLOPS",
        "ms_per_zgemm": round(per_iter * 1e3, 3),
        "n_chunks": nc,
        "residual_1024": float(f"{resid:.3e}"),
        "device": str(dev),
    }
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "artifacts", f"zgemm_v5e_{M}.json",
    )
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    log(f"artifact written: {art}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
