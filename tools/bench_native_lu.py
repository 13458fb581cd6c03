"""Native LU baseline on the current backend (context for the HPL
headline): times jax.scipy.linalg.lu_factor on XLA's own floats at the
same size/accounting as bench_cli hpl.

Finding worth recording: XLA:TPU's LuDecomposition custom-call supports
ONLY F32 and C64 ("Only F32 and C64 types are implemented in
LuDecomposition; got shape f64[...]") — native f64 LU DOES NOT EXIST on
this platform.  The engine's fp64_int8_* factorization is the only
f64-grade LU the device can run; the nearest native comparison is f32
(~2^-24 accuracy vs the engine's ~1e-16 HPL residual).

Tunnel-proof timing: two factorizations of DIFFERENT matrices (the axon
tunnel returns identical re-dispatches ~instantly), each synced; the
second (warm) one is reported.  Usage:

    python tools/bench_native_lu.py [n] [f64|f32]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    dtypes = [sys.argv[2]] if len(sys.argv) > 2 else ["f64", "f32"]
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    import jax.scipy.linalg as jsl

    for dt in dtypes:
        dtype = jnp.float64 if dt == "f64" else jnp.float32

        @jax.jit
        def factor(key, dtype=dtype):
            a = jax.random.uniform(key, (n, n), dtype=dtype)
            a = a + n * jnp.eye(n, dtype=dtype)
            lu, piv = jsl.lu_factor(a)
            # cheap dependency so nothing is elided
            return lu[0, 0] + piv[0].astype(dtype)

        k0, k1 = jax.random.split(jax.random.PRNGKey(0))
        try:
            t0 = time.perf_counter()
            float(factor(k0))  # compile + cold run; device_get = real sync
            t_cold = time.perf_counter() - t0
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"native_lu,{dev.device_kind},{dt},n={n},UNSUPPORTED: {msg}")
            continue
        # block_until_ready is unreliable over the axon tunnel (returns
        # early on re-dispatch) — force a device_get of the scalar
        t0 = time.perf_counter()
        float(factor(k1))  # warm, different data
        t_warm = time.perf_counter() - t0
        gflops = (2.0 / 3.0) * n**3 / t_warm / 1e9
        print(
            f"native_lu,{dev.device_kind},{dt},n={n},"
            f"warm_time={t_warm:.4e}s,cold_time={t_cold:.4e}s,"
            f"gflops={gflops:.4g}"
        )


if __name__ == "__main__":
    main()
