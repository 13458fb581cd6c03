"""Compile-cost of traced AUTO at scale (VERDICT r4 weak #6).

Traced AUTO compiles len(candidates)+1 full engine branches per shape
(intercept._route_2d_auto_traced's lax.switch).  This quantifies the
one-time enable cost at HPL-class shapes via AOT lower+compile — no
device memory is touched (the axon helper compiles chipless), so it is
safe to run while the chip is busy.

    python tools/traced_auto_cost.py [n ...]      # default 2048 4096 8192

Prints per shape: fixed-ns=9 compile seconds vs AUTO (6+1 branches)
compile seconds, and the ratio.  Persistent compile cache is DISABLED
for this process so the numbers are true cold compiles.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ozimmu_tpu.intercept as ozi


def compile_seconds(fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    return time.perf_counter() - t0


def main():
    ns = [int(v) for v in sys.argv[1:]] or [2048, 4096, 8192]
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    for n in ns:
        a = jax.ShapeDtypeStruct((n, n), jnp.float64)
        b = jax.ShapeDtypeStruct((n, n), jnp.float64)

        with ozi.intercept("fp64_int8_9"):
            t_fixed = compile_seconds(lambda x, y: x @ y, a, b)
        with ozi.intercept("fp64_int8_auto"):
            t_auto = compile_seconds(lambda x, y: x @ y, a, b)
        print(
            f"traced_auto_cost,{dev.device_kind},n={n},"
            f"fixed9_compile={t_fixed:.2f}s,auto_compile={t_auto:.2f}s,"
            f"ratio={t_auto / t_fixed:.2f}"
        )


if __name__ == "__main__":
    main()
