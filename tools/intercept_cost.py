"""Measure the cost of intercept.enable/disable cache invalidation.

VERDICT r2 item 6: ``enable()``/``disable()`` call ``jax.clear_caches()``
to restore per-call semantics (a jitted function that traced through the
original ``dot_general`` would otherwise keep serving the native path
forever).  The price is a full retrace+recompile of every live jitted
function on its next call — this script quantifies it so DESIGN.md can
document the trade-off and the ``clear_caches=False`` escape hatch.

Scenario: a user program with several jitted functions (one matmul-heavy,
two unrelated elementwise pipelines) wraps ONE matmul in
``with ozi.intercept(...)``.  We measure:

  * cold compile time of the user program (reference point);
  * re-call time of the unrelated functions after enable() with
    clear_caches=True (the retrace they pay);
  * the same with clear_caches=False (should be ~free);
  * steady-state call time (no invalidation).

Run on CPU from the repo root: ``python tools/intercept_cost.py``.
Single measurement, wall-clock; run on an idle box for clean numbers.
"""

import os
import sys
import time

# force CPU: this measures host-side trace/compile cost, and the default
# platform here is the remote axon TPU (never time host work over it).
# BOTH the env var and the config update are needed — the axon plugin
# hooks get_backend and only honors the config setting.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ozimmu_tpu.intercept as ozi  # noqa: E402


def timed(f, *a):
    t0 = time.perf_counter()
    r = f(*a)
    jax.block_until_ready(r)
    return time.perf_counter() - t0


@jax.jit
def pipeline1(x):
    for _ in range(24):
        x = jnp.tanh(x) * 1.0001 + jnp.sin(x) * 1e-3
    return x.sum()


@jax.jit
def pipeline2(x):
    y = x
    for _ in range(24):
        y = jnp.exp(-jnp.abs(y)) + jnp.cos(y) * 0.5
    return y.mean()


@jax.jit
def user_matmul(a, b):
    return jnp.dot(a, b)


def main():
    x = np.linspace(0.0, 1.0, 256 * 256).reshape(256, 256)
    a = np.random.default_rng(0).uniform(size=(1024, 1024))
    b = np.random.default_rng(1).uniform(size=(1024, 1024))

    cold1 = timed(pipeline1, x)
    cold2 = timed(pipeline2, x)
    coldm = timed(user_matmul, a, b)
    warm1 = timed(pipeline1, x)
    warm2 = timed(pipeline2, x)
    print(f"cold compile: pipeline1 {cold1:.3f}s  pipeline2 {cold2:.3f}s  "
          f"matmul {coldm:.3f}s")
    print(f"steady-state: pipeline1 {warm1*1e3:.1f}ms  pipeline2 {warm2*1e3:.1f}ms")

    # --- enable/disable with default clear_caches=True -----------------
    t0 = time.perf_counter()
    ozi.enable("fp64_int8_9", warmup=False)
    t_enable = time.perf_counter() - t0
    re1 = timed(pipeline1, x)  # pays full retrace+recompile
    re2 = timed(pipeline2, x)
    rem = timed(user_matmul, a, b)  # retrace AND the engine compile
    t0 = time.perf_counter()
    ozi.disable()
    t_disable = time.perf_counter() - t0
    re1b = timed(pipeline1, x)  # pays retrace AGAIN after disable
    print(f"clear_caches=True : enable() {t_enable*1e3:.1f}ms, then "
          f"pipeline1 {re1:.3f}s  pipeline2 {re2:.3f}s  matmul {rem:.3f}s; "
          f"disable() {t_disable*1e3:.1f}ms, pipeline1 again {re1b:.3f}s")

    # --- enable with clear_caches=False --------------------------------
    timed(pipeline1, x)  # re-establish live traces (native)
    native_m = timed(user_matmul, a, b)
    native_m = timed(user_matmul, a, b)
    ozi.enable("fp64_int8_9", warmup=False, clear_caches=False)
    nc1 = timed(pipeline1, x)
    ncm = timed(user_matmul, a, b)  # STALE: still the baked native trace
    ozi.disable(clear_caches=False)
    print(f"clear_caches=False: pipeline1 {nc1*1e3:.1f}ms (no retrace); "
          f"already-traced matmul stays NATIVE ({ncm*1e3:.1f}ms vs "
          f"{native_m*1e3:.1f}ms native steady state — the intercept "
          f"does NOT take) — only safe when enable() precedes all tracing")


if __name__ == "__main__":
    main()
