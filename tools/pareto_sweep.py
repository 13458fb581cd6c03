"""Accuracy-vs-throughput Pareto sweep over fp64_int8_3..18 (BASELINE.md
north-star: "Split sweep int8_3..18 @ 4096^3").

Computes the long-double reference product ONCE (native OpenMP oracle)
and reuses it for every mode, so the sweep cost is dominated by the TPU
measurements rather than 16 oracle recomputations.

Usage:  python tools/pareto_sweep.py [SIZE] [MODE_LIST] [flags]
        python tools/pareto_sweep.py 4096 3,4,...,18
        python tools/pareto_sweep.py 4096 8,9,10 --complex   # ZGEMM sweep
        python tools/pareto_sweep.py 4096 dgemm,sgemm --complex  # just the
                # fallback rows (integer tokens mean fp64_int8_<ns>; with an
                # explicit list dgemm/sgemm are not auto-appended)
        python tools/pareto_sweep.py 8192 3,...,18 --no-oracle  # timing only
                # (residual column = nan; the 1-core long-double oracle is
                # infeasible at compute-bound sizes — pair with a smaller
                # oracle-backed run for the accuracy axis)
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin hooks get_backend and only honors the config
    # setting — env alone would still dial the (possibly down) tunnel
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/ozimmu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import ozimmu_tpu as oz
from ozimmu_tpu import native
from ozimmu_tpu.testing import effective_tflops, error_metrics, generate_input, reference_gemm


def main() -> int:
    args = [x for x in sys.argv[1:] if not x.startswith("--")]
    flags = {x for x in sys.argv[1:] if x.startswith("--")}
    complex_ = "--complex" in flags
    no_oracle = "--no-oracle" in flags
    # --test-count=N: chained iterations per timing (default 4).  The
    # sgemm rows NEED a large count: one f32 GEMM at 4096^3 is ~0.3 ms,
    # far below the remote tunnel's run-to-run jitter, so the default
    # 4-vs-8 difference is noise there (measured: nonsense 5e8 "TFLOPS").
    test_count = 4
    for f in flags:
        if f.startswith("--test-count="):
            test_count = int(f.split("=", 1)[1])
    size = int(args[0]) if args else 4096
    # mode list: integer tokens -> fp64_int8_<ns>; name tokens (dgemm,
    # sgemm, fp64_int8_7, ...) pass through verbatim.  When the list is
    # explicit the dgemm/sgemm fallback rows are NOT auto-appended — so
    # a partial re-run (e.g. "dgemm,sgemm") measures exactly what it says.
    explicit = len(args) > 1
    tokens = args[1].split(",") if explicit else [str(x) for x in range(3, 19)]
    mode_list = [
        f"fp64_int8_{t}" if t.strip().isdigit() else t.strip() for t in tokens
    ]
    a = generate_input("urand01", (size, size), seed=0, complex_=complex_)
    b = generate_input("urand01", (size, size), seed=1, complex_=complex_)

    if no_oracle:
        c_ref = None
    else:
        print(f"# reference product ({size}^3, long double)...", file=sys.stderr)
        c_ref = native.ref_gemm_native(a, b)
        if c_ref is None:
            c_ref = reference_gemm(a, b)

    dev = str(jax.devices()[0]).replace(",", ";")
    kind = "Z" if complex_ else "D"
    print("device,gemm,input,mode,opA,opB,m,n,k,residual,max_relative,tflops", flush=True)
    modes = mode_list if explicit else mode_list + ["dgemm", "sgemm"]
    for mode in modes:
        if c_ref is not None:
            c = oz.gemm(a, b, mode=mode)
            err = error_metrics(np.asarray(c), a, b, c_ref=c_ref)
        else:
            err = {"relative_residual": float("nan"),
                   "max_relative_error": float("nan")}
        try:
            tflops = effective_tflops(a, b, mode, test_count=test_count)
        except Exception as e:  # keep the accuracy row even if timing fails
            print(f"# timing failed for {mode}: {e}", file=sys.stderr)
            tflops = float("nan")
        print(
            f"{dev},{kind},urand01,{mode},N,N,{size},{size},{size},"
            f"{err['relative_residual']:e},{err['max_relative_error']:e},"
            f"{tflops:e}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
