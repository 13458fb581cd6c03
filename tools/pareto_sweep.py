"""Accuracy-vs-throughput Pareto sweep over fp64_int8_3..18 (BASELINE.md
north-star: "Split sweep int8_3..18 @ 4096^3").

Computes the long-double reference product ONCE (native OpenMP oracle)
and reuses it for every mode, so the sweep cost is dominated by the TPU
measurements rather than 16 oracle recomputations.

Usage:  python tools/pareto_sweep.py [SIZE] [NS_LIST]
        python tools/pareto_sweep.py 4096 3,4,...,18
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/ozimmu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import ozimmu_tpu as oz
from ozimmu_tpu import native
from ozimmu_tpu.testing import effective_tflops, error_metrics, generate_input, reference_gemm


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ns_list = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else list(range(3, 19))
    )
    a = generate_input("urand01", (size, size), seed=0)
    b = generate_input("urand01", (size, size), seed=1)

    print(f"# reference product ({size}^3, long double)...", file=sys.stderr)
    c_ref = native.ref_gemm_native(a, b)
    if c_ref is None:
        c_ref = reference_gemm(a, b)

    dev = str(jax.devices()[0]).replace(",", ";")
    print("device,gemm,input,mode,opA,opB,m,n,k,residual,max_relative,tflops", flush=True)
    modes = [f"fp64_int8_{ns}" for ns in ns_list] + ["dgemm", "sgemm"]
    for mode in modes:
        c = oz.gemm(a, b, mode=mode)
        err = error_metrics(np.asarray(c), a, b, c_ref=c_ref)
        try:
            tflops = effective_tflops(a, b, mode, test_count=4)
        except Exception as e:  # keep the accuracy row even if timing fails
            print(f"# timing failed for {mode}: {e}", file=sys.stderr)
            tflops = float("nan")
        print(
            f"{dev},D,urand01,{mode},N,N,{size},{size},{size},"
            f"{err['relative_residual']:e},{err['max_relative_error']:e},"
            f"{tflops:e}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
