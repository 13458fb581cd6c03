import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""HPL-class LU solver on the engine (ozimmu_tpu.linalg).

The reference library exists to accelerate exactly this workload: an
FP64 LU-based solver whose O(n^3) trailing-matrix GEMM updates run on
the int8 matrix engine (its LD_PRELOAD shim intercepts HPL's
cublasDgemm_v2 calls).  Here the solver is a native capability:

  * lu_factor: blocked right-looking LU with partial pivoting; the
    trailing updates go through oz.gemm(alpha=-1, beta=1, c=A22).
  * solve(..., refine=k): HPL-AI recipe — factor in a CHEAP mode
    (fewer int8 slices = proportionally faster), recover full f64
    accuracy with f64-residual refinement against the cheap factors.
"""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import ozimmu_tpu as oz
from ozimmu_tpu.linalg import lu_factor, solve

rng = np.random.default_rng(0)
N = 1024
A = rng.uniform(-1, 1, size=(N, N)) + 4.0 * np.eye(N)
x_true = rng.standard_normal(N)
b = A @ x_true


def resid(x):
    return np.linalg.norm(A @ x - b) / (
        np.linalg.norm(A) * np.linalg.norm(x) + np.linalg.norm(b)
    )


# full-accuracy factorization: ns=9 GEMM updates are at the f64 floor
x9 = solve(A, b, mode="fp64_int8_9", block=256)
print(f"fp64_int8_9 direct solve:        residual = {resid(x9):.3e}")

# HPL-AI: factor ONCE at ns=5 (15 pair products vs ns=9's 45 = 3x
# cheaper), then refinement steps (O(n^2) each) recover working precision
fac5 = oz.linalg.lu_factor(A, mode="fp64_int8_5", block=256)
x5 = solve(A, b, factor=fac5)
print(f"fp64_int8_5 direct solve:        residual = {resid(x5):.3e}")
for k in (1, 2, 3):
    xr = solve(A, b, factor=fac5, refine=k)
    print(f"fp64_int8_5 + {k} refinement step: residual = {resid(xr):.3e}")

# factor once, reuse for many right-hand sides
fac = lu_factor(A, mode="fp64_int8_9", block=256)
B = rng.standard_normal((N, 4))
X = oz.linalg.lu_solve(fac, B)
print("multi-rhs max residual:",
      max(resid_col for resid_col in
          (np.linalg.norm(A @ X[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
           for j in range(4))))
