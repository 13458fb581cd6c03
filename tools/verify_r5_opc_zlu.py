"""Round-5 verify drive: Operation.C + complex device-resident LU on the
real chip.  Run from the repo root: ``python tools/verify_r5_opc_zlu.py``."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", "/root/.cache/ozimmu_jax"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import ozimmu_tpu as oz  # noqa: E402
from ozimmu_tpu import linalg  # noqa: E402

print("device:", jax.devices()[0])

rng = np.random.default_rng(0)

# 1. complex op C vs numpy
m, n, k = 256, 192, 320
a = rng.uniform(-1, 1, (k, m)) + 1j * rng.uniform(-1, 1, (k, m))
b = rng.uniform(-1, 1, (n, k)) + 1j * rng.uniform(-1, 1, (n, k))
c = oz.gemm(a, b, mode="fp64_int8_9", op_a="C", op_b="C")
ref = np.conj(a).T @ np.conj(b).T
r = np.linalg.norm(c - ref) / np.linalg.norm(ref)
print(f"zgemm op C/C residual: {r:.3e}")
assert r < 1e-15, r

# 2. real op C == op T bitwise
x = rng.uniform(-1, 1, (128, 96))
y = rng.uniform(-1, 1, (128, 64))
ct = oz.gemm(x, y, mode="fp64_int8_9", op_a="T")
cc = oz.gemm(x, y, mode="fp64_int8_9", op_a="C")
assert np.array_equal(ct.view(np.uint64), cc.view(np.uint64))
print("real op C == op T: bitwise OK")

# 3. complex device-resident LU, host panels
nn = 256
az = rng.uniform(-1, 1, (nn, nn)) + 1j * rng.uniform(-1, 1, (nn, nn))
az += nn * np.eye(nn)
lu_d, piv_d = linalg.lu_factor(az, mode="fp64_int8_9", block=64, device=True)
lu_h, piv_h = linalg.lu_factor(az, mode="fp64_int8_9", block=64, device=False)
assert np.array_equal(piv_d, piv_h), "pivot mismatch host vs device"
l = np.tril(lu_d, -1) + np.eye(nn)
u = np.triu(lu_d)
pa = az.copy()
for i in range(nn):
    p = piv_d[i]
    if p != i:
        pa[[i, p], :] = pa[[p, i], :]
res = np.linalg.norm(l @ u - pa) / np.linalg.norm(az)
print(f"complex device LU (host panels) residual: {res:.3e}")
assert res < 1e-14, res

# 4. complex device-resident LU, device panels
lu_p, piv_p = linalg.lu_factor(
    az, mode="fp64_int8_9", block=64, device=True, panel="device"
)
assert np.array_equal(piv_p, piv_h), "pivot mismatch device panels"
l = np.tril(lu_p, -1) + np.eye(nn)
u = np.triu(lu_p)
res = np.linalg.norm(l @ u - pa) / np.linalg.norm(az)
print(f"complex device LU (device panels) residual: {res:.3e}")
assert res < 1e-14, res

# 5. complex solve end-to-end through the complex device factor
xt = rng.uniform(-1, 1, nn) + 1j * rng.uniform(-1, 1, nn)
bz = az @ xt
xs = linalg.lu_solve((lu_d, piv_d), bz)
err = np.linalg.norm(xs - xt) / np.linalg.norm(xt)
print(f"complex solve forward error: {err:.3e}")
assert err < 1e-12, err

print("ALL OK")
