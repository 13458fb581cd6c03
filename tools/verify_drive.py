import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""User-level drive of the public API on real TPU (verification script)."""
import os, sys
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import ozimmu_tpu as oz

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(42)

def resid(c, a, b):
    ref = a @ b
    return np.linalg.norm(c - ref) / np.linalg.norm(ref)

# 1. plain matmul, aligned shape, headline mode
a = rng.uniform(size=(2048, 2048)); b = rng.uniform(size=(2048, 2048))
c = oz.matmul(a, b, mode="fp64_int8_9")
print(f"1. matmul 2048^3 int8_9 residual: {resid(np.asarray(c), a, b):.3e}", flush=True)

# 2. unaligned shapes exercising pad paths of BOTH new kernels
a2 = rng.standard_normal((1000, 1234)); b2 = rng.standard_normal((1234, 777))
c2 = oz.matmul(a2, b2, mode="fp64_int8_9")
print(f"2. matmul 1000x1234x777 residual: {resid(np.asarray(c2), a2, b2):.3e}", flush=True)

# 3. wide exponent spread + deepest split count (ns=18: 128-bit windows)
a3 = (rng.uniform(size=(512, 640)) - 0.5) * np.exp(8 * rng.standard_normal((512, 640)))
b3 = (rng.uniform(size=(640, 512)) - 0.5) * np.exp(8 * rng.standard_normal((640, 512)))
c3 = oz.matmul(a3, b3, mode="fp64_int8_18")
print(f"3. exp_rand-8 512x640x512 int8_18 residual: {resid(np.asarray(c3), a3, b3):.3e}", flush=True)

# 4. engine equivalence on device: pallas vs xla path bit-identical
os.environ["OZIMMU_ENGINE"] = "xla"
cx = oz.matmul(a, b, mode="fp64_int8_9")
os.environ["OZIMMU_ENGINE"] = "pallas"
cp = oz.matmul(a, b, mode="fp64_int8_9")
os.environ.pop("OZIMMU_ENGINE")
bitsame = np.array_equal(np.asarray(cx).view(np.uint64), np.asarray(cp).view(np.uint64))
print(f"4. xla-vs-pallas engines bit-identical: {bitsame}", flush=True)

# 5. BLAS epilogue + transpose through gemm
c5 = oz.gemm(a2.T, b2, mode="fp64_int8_9", op_a="T", alpha=2.5, beta=1.0,
             c=np.ones((1000, 777)))
ref5 = 2.5 * (a2 @ b2) + 1.0
r5 = np.linalg.norm(np.asarray(c5) - ref5) / np.linalg.norm(ref5)
print(f"5. gemm op_a=T alpha=2.5 beta=1 residual: {r5:.3e}", flush=True)

# 6. probe: shape mismatch error
try:
    oz.matmul(a, b2, mode="fp64_int8_9")
    print("6. shape mismatch: NO ERROR (bad)", flush=True)
except Exception as e:
    print(f"6. shape mismatch raises {type(e).__name__}: {str(e)[:60]}", flush=True)

# 7. probe: zgemm (complex) still fine on top of the new kernels
az = a3[:256, :256] + 1j * b3[:256, :256]
bz = b3[:256, :256] - 1j * a3[:256, :256]
cz = oz.gemm(az, bz, mode="fp64_int8_12")
refz = az @ bz
rz = np.linalg.norm(np.asarray(cz) - refz) / np.linalg.norm(refz)
print(f"7. zgemm 256^3 int8_12 exp-spread residual: {rz:.3e}", flush=True)

# --- round-2 surface --------------------------------------------------------

# 8. complex zgemm with complex alpha/beta (shared fold refactor)
zc = rng.normal(size=(256, 256)) + 1j * rng.normal(size=(256, 256))
al, be = 1.5 - 0.5j, 0.25 + 2.0j
z8 = oz.gemm(az, bz, mode="fp64_int8_10", alpha=al, beta=be, c=zc)
ref8 = al * (az @ bz) + be * zc
r8 = np.linalg.norm(np.asarray(z8) - ref8) / np.linalg.norm(ref8)
print(f"8. zgemm complex alpha/beta residual: {r8:.3e}", flush=True)

# 9. complex sgemm demotion on device (2D + batched): must be f32-grade
s9 = oz.gemm(az, bz, mode="sgemm", alpha=al, beta=be, c=zc)
r9 = np.linalg.norm(np.asarray(s9) - ref8) / np.linalg.norm(ref8)
b9 = oz.gemm_batched(np.stack([az, 2 * az]), np.stack([bz, bz]), mode="sgemm")
r9b = np.linalg.norm(b9[1] - 2 * (az @ bz)) / np.linalg.norm(2 * az @ bz)
ok9 = 1e-10 < r9 < 1e-4 and 1e-10 < r9b < 1e-4
print(f"9. complex sgemm demotion 2D r={r9:.3e} batched r={r9b:.3e} "
      f"({'OK' if ok9 else 'BAD'})", flush=True)

# 10. staged complex profiler bit-matches fused
h = oz.create()
oz.enable_profiling(h)
z10 = oz.gemm(az, bz, mode="fp64_int8_10", alpha=al, beta=be, c=zc, handle=h)
oz.disable_profiling(h)
print(f"10. staged complex == fused: {np.array_equal(z10, z8)}", flush=True)

# 11. chunked engine core bit-matches fused (the 16384^3-enabling path)
from ozimmu_tpu.core.f64x import F64X
from ozimmu_tpu.core.gemm import _gemm_core, _gemm_core_nchunked

ax1 = F64X.from_numpy(a2[:256, :256])
bx1 = F64X.from_numpy(b2[:256, :256])
o1 = _gemm_core(ax1, bx1, 9, 1.0, 0.0)
o2 = _gemm_core_nchunked(ax1, bx1, 9, 4)
print(f"11. chunked core bit-identical: "
      f"{np.array_equal(o1.to_numpy(), o2.to_numpy())}", flush=True)

# --- round-3 surface --------------------------------------------------------

# 12. auto-chunked PUBLIC gemm (tiny HBM budget) bit-matches unchunked,
#     full epilogue included — the productized 16384^3 path
c5u = np.asarray(c5)
os.environ["OZIMMU_HBM_BUDGET_MB"] = "1"
c12 = oz.gemm(a2.T, b2, mode="fp64_int8_9", op_a="T", alpha=2.5, beta=1.0,
              c=np.ones((1000, 777)))
os.environ.pop("OZIMMU_HBM_BUDGET_MB")
print(f"12. auto-chunked gemm (epilogue) bit-identical: "
      f"{np.array_equal(np.asarray(c12).view(np.uint64), c5u.view(np.uint64))}",
      flush=True)

# 13. auto-chunked complex engine via public gemm
os.environ["OZIMMU_HBM_BUDGET_MB"] = "1"
z13 = oz.gemm(az, bz, mode="fp64_int8_10", alpha=al, beta=be, c=zc)
os.environ.pop("OZIMMU_HBM_BUDGET_MB")
print(f"13. auto-chunked zgemm bit-identical: "
      f"{np.array_equal(np.asarray(z13).view(np.uint64), np.asarray(z8).view(np.uint64))}",
      flush=True)

# 14. round-to-nearest-even ties survive the device epilogue
a14 = np.array([[1.0, 1.0]])
t1 = np.asarray(oz.matmul(a14, np.array([[1.0], [2.0**-53]]), mode="fp64_int8_9"))
t2 = np.asarray(oz.matmul(a14, np.array([[1.0], [3 * 2.0**-53]]), mode="fp64_int8_9"))
ok14 = t1[0, 0] == 1.0 and t2[0, 0] == 1.0 + 2.0**-51
print(f"14. RNE ties on device: {'OK' if ok14 else f'BAD {t1} {t2}'}", flush=True)

# 15. unified complex AUTO: host API auto == the shared-counter pick
from ozimmu_tpu.core.f64x import F64X as _F
from ozimmu_tpu.ops.mantissa_loss import auto_mode_select_complex

h15 = oz.create()
h15.avg_mantissa_loss_threshold = 0.5
exp15 = auto_mode_select_complex(
    _F.from_numpy(np.ascontiguousarray(az.real)), _F.from_numpy(np.ascontiguousarray(az.imag)),
    _F.from_numpy(np.ascontiguousarray(bz.real)), _F.from_numpy(np.ascontiguousarray(bz.imag)),
    az.shape[1], 0.5,
)
z15a = oz.gemm(az, bz, mode="fp64_int8_auto", handle=h15)
z15f = oz.gemm(az, bz, mode=exp15, handle=h15)
print(f"15. complex AUTO ({exp15.value}) == fixed bitwise: "
      f"{np.array_equal(np.asarray(z15a).view(np.uint64), np.asarray(z15f).view(np.uint64))}",
      flush=True)

print("done", flush=True)
