import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Multi-chip sharded DGEMM over a jax.sharding.Mesh.

Runs on real TPU pods; for a laptop demo it uses 8 virtual CPU devices.
All cross-chip traffic is int8 digit planes over ICI; results are
bit-identical to the single-chip engine.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import numpy as np
import jax

# On hosts where jax was pre-imported (remote-TPU shells), XLA_FLAGS only
# takes effect for clients created after a jax_platforms config update and
# before any device query — so re-apply the user's platform choice here.
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat:
    jax.config.update("jax_platforms", _plat)
jax.config.update("jax_enable_x64", True)

import ozimmu_tpu as oz
from ozimmu_tpu.parallel.gemm import make_mesh_2d, sharded_gemm

rng = np.random.default_rng(0)
a = rng.uniform(size=(256, 512))
b = rng.uniform(size=(512, 128))

mesh = make_mesh_2d()  # largest (x, y) grid over all devices
c = sharded_gemm(a, b, 9, mesh)
print("mesh:", mesh.devices.shape,
      "residual:", np.linalg.norm(c - a @ b) / np.linalg.norm(a @ b))

# bit-identical to single chip
c_local = oz.gemm(a, b, mode="fp64_int8_9")
print("bitwise == local:", np.array_equal(c.view(np.uint64), c_local.view(np.uint64)))

# Cannon-streamed variant for square meshes: q-fold lower peak memory,
# for problems whose gathered slabs would not fit in HBM
if len(jax.devices()) >= 4:
    sq = make_mesh_2d(4)
    c_ring = sharded_gemm(a, b, 9, sq, ring=True)
    print("ring bitwise == local:",
          np.array_equal(c_ring.view(np.uint64), c_local.view(np.uint64)))
else:
    print("ring demo needs >= 4 devices (run with JAX_PLATFORMS=cpu "
          "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
