import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Feeding a pod-scale GEMM with O(shard) host memory per process.

At the north-star configuration (BASELINE.json configs[4]: 131072^3) one
f64 operand is ~137 GB — no host can materialize it, so the wrappers
that take a full numpy array cannot feed that scale.  This example shows
the production path:

1. `shard_local_f64x(shape, mesh, spec, fill)` — each process synthesizes
   (or mmap-loads) ONLY its addressable shards; the exact hi/lo bit split
   happens per shard.
2. `sharded_gemm_presharded(ax, bx, ns, mesh)` — runs the distributed
   engine directly on the sharded planes: no gather, no host copy; the
   result stays sharded on the mesh.

Demo sizes are small (virtual 8-CPU-device mesh); the code is identical
on a real pod — only `shape` and the mesh change.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import numpy as np
import jax

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat:
    jax.config.update("jax_platforms", _plat)
jax.config.update("jax_enable_x64", True)

from jax.sharding import PartitionSpec as P

import ozimmu_tpu as oz
from ozimmu_tpu.parallel.gemm import make_mesh_2d, sharded_gemm_presharded
from ozimmu_tpu.parallel.launch import shard_local_f64x

m = n = k = 512
mesh = make_mesh_2d()

# fill(idx) receives the GLOBAL index of one shard (a tuple of slices)
# and returns that block.  Here we synthesize deterministically from the
# global coordinates so every process computes identical global data
# without ever holding it; a production loader would read the block from
# a parallel filesystem / np.load(..., mmap_mode="r")[idx].
def synth(shape_):
    def fill(idx):
        r = np.arange(*idx[0].indices(shape_[0]))[:, None]
        c = np.arange(*idx[1].indices(shape_[1]))[None, :]
        return np.sin(0.01 * r * shape_[1] + 0.013 * c) + 1.0
    return fill

ax = shard_local_f64x((m, k), mesh, P("x", "y"), synth((m, k)))
bx = shard_local_f64x((k, n), mesh, P("x", "y"), synth((k, n)))

out = sharded_gemm_presharded(ax, bx, 9, mesh)  # result stays on the mesh
got = out.to_numpy().reshape(m, n)

# check against the same data built densely (only possible at demo size)
a = np.fromfunction(lambda r, c: np.sin(0.01 * r * k + 0.013 * c) + 1.0, (m, k))
b = np.fromfunction(lambda r, c: np.sin(0.01 * r * n + 0.013 * c) + 1.0, (k, n))
want = oz.gemm(a, b, mode="fp64_int8_9")
print("mesh:", mesh.devices.shape,
      "bitwise == dense-fed engine:",
      np.array_equal(got.view(np.uint64), want.view(np.uint64)))
print("residual:", np.linalg.norm(got - a @ b) / np.linalg.norm(a @ b))
