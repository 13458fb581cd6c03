"""Measure (not assert) collective/compute overlap in the sharded GEMM.

Round-1 VERDICT weak #3/#7: the claim "XLA overlaps the gathers with the
splits/compute" was asserted, never measured.  This probe produces the
measured replacement for docs/DESIGN.md via a cost decomposition:

  * t_full        — full sharded GEMM step (split + gather + compute + pack)
  * t_splitgather — split + int8-plane all_gathers only (gathered planes
                    returned as-is, no contraction)
  * t_compute     — recombination + pack only, on PRE-gathered planes
                    (no splits, no collectives)

  overlap_ratio = (t_splitgather + t_compute) / t_full
    > 1  => the runtime overlaps/fuses stages (pipelined schedule)
    ~= 1 => serialized schedule (sum of parts == whole)

Caveat (documented in DESIGN.md): the only multi-device mesh available on
this platform is 8 virtual CPU devices, where "collectives" are
shared-memory copies — the ratio measures XLA's *scheduling*, not ICI
latency hiding.  On a real pod slice the same program structure applies.

Usage: python tools/overlap_probe.py [m] [k] [n] [ns] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# BEFORE any backend query (see memory: the first jax.devices() freezes
# the client with whatever platform/flags are visible at that moment)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from functools import partial  # noqa: E402

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from ozimmu_tpu.core.f64x import F64X  # noqa: E402
from ozimmu_tpu.ops.pack import pack_f64x  # noqa: E402
from ozimmu_tpu.ops.recombine import acc_shift, recombine_auto  # noqa: E402
from ozimmu_tpu.parallel.gemm import _local_split, make_mesh_2d, shard_map  # noqa: E402
from ozimmu_tpu.schedule import bits_per_int8  # noqa: E402


def _timeit(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(m=1024, k=2048, n=1024, ns=9, iters=8):
    mesh = make_mesh_2d(8)
    b = bits_per_int8(k)
    spec2d = P("x", "y")
    spec_da = P(None, "x", None)  # gathered A planes [ns, m, k], rows sharded
    spec_db = P(None, None, "y")  # gathered B planes [ns, k, n], cols sharded
    spec_pa = P("x")
    spec_pb = P("y")

    @partial(
        shard_map, mesh=mesh, in_specs=(spec2d,) * 4,
        out_specs=(spec_da, spec_pa, spec_db, spec_pb), check_vma=False,
    )
    def split_gather(a_hi, a_lo, b_hi, b_lo):
        da, pa = _local_split(F64X(a_hi, a_lo), "y", ns, b, axis=1)
        db, pb = _local_split(F64X(b_hi, b_lo), "x", ns, b, axis=0)
        da = jax.lax.all_gather(da, "y", axis=2, tiled=True)
        db = jax.lax.all_gather(db, "x", axis=1, tiled=True)
        return da, pa, db, pb

    @partial(
        shard_map, mesh=mesh, in_specs=(spec_da, spec_pa, spec_db, spec_pb),
        out_specs=spec2d, check_vma=False,
    )
    def compute_only(da, pa, db, pb):
        S = recombine_auto(da, db, ns, b, k)
        E = (pa[:, None] + pb[None, :] - acc_shift(ns, b)).astype(jnp.int32)
        return pack_f64x(S, E).hi

    @partial(
        shard_map, mesh=mesh, in_specs=(spec2d,) * 4, out_specs=spec2d,
        check_vma=False,
    )
    def full(a_hi, a_lo, b_hi, b_lo):
        da, pa = _local_split(F64X(a_hi, a_lo), "y", ns, b, axis=1)
        db, pb = _local_split(F64X(b_hi, b_lo), "x", ns, b, axis=0)
        da = jax.lax.all_gather(da, "y", axis=2, tiled=True)
        db = jax.lax.all_gather(db, "x", axis=1, tiled=True)
        S = recombine_auto(da, db, ns, b, k)
        E = (pa[:, None] + pb[None, :] - acc_shift(ns, b)).astype(jnp.int32)
        return pack_f64x(S, E).hi

    rng = np.random.default_rng(0)
    a = F64X.from_numpy(rng.uniform(size=(m, k)))
    bm = F64X.from_numpy(rng.uniform(size=(k, n)))
    s2 = NamedSharding(mesh, spec2d)
    args = tuple(jax.device_put(x, s2) for x in (a.hi, a.lo, bm.hi, bm.lo))

    jsg = jax.jit(split_gather)
    planes = jsg(*args)
    jax.block_until_ready(planes)

    t_full = _timeit(jax.jit(full), args, iters)
    t_sg = _timeit(jsg, args, iters)
    t_comp = _timeit(jax.jit(compute_only), planes, iters)

    ratio = (t_sg + t_comp) / t_full
    mesh_shape = "x".join(str(v) for v in mesh.devices.shape)
    print(f"shape m={m} k={k} n={n} ns={ns} mesh={mesh_shape} (8 CPU devices)")
    print(f"t_full         = {t_full * 1e3:8.2f} ms  (split+gather+compute+pack)")
    print(f"t_split_gather = {t_sg * 1e3:8.2f} ms  (split + int8 all_gathers)")
    print(f"t_compute_only = {t_comp * 1e3:8.2f} ms  (recombine+pack, pre-gathered)")
    print(
        f"overlap_ratio  = {ratio:.3f}  "
        f"({'pipelined/overlapped' if ratio > 1.05 else 'serialized'} schedule)"
    )
    return 0


if __name__ == "__main__":
    argv = [int(v) for v in sys.argv[1:]]
    sys.exit(main(*argv))
