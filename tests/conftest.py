"""Test configuration: run JAX on CPU with 8 virtual devices and x64 on.

On the CPU backend every dtype is true IEEE, so engine arithmetic
(int32 splits, f32-triple recombination) is bit-reproducible and the
distributed path can be exercised on a virtual 8-device mesh.
"""

import os

# Force CPU unless explicitly overridden with OZ_TEST_PLATFORM=tpu: the
# session environment presets JAX_PLATFORMS (e.g. to a TPU tunnel), and
# remote compiles make the suite orders of magnitude slower.  The engine's
# integer/f32 numerics are backend-invariant (validated on real TPU).
_plat = os.environ.get("OZ_TEST_PLATFORM", "cpu")
if _plat == "tpu":
    # Let jax auto-pick the available TPU plugin: remote-tunnel setups
    # register devices with platform name "tpu" under a differently-named
    # plugin, so pinning JAX_PLATFORMS="tpu" fails there.
    _plat = ""
os.environ["JAX_PLATFORMS"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A pytest plugin (jaxtyping) imports jax before this conftest runs, so the
# env var alone is snapshotted too early — set the config explicitly.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the engine graphs are large (unrolled slice
# schedules) and dominate test wall-time otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/ozimmu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
