"""Test configuration: run JAX on CPU with 8 virtual devices and x64 on.

On the CPU backend every dtype is true IEEE, so engine arithmetic
(int32 splits, f32-triple recombination) is bit-reproducible and the
distributed path can be exercised on a virtual 8-device mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
