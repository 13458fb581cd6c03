import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Drop-in interception: reroute existing JAX f64 matmuls (the LD_PRELOAD
shim equivalent).  Works eagerly and under jax.jit."""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import ozimmu_tpu as oz
import ozimmu_tpu.intercept as ozi

h = oz.create()
# reference-compatible thresholds (default 1024; shrink for the demo)
h.intercept_threshold_m = h.intercept_threshold_n = h.intercept_threshold_k = 256

rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(size=(512, 512)), dtype=jnp.float64)
b = jnp.asarray(rng.uniform(size=(512, 512)), dtype=jnp.float64)

with ozi.intercept(mode="fp64_int8_9", handle=h):
    c1 = jnp.dot(a, b)            # rerouted
    c2 = jax.jit(lambda x, y: x @ y)(a, b)   # rerouted inside jit too
    small = jnp.dot(a[:64, :64], b[:64, :64])  # below threshold: native

ref = np.asarray(a) @ np.asarray(b)
print("eager residual:", np.linalg.norm(np.asarray(c1) - ref) / np.linalg.norm(ref))
print("jit residual:  ", np.linalg.norm(np.asarray(c2) - ref) / np.linalg.norm(ref))

# or configure by environment, read per call (reference cublas.cu:18-48):
#   OZIMMU_COMPUTE_MODE=fp64_int8_9 python my_program.py
# with ozi.enable() called once at startup.
