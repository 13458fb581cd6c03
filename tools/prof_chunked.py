"""Phase breakdown of the column-panel-chunked engine at sizes that do
not fit unchunked (VERDICT r3 item 5: the 16384^3 chunked path had no
committed breakdown — prof_phases.py only covers 8192^3 unchunked).

Measures, with the dependent-chain methodology (tools/prof_phases.py):

  split_A      once per GEMM        (full M x M)
  split_B      once per panel       (M x W columns)
  recombine    once per panel       (da full, db panel -> S panel)
  pack         once per panel       (S panel + E panel -> f64 bits)

and composes the per-GEMM budget  split_A + (M/W) * (split_B + recombine
+ pack)  against the measured chunked engine time (bench.py).

Usage:  M=16384 W=2048 NS=9 python tools/prof_chunked.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "")

import time
from functools import partial

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ozimmu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ozimmu_tpu.core.f64x import F64X, from_f32
from ozimmu_tpu.ops.pack import pack_f64x
from ozimmu_tpu.ops.recombine import acc_shift
from ozimmu_tpu.ops.recombine_pallas import recombine_pallas
from ozimmu_tpu.ops.split import split_f64x, split_f64x_cols
from ozimmu_tpu.schedule import bits_per_int8

M = int(os.environ.get("M", 16384))
W = int(os.environ.get("W", 2048))
NS = int(os.environ.get("NS", 9))
ITERS = int(os.environ.get("ITERS", 8))
bb = bits_per_int8(M)
n_panels = -(-M // W)
print(f"M={M} W={W} ({n_panels} panels) ns={NS} b={bb}", file=sys.stderr)


def gen(key, n_cols):
    return from_f32(jax.random.uniform(key, (M, n_cols), dtype=jnp.float32))


k1, k2 = jax.random.split(jax.random.PRNGKey(0))
ax = jax.jit(gen, static_argnums=1)(k1, M)
bpx = jax.jit(gen, static_argnums=1)(k2, W)  # one B panel
jax.block_until_ready((ax.hi, bpx.hi))


def chain_time(make_body, init, iters=ITERS):
    @partial(jax.jit, static_argnums=(1,))
    def run(carry, n):
        return jax.lax.fori_loop(0, n, make_body, carry)

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[-1]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def t(n):
        r = run(init, n)
        sync(r)
        t0 = time.perf_counter()
        r = run(init, n)
        sync(r)
        return time.perf_counter() - t0

    t1 = t(iters)
    t2 = t(2 * iters)
    print(
        f"  raw: t({iters})={t1*1e3:.2f}ms t({2*iters})={t2*1e3:.2f}ms",
        file=sys.stderr,
    )
    return max((t2 - t1) / iters, 1e-9)


# --- split_A (full M x M, once per GEMM) -----------------------------------
def split_a_body(i, carry):
    ah, al = carry
    da, pa = split_f64x(F64X(ah, al), NS, bb)
    dep = (da[0, :, : al.shape[1]] & 1).astype(al.dtype)
    return ah, al ^ dep


t_split_a = chain_time(split_a_body, (ax.hi, ax.lo))
print(f"split_A (MxM):      {t_split_a*1e3:8.2f} ms", file=sys.stderr)


# --- split_B (one M x W panel) ----------------------------------------------
def split_b_body(i, carry):
    bh, bl = carry
    db, pb = split_f64x_cols(F64X(bh, bl), NS, bb)
    dep = (db[0, : bl.shape[0], :] & 1).astype(bl.dtype)
    return bh, bl ^ dep


t_split_b = chain_time(split_b_body, (bpx.hi, bpx.lo))
print(f"split_B (MxW):      {t_split_b*1e3:8.2f} ms/panel", file=sys.stderr)

# --- recombine (da full x db panel) -----------------------------------------
da0, pa = split_f64x(ax, NS, bb)
db0, pb = split_f64x_cols(bpx, NS, bb)
da0, db0 = jax.block_until_ready((da0, db0))


def rec_body(i, carry):
    da, db = carry
    S = recombine_pallas(da, db, NS, bb, M)
    dep = (S[0].astype(jnp.int8) & 1)[None]
    return da, db ^ dep


t_rec = chain_time(rec_body, (da0, db0))
print(f"recombine (panel):  {t_rec*1e3:8.2f} ms/panel", file=sys.stderr)

# --- pack (panel) ------------------------------------------------------------
S0 = recombine_pallas(da0, db0, NS, bb, M)
S0 = jax.block_until_ready(S0)
E0 = (pa[:, None] + pb[None, :] - acc_shift(NS, bb)).astype(jnp.int32)


def pack_body(i, carry):
    s0, s1, s2, E = carry
    o = pack_f64x((s0, s1, s2), E)
    return s0, s1, s2, E ^ (o.lo.astype(jnp.int32) & 1)


t_pack = chain_time(pack_body, (S0[0], S0[1], S0[2], E0))
print(f"pack (panel):       {t_pack*1e3:8.2f} ms/panel", file=sys.stderr)

per_panel = t_split_b + t_rec + t_pack
tot = t_split_a + n_panels * per_panel
ideal = 2 * M**3 * NS * (NS + 1) / 2 / (2 * M**3) / 394e12 * 2 * M**3
ideal = NS * (NS + 1) / 2 * 2 * M**2 * M / 394e12  # int8 MACs at 394 TOPS
print(f"--- composed budget per GEMM ({n_panels} panels)", file=sys.stderr)
print(f"split_A:            {t_split_a*1e3:8.2f} ms", file=sys.stderr)
print(f"split_B total:      {n_panels*t_split_b*1e3:8.2f} ms", file=sys.stderr)
print(f"recombine total:    {n_panels*t_rec*1e3:8.2f} ms", file=sys.stderr)
print(f"pack total:         {n_panels*t_pack*1e3:8.2f} ms", file=sys.stderr)
print(f"sum:                {tot*1e3:8.2f} ms", file=sys.stderr)
print(f"ideal MXU (dots):   {ideal*1e3:8.2f} ms (394 TOPS int8)", file=sys.stderr)
print(f"eff TFLOPS from sum: {2*M**3/tot/1e12:.2f}", file=sys.stderr)
