import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from functools import partial

from ozimmu_tpu.core.f64x import F64X
from ozimmu_tpu.ops.split import split_f64x, split_f64x_cols
from ozimmu_tpu.ops.recombine import acc_shift
from ozimmu_tpu.ops.recombine_pallas import recombine_pallas
from ozimmu_tpu.ops.pack import pack_f64x
from ozimmu_tpu.schedule import bits_per_int8

M = int(os.environ.get("M", 4096))
NS = int(os.environ.get("NS", 9))
ITERS = int(os.environ.get("ITERS", 8))
bb = bits_per_int8(M)
print(f"M={M} ns={NS} b={bb}", file=sys.stderr)

rng = np.random.default_rng(0)
ax = F64X.from_numpy(rng.uniform(size=(M, M)))
bx = F64X.from_numpy(rng.uniform(size=(M, M)))


def chain_time(make_body, init, iters=ITERS):
    """Time per-iteration cost of a dependent chain, diffing 2 run lengths."""
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
    print(f"  raw: t({iters})={t1*1e3:.2f}ms t({2*iters})={t2*1e3:.2f}ms", file=sys.stderr)
    return max((t2 - t1) / iters, 1e-9)


# --- split (both operands) -------------------------------------------------
def split_body(i, carry):
    ah, al, bh, bl = carry
    da, pa = split_f64x(F64X(ah, al), NS, bb)
    db, pb = split_f64x_cols(F64X(bh, bl), NS, bb)
    dep = ((da[0] & 1) ^ (db[0] & 1)).astype(al.dtype)
    return ah, al ^ dep, bh, bl ^ dep

t_split = chain_time(split_body, (ax.hi, ax.lo, bx.hi, bx.lo))
print(f"split(A+B): {t_split*1e3:8.2f} ms", file=sys.stderr)

# --- recombine ---------------------------------------------------------------
da0, pa = split_f64x(ax, NS, bb)
db0, pb = split_f64x_cols(bx, NS, bb)
da0, db0 = jax.block_until_ready((da0, db0))

def rec_body(i, carry):
    da, db = carry
    S = recombine_pallas(da, db, NS, bb, M)
    dep = (S[0].astype(jnp.int8) & 1)[None]
    return da ^ dep, db

t_rec = chain_time(rec_body, (da0, db0))
print(f"recombine:  {t_rec*1e3:8.2f} ms", file=sys.stderr)

# --- pack --------------------------------------------------------------------
S0 = recombine_pallas(da0, db0, NS, bb, M)
S0 = jax.block_until_ready(S0)
E0 = (pa[:, None] + pb[None, :] - acc_shift(NS, bb)).astype(jnp.int32)

def pack_body(i, carry):
    s0, s1, s2, E = carry
    o = pack_f64x((s0, s1, s2), E)
    return s0, s1, s2, E ^ (o.lo.astype(jnp.int32) & 1)

t_pack = chain_time(pack_body, (S0[0], S0[1], S0[2], E0))
print(f"pack:       {t_pack*1e3:8.2f} ms", file=sys.stderr)

tot = t_split + t_rec + t_pack
ideal = 2 * M**3 * NS * (NS + 1) / 2 / 394e12
print(f"sum:        {tot*1e3:8.2f} ms", file=sys.stderr)
print(f"ideal MXU:  {ideal*1e3:8.2f} ms (394 TOPS int8)", file=sys.stderr)
print(f"eff TFLOPS from sum: {2*M**3/tot/1e12:.2f}", file=sys.stderr)
