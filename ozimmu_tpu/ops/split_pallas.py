"""Fused Pallas split kernel: f64 bit planes -> int8 digit planes in one pass.

The XLA elementwise path (ops/split.py) is correct everywhere but XLA
materializes each of the ns digit planes as a separate fusion, re-reading
the mantissa words per plane (~4x off the bandwidth bound at ns=9).  This
kernel reads hi/lo once and writes all ns planes in a single pass.

Algorithm (exact, integer-only — same semantics as ops/split.py, which
re-derives reference src/split.cu:154-242):

  1. assemble the 53-bit significand m53 (implicit bit for exponent-field
     > 0, raw mantissa otherwise — split.cu:160-162);
  2. top-align it in a 128-bit register: t128 = (m53 << 75) >> u where
     ``u = E_row + 1 - E`` is the exponent gap (>= 1); rows whose max
     exponent field is 0 use u = 159 which flushes every digit to zero
     (split.cu:203 semantics);
  3. digit i (1-indexed) is then a FIXED window: bits
     [128 - i*b, 128 - i*b + b) of t128 — one variable 128-bit funnel
     shift per element replaces ns variable-shift window extractions.
     128 bits cover i*b <= 126 = the deepest window of ns=18, b=7;
  4. sign-magnitude: digits multiply by the operand's sign
     (split.cu:159).

The variable shift runs on four uint32 words.  All shift amounts are
masked to [0, 31]; word-granularity shifts use select chains, so every
lane executes defined operations regardless of u.

Layout: ``axis=1`` splits A [m, k] against per-row exponents; ``axis=0``
splits B [k, n] against per-column exponents directly in [k, n] layout
(no plane transposes — reference split.cu:277-282 swaps ops instead).

x64 note: traced under ``jax.enable_x64(False)`` like recombine_pallas —
all dtypes are explicit so results are identical either way.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MANT_HI_MASK = np.uint32(0x000FFFFF)
_EXP_MASK = np.uint32(0x7FF00000)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shr128(w0, w1, w2, w3, u):
    """(w0:w1:w2:w3) >> u for per-lane uint32 u in [0, 159]; u >= 128 -> 0.

    Word 0 is the most significant.  Returns four uint32 words.
    """
    s = (u & np.uint32(31)).astype(jnp.uint32)
    # bit-granularity funnel; ((x << (31-s)) << 1) == x << (32-s), and == 0
    # at s == 0, exactly the no-carry case
    c1 = (w0 << ((np.uint32(31) - s))) << np.uint32(1)
    c2 = (w1 << ((np.uint32(31) - s))) << np.uint32(1)
    c3 = (w2 << ((np.uint32(31) - s))) << np.uint32(1)
    x0 = w0 >> s
    x1 = (w1 >> s) | c1
    x2 = (w2 >> s) | c2
    x3 = (w3 >> s) | c3
    # word-granularity shift by u // 32 in [0, 4]; >= 4 flushes to zero
    ws = (u >> np.uint32(5)).astype(jnp.int32)
    z = jnp.zeros_like(x0)

    def sel(parts):
        out = z
        for wsv, val in parts:
            out = jnp.where(ws == wsv, val, out)
        return out

    y0 = sel([(0, x0)])
    y1 = sel([(0, x1), (1, x0)])
    y2 = sel([(0, x2), (1, x1), (2, x0)])
    y3 = sel([(0, x3), (1, x2), (2, x1), (3, x0)])
    return y0, y1, y2, y3


def _extract_digits(hi, lo, e_bcast, num_split: int, b: int):
    """Shared digit-extraction body; hi/lo uint32, e_bcast int32 row/col max."""
    e = ((hi & _EXP_MASK) >> np.uint32(20)).astype(jnp.int32)
    m_hi = hi & _MANT_HI_MASK
    m_hi = jnp.where(e > 0, m_hi | np.uint32(1 << 20), m_hi)
    m_lo = lo
    sgn = (hi >> np.uint32(31)).astype(jnp.int32)
    dsign = np.int32(1) - np.int32(2) * sgn

    delta = e_bcast + 1 - e
    u = jnp.where(e_bcast > 0, delta, np.int32(159))
    u = jnp.minimum(u, np.int32(159)).astype(jnp.uint32)

    # m53 << 75 in 128 bits: w0 = m53 bits 52..21, w1 = bits 20..0 << 11
    w0 = (m_hi << np.uint32(11)) | (m_lo >> np.uint32(21))
    w1 = m_lo << np.uint32(11)
    z = jnp.zeros_like(w0)
    t0, t1, t2, t3 = _shr128(w0, w1, z, z, u)
    t = (t0, t1, t2, t3)

    mask = np.uint32((1 << b) - 1)
    planes = []
    for plane in range(num_split):
        i = plane + 1
        q = 128 - i * b  # window LSB position within t128
        wi = 3 - (q // 32)  # word holding the LSB (w index from MSB)
        o = q % 32
        if o + b <= 32:
            win = (t[wi] >> np.uint32(o)) & mask
        else:
            win = ((t[wi] >> np.uint32(o)) | (t[wi - 1] << np.uint32(32 - o))) & mask
        d = win.astype(jnp.int32) * dsign
        planes.append(d.astype(jnp.int8))
    return planes


def _make_kernel(num_split: int, b: int, axis: int):
    def kernel(hi_ref, lo_ref, e_ref, out_ref):
        e = e_ref[:].astype(jnp.int32)  # [bm, 1] or [1, bn], broadcasts
        planes = _extract_digits(hi_ref[:], lo_ref[:], e, num_split, b)
        for p, d in enumerate(planes):
            out_ref[p] = d

    return kernel


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), inline=True)
def split_digits_pallas(
    hi: jax.Array,
    lo: jax.Array,
    e_max: jax.Array,
    num_split: int,
    b: int,
    axis: int = 1,
    block_r: int = 256,
    block_c: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Digit planes int8 [ns, R, C] for bit planes [R, C] against ``e_max``
    (int32 [R] for axis=1, [C] for axis=0).  pexp is computed by the caller
    (ops/split.py) — it is O(R) work.
    """
    R, C = hi.shape
    br = min(block_r, _round_up(R, 8 if axis == 1 else 8))
    bc = min(block_c, _round_up(C, 128))
    # Scoped-VMEM model, calibrated against the v5e compiler's reported
    # stack allocations: double-buffered in (2 x u32) + out (ns x int8)
    # blocks plus ~26 B/elem of kernel-internal funnel temporaries
    # (measured: ns=10 -> 16.01 MiB, ns=12 -> 17.00 MiB at br*bc=256Ki).
    # Budget 15.4 MiB of the 16 MiB limit keeps ns<=9 on the full
    # (256, 1024) blocks (the benchmarked configuration: 15.0 MiB model,
    # ~15.5 MiB actual) and shrinks ns>=10, which previously OOMed at
    # compile time on large shapes (model underestimates by ~0.5 MiB of
    # index/e-block overhead).
    br0, bc0 = br, bc
    while br * bc * (2 * (2 * 4 + num_split) + 26) > int(15.4 * 1024 * 1024) and (
        bc > 128 or br > 8
    ):
        # shrink while preserving the (8, 128) tile granule
        if bc > 128:
            bc = max(128, (bc // 2 // 128) * 128)
        else:
            br = max(8, (br // 2 // 8) * 8)
    if (br, bc) != (br0, bc0):
        # observable in bench logs: the VMEM model is calibrated against
        # the current toolchain — a compiler upgrade that silently lands
        # shapes in this slow path would otherwise regress unnoticed
        from ..utils.log import log

        log(
            f"split_pallas: VMEM model shrank block ({br0}, {bc0}) -> "
            f"({br}, {bc}) at ns={num_split} (shape {R}x{C})"
        )
    r_pad = _round_up(R, br)
    c_pad = _round_up(C, bc)
    if (r_pad, c_pad) != (R, C):
        pad = ((0, r_pad - R), (0, c_pad - C))
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    if axis == 1:
        e2 = e_max.reshape(-1, 1).astype(jnp.int32)
        if r_pad != R:
            e2 = jnp.pad(e2, ((0, r_pad - R), (0, 0)))
        e_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    else:
        e2 = e_max.reshape(1, -1).astype(jnp.int32)
        if c_pad != C:
            e2 = jnp.pad(e2, ((0, 0), (0, c_pad - C)))
        e_spec = pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    grid = (r_pad // br, c_pad // bc)
    kernel = _make_kernel(num_split, b, axis)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((num_split, r_pad, c_pad), jnp.int8),
            in_specs=[
                pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                e_spec,
            ],
            out_specs=pl.BlockSpec(
                (num_split, br, bc), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(hi, lo, e2)
    if (r_pad, c_pad) != (R, C):
        out = out[:, :R, :C]
    return out
