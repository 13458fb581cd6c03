"""Exact float64 carriage for TPU: IEEE-754 bits as two int32 planes.

Why this exists: XLA:TPU has no native float64 — ``jnp.float64`` arrays on
TPU are stored and computed as float32 pairs (~49-bit significand, float32
exponent range).  Merely *placing* an f64 array on a TPU loses mantissa
bits and overflows beyond ~1e38.  A faithful FP64 GEMM engine therefore
cannot touch XLA f64 on device.  ``F64X`` carries the raw IEEE-754 bit
pattern as two uint32 arrays (hi = sign/exponent/mantissa-high, lo =
mantissa-low), which every backend stores exactly.  Host conversion is a
free numpy view; device kernels operate on the bits with native int32 ops.

The reference engine has no analogue — CUDA has real f64 — this type is
the TPU-first answer to the same requirement (exact operand bits feeding
the split kernel, reference src/split.cu:154-185).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class F64X:
    """Exact float64 tensor as IEEE bit planes (hi, lo), both uint32."""

    hi: jax.Array
    lo: jax.Array

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- properties ------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.hi.shape)

    @property
    def ndim(self) -> int:
        return self.hi.ndim

    # -- conversions -----------------------------------------------------
    @classmethod
    def from_numpy(cls, x: np.ndarray) -> "F64X":
        """Exact host conversion (a bit-level view; no rounding)."""
        x = np.ascontiguousarray(x, dtype=np.float64)
        bits = x.view(np.uint64)
        hi = (bits >> np.uint64(32)).astype(np.uint32)
        lo = (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        return cls(jnp.asarray(hi), jnp.asarray(lo))

    def to_numpy(self) -> np.ndarray:
        """Exact host conversion back to numpy float64."""
        hi = np.asarray(jax.device_get(self.hi), dtype=np.uint64)
        lo = np.asarray(jax.device_get(self.lo), dtype=np.uint64)
        return ((hi << np.uint64(32)) | lo).view(np.float64)

    @classmethod
    def from_scalar(cls, v: float) -> "F64X":
        return cls.from_numpy(np.array(v, dtype=np.float64).reshape(()))

    def transpose(self) -> "F64X":
        return F64X(self.hi.T, self.lo.T)

    def reshape(self, *shape) -> "F64X":
        return F64X(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def __getitem__(self, idx) -> "F64X":
        return F64X(self.hi[idx], self.lo[idx])


def as_f64x(x) -> F64X:
    """Coerce numpy / python / F64X input into F64X (exact)."""
    if isinstance(x, F64X):
        return x
    if isinstance(x, (float, int)):
        return F64X.from_scalar(float(x))
    if isinstance(x, np.ndarray):
        return F64X.from_numpy(x)
    if isinstance(x, jax.Array):
        if x.dtype == jnp.float64:
            # Only exact if the array lives on a true-f64 backend (CPU).
            return F64X.from_numpy(np.asarray(jax.device_get(x)))
        raise TypeError(f"cannot convert jax array of dtype {x.dtype} to F64X")
    raise TypeError(f"cannot convert {type(x)} to F64X")


# -- fields, usable inside jit ------------------------------------------

_EXP_MASK = np.uint32(0x7FF00000)
_MANT_HI_MASK = np.uint32(0x000FFFFF)


def exponent_field(x: F64X) -> jax.Array:
    """Biased 11-bit exponent as int32."""
    return ((x.hi & _EXP_MASK) >> np.uint32(20)).astype(jnp.int32)


def sign_bit(x: F64X) -> jax.Array:
    """1 where negative (int32)."""
    return (x.hi >> np.uint32(31)).astype(jnp.int32)


def neg(x: F64X) -> F64X:
    """Exact negation: flip the IEEE sign bit (one uint32 XOR on hi).

    Used for conjugate-transpose operands (Operation.C): conjugating a
    complex matrix carried as (re, im) F64X planes is ``neg`` on the
    imaginary plane — no value arithmetic, so it is exact for every
    input including -0.0 and non-finite values.
    """
    return F64X(x.hi ^ np.uint32(0x80000000), x.lo)


def from_f32(x: jax.Array) -> F64X:
    """Exact widening f32 -> f64 bit planes (device-side, integer ops).

    Every finite f32 (incl. subnormals) is exactly representable in f64;
    subnormal f32 inputs are renormalized using a float-conversion trick
    to find the leading bit (int -> f32 conversion is exact below 2^24,
    so its exponent field is the bit length).  Inf/NaN map to f64 Inf/NaN.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    sign = (bits >> 31) & np.int32(1)
    ef = (bits >> 23) & np.int32(0xFF)
    m = bits & np.int32(0x7FFFFF)

    # normal: exponent rebias, mantissa left-aligned from 23 to 52 bits
    e64_norm = ef - 127 + 1023
    m52_norm = m.astype(jnp.int64) << 29

    # subnormal f32: value = m * 2^-149, leading bit j via exact int->f32
    fm = m.astype(jnp.float32)
    j = (jax.lax.bitcast_convert_type(fm, jnp.int32) >> 23) - 127  # floor(log2 m)
    j = jnp.maximum(j, 0)
    e64_sub = j + 874  # (j - 149) + 1023
    m52_sub = (m.astype(jnp.int64) << (52 - j).astype(jnp.int64)) - (
        jnp.int64(1) << 52
    )

    is_zero = (ef == 0) & (m == 0)
    is_sub = (ef == 0) & (m != 0)
    is_nonfinite = ef == 255

    e64 = jnp.where(is_sub, e64_sub, e64_norm)
    e64 = jnp.where(is_nonfinite, 2047, e64)
    m52 = jnp.where(is_sub, m52_sub, m52_norm)
    bits64 = (e64.astype(jnp.int64) << 52) | m52
    bits64 = jnp.where(is_zero, jnp.int64(0), bits64)
    bits64 = bits64 | (sign.astype(jnp.int64) << 63)
    hi = (bits64 >> 32).astype(jnp.uint32)
    lo = jax.lax.convert_element_type(bits64 & np.int64(0xFFFFFFFF), jnp.uint32)
    return F64X(hi, lo)


def from_f64_dd(x: jax.Array) -> F64X:
    """Exact bit planes of the PLATFORM's f64 value, device-side.

    On CPU ``x`` is true IEEE f64 and the conversion is bit-exact over
    the NORMAL range (incl. +-0): the value is brought near 1 by an
    exact power-of-two regime scale, split into three RNE f32 components
    (24+24+5 significand bits >= 53), and packed with one rounding at
    the unscaled exponent (ops.pack).  F64 subnormals convert to signed
    zero — XLA:CPU's own f64 arithmetic flushes them (even ``x * 1.0``),
    so they cannot survive the platform-f64 computations this function
    exists to capture.  On TPU ``x`` is XLA's double-float emulation
    (~f32-pair significand, f32 exponent range); the conversion captures
    that representation's value.  Used by the device-resident solvers to
    hand platform-f64 panel results back to the exact engine carriage.
    """
    from ..ops.pack import pack_f64x  # lazy: ops.pack imports this module

    # regime index k in [-8, 8]: x is scaled by 2^(-128k) (two exact
    # multiplies of <= 2^512 each, table-driven so the factors are exact
    # constants), bringing |xs| into ~[2^-64, 2^64] where all three f32
    # components are representable; log2 only PICKS the regime, so its
    # accuracy is irrelevant.
    ax = jnp.abs(x)
    # XLA's log2 flushes subnormal inputs: pre-normalize tiny values by
    # an exact 2^512 so the regime pick sees a normal number
    tiny = ax < jnp.asarray(2.0**-512, x.dtype)
    axn = jnp.where(tiny, ax * jnp.asarray(2.0**512, x.dtype), ax)
    safe = jnp.where(axn > 0, axn, jnp.ones((), x.dtype))
    lg = jnp.log2(safe) - jnp.where(tiny, 512.0, 0.0).astype(x.dtype)
    k = jnp.clip(jnp.round(lg / 128.0), -8.0, 8.0).astype(jnp.int32)
    table = jnp.asarray(
        np.ldexp(1.0, -64 * np.arange(-8, 9)), dtype=x.dtype
    )
    s = table[k + 8]
    xs = (x * s) * s
    h = xs.astype(jnp.float32)
    r1 = xs - h.astype(x.dtype)
    l1 = r1.astype(jnp.float32)
    l2 = (r1 - l1.astype(x.dtype)).astype(jnp.float32)
    out = pack_f64x((h, l1, l2), 128 * k)
    # pack emits +0 for a zero triple; restore the sign of -0.0 inputs.
    # The sign test reads h's f32 sign bit — jnp.signbit on the f64 input
    # would lower to a f64->s64 bitcast, which XLA:TPU's x64-removal pass
    # rejects (h = f32(xs) preserves the zero's sign on both platforms).
    sign32 = jax.lax.bitcast_convert_type(h, jnp.int32) >> 31
    neg0 = (x == 0) & (sign32 != 0)
    hi = jnp.where(neg0, out.hi | np.uint32(0x80000000), out.hi)
    return F64X(hi, out.lo)


def mantissa_parts(x: F64X) -> Tuple[jax.Array, jax.Array]:
    """(m_hi21, m_lo32): the 53-bit significand with implicit bit folded in.

    ``m_hi21`` holds bits 32..52 (21 bits incl. implicit one for normals,
    raw 20 bits for exponent-field-0 values — reference split.cu:160-162),
    ``m_lo32`` holds bits 0..31.  Both uint32.
    """
    e = exponent_field(x)
    m_hi = x.hi & _MANT_HI_MASK
    m_hi = jnp.where(e > 0, m_hi | np.uint32(1 << 20), m_hi)
    return m_hi, x.lo
