"""Double-float (f32-pair) arithmetic — groundwork for the Pallas integrator.

Mosaic/Pallas has no float64 on TPU, so a fully-fused Pallas time-stepper
(the planned speed-of-light path: whole step loop in VMEM, no per-op kernel
boundaries) needs extended precision built from f32 pairs.  A double-float
(hi, lo) value carries ~49 mantissa bits (eps ~ 1e-14) — ample for rtol 1e-8
integrations.

Algorithms are the classical error-free transformations (Knuth two-sum,
Dekker split/two-prod) — verified EXACT on this TPU (the terminal's
``--xla_allow_excess_precision=true`` does not break them; see
tests/test_df64.py which runs on both CPU and the accelerator).

Representation: a pair of arrays (hi, lo) with |lo| <= ulp(hi)/2.
All functions are jit/vmap/Pallas-compatible (pure elementwise jnp).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DF",
    "two_sum",
    "two_prod",
    "df_from_f64",
    "df_to_f64",
    "df_from_f32",
    "df_add",
    "df_sub",
    "df_neg",
    "df_mul",
    "df_div",
    "df_sqrt",
    "df_abs",
    "df_lt",
    "df_le",
    "df_scale",
]

_SPLITTER = 4097.0  # 2^12 + 1 for f32 Dekker splitting


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DF:
    """A double-float value/array.  Arithmetic operators are overloaded so
    polynomial RHS code written for jnp arrays (e.g. the sympy-generated
    functions) evaluates in double-float unchanged inside Pallas kernels
    (which have no native f64)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __iter__(self):
        return iter((self.hi, self.lo))

    def __add__(self, other):
        return df_add(self, _coerce(other, self))

    __radd__ = __add__

    def __sub__(self, other):
        return df_sub(self, _coerce(other, self))

    def __rsub__(self, other):
        return df_sub(_coerce(other, self), self)

    def __mul__(self, other):
        return df_mul(self, _coerce(other, self))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return df_div(self, _coerce(other, self))

    def __rtruediv__(self, other):
        return df_div(_coerce(other, self), self)

    def __neg__(self):
        return df_neg(self)

    def __lt__(self, other):
        return df_lt(self, _coerce(other, self))

    def __le__(self, other):
        return df_le(self, _coerce(other, self))

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])


def _coerce(x, like: "DF") -> "DF":
    if isinstance(x, DF):
        return x
    if isinstance(x, (int, float)):
        # static scalar: split on the host (f64-free trace — required inside
        # Pallas kernels, which cannot create f64 values)
        hi = np.float32(x)
        lo = np.float32(np.float64(x) - np.float64(hi))
        z = jnp.zeros_like(like.hi)
        return DF(z + hi, z + lo)
    return df_from_f32(x)


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = a * jnp.float32(_SPLITTER)
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
def df_from_f64(x) -> DF:
    hi = jnp.asarray(x, jnp.float64).astype(jnp.float32)
    lo = (jnp.asarray(x, jnp.float64) - hi.astype(jnp.float64)).astype(jnp.float32)
    return DF(hi, lo)


def df_to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def df_from_f32(x) -> DF:
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def df_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    hi, lo = _quick_two_sum(s, e)
    return DF(hi, lo)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def df_div(x: DF, y: DF) -> DF:
    q1 = x.hi / y.hi
    r = df_sub(x, df_mul(df_from_f32(q1), y))
    q2 = r.hi / y.hi
    r2 = df_sub(r, df_mul(df_from_f32(q2), y))
    q3 = r2.hi / y.hi
    hi, lo = _quick_two_sum(q1, q2)
    lo = lo + q3
    hi, lo = _quick_two_sum(hi, lo)
    return DF(hi, lo)


def df_sqrt(x: DF) -> DF:
    """Newton refinement of the f32 sqrt."""
    s = jnp.sqrt(x.hi)
    s_df = df_from_f32(s)
    # one Newton step: s' = (s + x/s)/2 in df arithmetic
    t = df_div(x, s_df)
    out = df_add(s_df, t)
    return DF(out.hi * jnp.float32(0.5), out.lo * jnp.float32(0.5))


def df_abs(x: DF) -> DF:
    neg = x.hi < 0
    return DF(jnp.where(neg, -x.hi, x.hi), jnp.where(neg, -x.lo, x.lo))


def df_lt(x: DF, y: DF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def df_le(x: DF, y: DF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo <= y.lo))


def df_scale(x: DF, c) -> DF:
    """Multiply by an exact f32 scalar (e.g. a power of two)."""
    p, e = two_prod(x.hi, c)
    e = e + x.lo * c
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)
