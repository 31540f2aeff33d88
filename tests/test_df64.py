"""Double-float arithmetic: precision vs true float64."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops import df64 as df


def _rand(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.5, 2.0, n) * scale


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_df_ops_precision(op):
    a64 = _rand(512, 1)
    b64 = _rand(512, 2)
    a = df.df_from_f64(jnp.asarray(a64))
    b = df.df_from_f64(jnp.asarray(b64))
    fn = {"add": df.df_add, "sub": df.df_sub, "mul": df.df_mul, "div": df.df_div}[op]
    ref = {"add": a64 + b64, "sub": a64 - b64, "mul": a64 * b64, "div": a64 / b64}[op]
    got = np.asarray(df.df_to_f64(jax.jit(fn)(a, b)))
    # error scaled by operand magnitude (cancellation in `sub` legitimately
    # amplifies the RELATIVE error of any finite-precision representation)
    scale = np.maximum(np.abs(a64), np.abs(b64))
    err = np.abs(got - ref) / scale
    assert err.max() < 5e-14, f"{op}: max scaled err {err.max():.2e}"


def test_df_sqrt():
    a64 = _rand(512, 3)
    got = np.asarray(df.df_to_f64(jax.jit(df.df_sqrt)(df.df_from_f64(jnp.asarray(a64)))))
    rel = np.abs(got - np.sqrt(a64)) / np.sqrt(a64)
    assert rel.max() < 5e-14


def test_df_accumulation():
    """Long accumulation keeps ~double precision (the integrator's t += h)."""
    h = df.df_from_f64(jnp.asarray([0.1]))
    t = df.df_from_f32(jnp.zeros(1))
    f = jax.jit(lambda t, h: df.df_add(t, h))
    for _ in range(1000):
        t = f(t, h)
    got = float(np.asarray(df.df_to_f64(t))[0])
    assert abs(got - 100.0) < 1e-11
    # plain f32 accumulation is far worse
    tf = np.float32(0)
    for _ in range(1000):
        tf += np.float32(0.1)
    assert abs(float(tf) - 100.0) > 1e-6


def test_df_comparisons():
    a = df.df_from_f64(jnp.asarray([1.0, 1.0]))
    b = df.DF(a.hi, a.lo + jnp.float32(1e-12))
    assert bool(df.df_lt(a, b).all())
    assert not bool(df.df_lt(b, a).any())


def test_two_prod_exact():
    a = jnp.float32(1.2345678)
    b = jnp.float32(8.7654321)
    p, e = jax.jit(df.two_prod)(a, b)
    exact = np.float64(np.float32(1.2345678)) * np.float64(np.float32(8.7654321))
    assert abs((float(p) + float(e)) - exact) == 0.0
