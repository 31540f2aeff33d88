"""Batch-native Adams must agree with vmap(adams_solve) and support quads."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.adams import adams_solve
from sunode_tpu.ops.adams_batched import adams_solve_batched
from sunode_tpu.ops.bdf import BDFOptions


def lv_rhs(t, y, p):
    a, b, g, d = p[0], p[1], p[2], p[3]
    return jnp.array([a * y[0] - b * y[0] * y[1], d * y[0] * y[1] - g * y[1]])


TVALS = jnp.linspace(0.5, 8.0, 7)
B = 10


def _inputs():
    rng = np.random.default_rng(1)
    y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.1 * rng.standard_normal((B, 2))))
    ps = jnp.asarray(
        np.array([1.0, 0.3, 1.0, 0.4]) * (1 + 0.1 * rng.standard_normal((B, 4)))
    )
    return y0s, ps


def test_matches_vmap_adams():
    y0s, ps = _inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-8)
    rb = jax.jit(
        lambda y0, p: adams_solve_batched(lv_rhs, 0.0, y0, p, TVALS, opts)
    )(y0s, ps)
    rv = jax.jit(
        jax.vmap(lambda y0, p: adams_solve(lv_rhs, 0.0, y0, p, TVALS, opts))
    )(y0s, ps)
    assert (np.asarray(rb.status) == 0).all()
    np.testing.assert_allclose(
        np.asarray(rb.ys), np.asarray(rv.ys), rtol=1e-6, atol=1e-8
    )


def test_quad_block():
    # y' = -y; q' = y  ->  q(t) = y0(1 - e^-t), per lane
    rhs = lambda t, y, p: -p[0:1] * y
    quad = lambda t, y, p: y
    y0s = jnp.linspace(1.0, 3.0, B)[:, None]
    ps = jnp.ones((B, 1))
    tv = jnp.array([0.5, 1.0, 3.0])
    rb = jax.jit(
        lambda y0, p: adams_solve_batched(
            rhs, 0.0, y0, p, tv, BDFOptions(rtol=1e-10, atol=1e-12, quad_err_con=True),
            quad_rhs=quad, quad0=jnp.zeros((B, 1)),
        )
    )(y0s, ps)
    assert (np.asarray(rb.status) == 0).all()
    expected = np.asarray(y0s) * (1 - np.exp(-np.asarray(tv)))[None, :]
    np.testing.assert_allclose(np.asarray(rb.quad[:, :, 0]), expected, rtol=1e-7)


def test_saved_trajectory():
    y0s, ps = _inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-8, save_steps=512)
    rb = jax.jit(
        lambda y0, p: adams_solve_batched(lv_rhs, 0.0, y0, p, TVALS, opts)
    )(y0s, ps)
    sv = rb.saved
    assert not np.asarray(sv["overflow"]).any()
    lane = 3
    ns = int(sv["n_saved"][lane])
    ts = np.asarray(sv["t"][:ns, lane])
    assert (np.diff(ts) > 0).all()
    k = ns // 2
    f_exp = np.asarray(lv_rhs(sv["t"][k, lane], sv["y"][k, :, lane], ps[lane]))
    np.testing.assert_allclose(np.asarray(sv["f"][k, :, lane]), f_exp, rtol=1e-10)


def test_step_efficiency_vs_bdf():
    from sunode_tpu.ops.bdf_batched import bdf_solve_batched

    def lv_jac(t, y, p):
        return jax.jacfwd(lv_rhs, argnums=1)(t, y, p)

    y0s, ps = _inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-8)
    ra = jax.jit(lambda y0, p: adams_solve_batched(lv_rhs, 0.0, y0, p, TVALS, opts))(y0s, ps)
    rbdf = jax.jit(
        lambda y0, p: bdf_solve_batched(lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts)
    )(y0s, ps)
    assert np.asarray(ra.stats["n_steps"]).mean() < 0.7 * np.asarray(
        rbdf.stats["n_steps"]
    ).mean()


def test_failure_lane_isolated():
    y0s, ps = _inputs()
    ps = np.array(ps)
    ps[4] = [1e12, -1e12, 1e12, 1e12]
    rb = jax.jit(
        lambda y0, p: adams_solve_batched(
            lv_rhs, 0.0, y0, p, TVALS, BDFOptions(rtol=1e-8, atol=1e-8, max_steps=3000)
        )
    )(y0s, jnp.asarray(ps))
    status = np.asarray(rb.status)
    assert status[4] != 0
    ok = np.ones(B, bool)
    ok[4] = False
    assert (status[ok] == 0).all()
