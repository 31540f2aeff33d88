"""Batch-native core must agree with vmap(bdf_solve)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched


def lv_rhs(t, y, p):
    a, b, g, d = p[0], p[1], p[2], p[3]
    return jnp.array([a * y[0] - b * y[0] * y[1], d * y[0] * y[1] - g * y[1]])


def lv_jac(t, y, p):
    return jax.jacfwd(lv_rhs, argnums=1)(t, y, p)


SUBSET = np.array([0, 1])


def lv_sens_rhs(t, y, S, p):
    J = lv_jac(t, y, p)
    dfdp = jax.jacfwd(lv_rhs, argnums=2)(t, y, p)[:, SUBSET]
    return S @ J.T + dfdp.T


def lv_quad_rhs(t, y, p):
    return jnp.array([y[0] + y[1]])


TVALS = jnp.linspace(0.5, 8.0, 7)
B = 12


def _batch_inputs():
    rng = np.random.default_rng(0)
    y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.1 * rng.standard_normal((B, 2))))
    ps = jnp.asarray(
        np.array([1.0, 0.3, 1.0, 0.4]) * (1 + 0.1 * rng.standard_normal((B, 4)))
    )
    return y0s, ps


def test_matches_vmap_forward():
    y0s, ps = _batch_inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-8)
    rb = jax.jit(
        lambda y0, p: bdf_solve_batched(lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts)
    )(y0s, ps)
    rv = jax.jit(
        jax.vmap(lambda y0, p: bdf_solve(lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts))
    )(y0s, ps)
    assert (np.asarray(rb.status) == 0).all()
    np.testing.assert_allclose(np.asarray(rb.ys), np.asarray(rv.ys), rtol=1e-6, atol=1e-9)
    # step counts should be close (identical heuristics, different masking
    # corner cases can differ by a step or two)
    assert np.abs(np.asarray(rb.stats["n_steps"]) - np.asarray(rv.stats["n_steps"])).max() <= 5


def test_matches_vmap_with_sens_quad():
    y0s, ps = _batch_inputs()
    S0 = jnp.zeros((B, 2, 2))
    q0 = jnp.zeros((B, 1))
    opts = BDFOptions(rtol=1e-8, atol=1e-8, quad_err_con=True)
    rb = jax.jit(
        lambda y0, p: bdf_solve_batched(
            lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts,
            sens_rhs=lv_sens_rhs, S0=S0, quad_rhs=lv_quad_rhs, quad0=q0,
        )
    )(y0s, ps)
    rv = jax.jit(
        jax.vmap(
            lambda y0, p, s0, qq0: bdf_solve(
                lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts,
                sens_rhs=lv_sens_rhs, S0=s0, quad_rhs=lv_quad_rhs, quad0=qq0,
            )
        )
    )(y0s, ps, S0, q0)
    assert (np.asarray(rb.status) == 0).all()
    np.testing.assert_allclose(np.asarray(rb.ys), np.asarray(rv.ys), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(rb.sens), np.asarray(rv.sens), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(rb.quad), np.asarray(rv.quad), rtol=1e-6, atol=1e-9
    )


def test_saved_trajectory_sorted_and_valid():
    y0s, ps = _batch_inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-8, save_steps=1024)
    rb = jax.jit(
        lambda y0, p: bdf_solve_batched(lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts)
    )(y0s, ps)
    sv = rb.saved
    assert not np.asarray(sv["overflow"]).any()
    for lane in [0, B // 2, B - 1]:
        ns = int(sv["n_saved"][lane])
        ts = np.asarray(sv["t"][:, lane])[:ns]
        assert (np.diff(ts) > 0).all(), "saved times must be strictly increasing"
        assert np.isfinite(ts).all()
        k = ns // 2
        y_k = np.asarray(sv["y"][k, :, lane])
        f_expected = np.asarray(lv_rhs(sv["t"][k, lane], jnp.array(y_k), ps[lane]))
        np.testing.assert_allclose(
            np.asarray(sv["f"][k, :, lane]), f_expected, rtol=1e-10
        )


def test_failure_lane_isolated():
    """One diverging lane must not poison the others."""
    y0s, ps = _batch_inputs()
    ps = np.array(ps)
    ps[3] = [1e10, -1e10, 1e10, 1e10]  # blow this lane up
    opts = BDFOptions(rtol=1e-8, atol=1e-8, max_steps=2000)
    rb = jax.jit(
        lambda y0, p: bdf_solve_batched(lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts)
    )(y0s, jnp.asarray(ps))
    status = np.asarray(rb.status)
    assert status[3] != 0
    ok = np.ones(B, bool)
    ok[3] = False
    assert (status[ok] == 0).all()
    assert np.isfinite(np.asarray(rb.ys)[ok]).all()


def test_overflow_flag():
    # legacy clamp semantics (checkpoint_thinning=True instead thins in
    # place and keeps gradients finite — tests/test_checkpoint_thinning.py)
    y0s, ps = _batch_inputs()
    opts = BDFOptions(
        rtol=1e-8, atol=1e-8, save_steps=32, checkpoint_thinning=False
    )
    rb = jax.jit(
        lambda y0, p: bdf_solve_batched(lv_rhs, lv_jac, 0.0, y0, p, TVALS, opts)
    )(y0s, ps)
    assert np.asarray(rb.saved["overflow"]).all()
