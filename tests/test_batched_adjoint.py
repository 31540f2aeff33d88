"""Batched adjoint path must agree with the vmapped single-instance path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn, make_solve_fn


def lv_sympy(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


@pytest.fixture(scope="module")
def lv_problem():
    return SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lv_sympy,
        derivative_params=[("alpha",), ("beta",)],
    )


TVALS = jnp.linspace(1.0, 8.0, 6)
P_FIX = jnp.array([1.0, 0.4])
B = 8


def _inputs():
    rng = np.random.default_rng(3)
    y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.08 * rng.standard_normal((B, 2))))
    psub = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.08 * rng.standard_normal((B, 2))))
    return y0s, psub


def test_batched_primal_matches_vmap(lv_problem):
    y0s, psub = _inputs()
    opts = BDFOptions(rtol=1e-9, atol=1e-9)
    sb = make_batched_solve_fn(lv_problem, derivatives=None, options=opts)
    sv = make_solve_fn(lv_problem, derivatives=None, options=opts)
    ys_b = jax.jit(lambda y, p: sb(0.0, y, p, P_FIX, TVALS))(y0s, psub)
    ys_v = jax.jit(jax.vmap(lambda y, p: sv(0.0, y, p, P_FIX, TVALS)))(y0s, psub)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_v), rtol=1e-6, atol=1e-9)


def test_batched_adjoint_grads_match_vmap(lv_problem):
    y0s, psub = _inputs()
    opts = BDFOptions(rtol=1e-9, atol=1e-9)
    aopts = BDFOptions(rtol=1e-9, atol=1e-9)
    sb = make_batched_solve_fn(
        lv_problem, derivatives="adjoint", options=opts, adjoint_options=aopts
    )
    sv = make_solve_fn(
        lv_problem, derivatives="adjoint", options=opts, adjoint_options=aopts
    )

    def loss_b(y0s, psub):
        ys = sb(0.0, y0s, psub, P_FIX, TVALS)
        return jnp.sum(ys**2)

    def loss_v(y0s, psub):
        ys = jax.vmap(lambda y, p: sv(0.0, y, p, P_FIX, TVALS))(y0s, psub)
        return jnp.sum(ys**2)

    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1)))(y0s, psub)
    gv = jax.jit(jax.grad(loss_v, argnums=(0, 1)))(y0s, psub)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gv[0]), rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gv[1]), rtol=2e-4, atol=1e-8)


def test_batched_failure_lane_poisons_only_its_grad(lv_problem):
    y0s, psub = _inputs()
    psub = np.array(psub)
    psub[2] = [1e8, -1e8]
    sb = make_batched_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-9, atol=1e-9, max_steps=2000),
    )

    def loss(psub):
        ys = sb(0.0, y0s, psub, P_FIX, TVALS)
        # sum only finite lanes would hide poisoning; use per-lane outputs
        return ys

    ys = jax.jit(loss)(jnp.asarray(psub))
    ysn = np.asarray(ys)
    assert np.isnan(ysn[2]).all()
    ok = np.ones(B, bool)
    ok[2] = False
    assert np.isfinite(ysn[ok]).all()


def test_resolve_adjoint_grads_match_vmap(lv_problem):
    """Backsolve ('resolve') adjoint: gradients agree with the reference-
    semantics single-instance Hermite path at tolerance scale."""
    y0s, psub = _inputs()
    opts = BDFOptions(rtol=1e-9, atol=1e-9)
    aopts = BDFOptions(rtol=1e-9, atol=1e-9)
    sb = make_batched_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=opts,
        adjoint_options=aopts,
        method="ADAMS",
        adjoint_interpolation="resolve",
    )
    sv = make_solve_fn(
        lv_problem, derivatives="adjoint", options=opts, adjoint_options=aopts
    )

    def loss_b(y0s, psub):
        ys = sb(0.0, y0s, psub, P_FIX, TVALS)
        return jnp.sum(ys**2)

    def loss_v(y0s, psub):
        ys = jax.vmap(lambda y, p: sv(0.0, y, p, P_FIX, TVALS))(y0s, psub)
        return jnp.sum(ys**2)

    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1)))(y0s, psub)
    gv = jax.jit(jax.grad(loss_v, argnums=(0, 1)))(y0s, psub)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gv[0]), rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gv[1]), rtol=5e-4, atol=1e-7)


def test_resolve_failure_lane_poisons_only_its_grad(lv_problem):
    y0s, psub = _inputs()
    psub = np.array(psub)
    psub[2] = [1e8, -1e8]
    sb = make_batched_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-9, atol=1e-9, max_steps=2000),
        method="ADAMS",
        adjoint_interpolation="resolve",
    )

    def loss(psub):
        ys = sb(0.0, y0s, psub, P_FIX, TVALS)
        return jnp.sum(jnp.where(jnp.isfinite(ys), ys, 0.0) ** 2, axis=(1, 2))

    g = jax.jit(jax.jacrev(loss))(jnp.asarray(psub))
    gn = np.asarray(g)
    # lane 2 failed: its own-gradient block must be NaN, other lanes finite
    assert np.isnan(gn[2, 2]).all()
    ok = np.ones(B, bool)
    ok[2] = False
    assert np.isfinite(gn[np.ix_(ok, ok)]).all()


def test_inject_keep_order_grads_match(lv_problem):
    """Retained-history cotangent injections must not change gradients
    beyond tolerance scale (error control guards the retention heuristic)."""
    y0s, psub = _inputs()
    opts = BDFOptions(rtol=1e-9, atol=1e-9)
    grads = {}
    for keep in (1, 3):
        sb = make_batched_solve_fn(
            lv_problem,
            derivatives="adjoint",
            options=opts,
            adjoint_options=BDFOptions(rtol=1e-9, atol=1e-9, inject_keep_order=keep),
            method="ADAMS",
            adjoint_interpolation="resolve",
        )

        def loss(y0s, psub, sb=sb):
            return jnp.sum(sb(0.0, y0s, psub, P_FIX, TVALS) ** 2)

        grads[keep] = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0s, psub)
    np.testing.assert_allclose(
        np.asarray(grads[1][0]), np.asarray(grads[3][0]), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(grads[1][1]), np.asarray(grads[3][1]), rtol=1e-4, atol=1e-7
    )
