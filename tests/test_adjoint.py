"""Adjoint gradients: checked against finite differences and forward mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_solve_fn, solve_ivp


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


T0 = 0.0
Y0 = jnp.array([10.0, 2.0])
P_SUB = jnp.array([1.0, 0.3])  # alpha, beta
P_FIX = jnp.array([1.0, 0.4])  # gamma, delta
TVALS = jnp.linspace(1.0, 8.0, 6)


def loss_of(solve):
    def loss(y0, p_sub, tvals):
        ys = solve(T0, y0, p_sub, P_FIX, tvals)
        return jnp.sum(ys**2) + jnp.sum(ys[:, 0] * 0.5)

    return loss


@pytest.fixture(scope="module")
def adjoint_solve(lv_problem):
    return make_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-10, atol=1e-10),
        adjoint_options=BDFOptions(rtol=1e-10, atol=1e-10),
    )


@pytest.fixture(scope="module")
def forward_solve(lv_problem):
    return make_solve_fn(
        lv_problem,
        derivatives="forward",
        options=BDFOptions(rtol=1e-10, atol=1e-10),
    )


def _finite_diff(f, x, eps=1e-6):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        hi = x.copy()
        hi.flat[i] += eps
        lo = x.copy()
        lo.flat[i] -= eps
        g.flat[i] = (f(jnp.array(hi)) - f(jnp.array(lo))) / (2 * eps)
    return g


def test_adjoint_param_grads_vs_fd(adjoint_solve):
    loss = loss_of(adjoint_solve)
    g = jax.grad(loss, argnums=1)(Y0, P_SUB, TVALS)
    fd = _finite_diff(lambda p: float(loss(Y0, p, TVALS)), P_SUB, eps=3e-6)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=2e-4)


def test_adjoint_y0_grads_vs_fd(adjoint_solve):
    loss = loss_of(adjoint_solve)
    g = jax.grad(loss, argnums=0)(Y0, P_SUB, TVALS)
    fd = _finite_diff(lambda y: float(loss(y, P_SUB, TVALS)), Y0, eps=3e-6)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=2e-4)


def test_adjoint_tvals_grads_vs_fd(adjoint_solve):
    loss = loss_of(adjoint_solve)
    g = jax.grad(loss, argnums=2)(Y0, P_SUB, TVALS)
    fd = _finite_diff(lambda tv: float(loss(Y0, P_SUB, tv)), TVALS, eps=1e-6)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-4)


def test_forward_grads_vs_fd(forward_solve):
    loss = loss_of(forward_solve)
    gp = jax.grad(loss, argnums=1)(Y0, P_SUB, TVALS)
    fd = _finite_diff(lambda p: float(loss(Y0, p, TVALS)), P_SUB, eps=3e-6)
    np.testing.assert_allclose(np.asarray(gp), fd, rtol=2e-4)
    gy = jax.grad(loss, argnums=0)(Y0, P_SUB, TVALS)
    fdy = _finite_diff(lambda y: float(loss(y, P_SUB, TVALS)), Y0, eps=3e-6)
    np.testing.assert_allclose(np.asarray(gy), fdy, rtol=2e-4)


def test_forward_vs_adjoint_cross_check(adjoint_solve, forward_solve):
    la, lf = loss_of(adjoint_solve), loss_of(forward_solve)
    ga = jax.grad(la, argnums=(0, 1))(Y0, P_SUB, TVALS)
    gf = jax.grad(lf, argnums=(0, 1))(Y0, P_SUB, TVALS)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gf[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gf[1]), rtol=1e-5)


def test_primal_values_consistent(adjoint_solve, forward_solve, lv_problem):
    plain = make_solve_fn(lv_problem, derivatives=None, options=BDFOptions(rtol=1e-10, atol=1e-10))
    ys_a = adjoint_solve(T0, Y0, P_SUB, P_FIX, TVALS)
    ys_f = forward_solve(T0, Y0, P_SUB, P_FIX, TVALS)
    ys_p = plain(T0, Y0, P_SUB, P_FIX, TVALS)
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_p), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_p), rtol=1e-6)


def test_adjoint_jit_and_vmap(adjoint_solve):
    loss = loss_of(adjoint_solve)
    gfn = jax.jit(jax.grad(loss, argnums=1))
    g1 = gfn(Y0, P_SUB, TVALS)

    batch = 8
    p_batch = jnp.tile(P_SUB, (batch, 1)) * jnp.linspace(0.9, 1.1, batch)[:, None]
    gb = jax.jit(jax.vmap(lambda p: jax.grad(loss, argnums=1)(Y0, p, TVALS)))(p_batch)
    assert gb.shape == (batch, 2)
    assert np.isfinite(np.asarray(gb)).all()
    # consistency of one lane with solo call
    gs = gfn(Y0, p_batch[5], TVALS)
    np.testing.assert_allclose(np.asarray(gb[5]), np.asarray(gs), rtol=1e-6)


def test_failure_poisons_gradient(lv_problem):
    solve = make_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-10, atol=1e-10, max_steps=5),
    )
    g = jax.grad(lambda p: jnp.sum(solve(T0, Y0, p, P_FIX, TVALS)))(P_SUB)
    assert np.isnan(np.asarray(g)).all()


def test_solve_ivp_end_to_end_grad():
    """README-style one-call API with jax.grad through it."""

    def run(alpha):
        res = solve_ivp(
            t0=0.0,
            y0={"hares": (10.0, ()), "lynx": (2.0, ())},
            params={
                "alpha": (alpha, ()),
                "beta": (0.3, ()),
                "gamma": np.array(1.0),
                "delta": np.array(0.4),
            },
            tvals=np.linspace(1.0, 8.0, 5),
            rhs=lv_sympy,
            derivatives="adjoint",
            derivative_params=[("alpha",), ("beta",)],
            solver_kwargs=dict(rtol=1e-9, atol=1e-9),
        )
        return jnp.sum(res.solution["hares"] ** 2)

    g = jax.grad(run)(jnp.asarray(1.0))
    eps = 1e-5
    fd = (float(run(jnp.asarray(1.0 + eps))) - float(run(jnp.asarray(1.0 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=5e-4)


def test_solve_ivp_direct_jax_mode():
    """use_sympy=False: the RHS runs on jnp Records (JaxProblem path)."""

    def run(alpha):
        res = solve_ivp(
            t0=0.0,
            y0={"hares": (10.0, ()), "lynx": (2.0, ())},
            params={
                "alpha": (alpha, ()),
                "beta": (0.3, ()),
                "gamma": np.array(1.0),
                "delta": np.array(0.4),
            },
            tvals=np.linspace(1.0, 8.0, 5),
            rhs=lv_sympy,  # same arithmetic works on jnp leaves
            derivatives="adjoint",
            derivative_params=[("alpha",), ("beta",)],
            solver_kwargs=dict(rtol=1e-9, atol=1e-9),
            use_sympy=False,
        )
        return jnp.sum(res.solution["hares"] ** 2)

    g = jax.grad(run)(jnp.asarray(1.0))
    eps = 1e-5
    fd = (float(run(jnp.asarray(1.0 + eps))) - float(run(jnp.asarray(1.0 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=5e-4)


def test_adjoint_t0_grad_vs_fd(adjoint_solve):
    def loss_t0(t0):
        ys = adjoint_solve(t0, Y0, P_SUB, P_FIX, TVALS)
        return jnp.sum(ys**2)

    g = jax.grad(loss_t0)(jnp.asarray(0.0))
    eps = 1e-6
    fd = (float(loss_t0(jnp.asarray(eps))) - float(loss_t0(jnp.asarray(-eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-4)
