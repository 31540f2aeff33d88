"""Forward-sensitivity and quadrature blocks of the BDF core."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.symode import SympyProblem


def lv_rhs(t, y, p):
    a, b, g, d = p[0], p[1], p[2], p[3]
    return jnp.array([a * y[0] - b * y[0] * y[1], d * y[0] * y[1] - g * y[1]])


def lv_jac(t, y, p):
    return jax.jacfwd(lv_rhs, argnums=1)(t, y, p)


LV_P = jnp.array([1.0, 0.3, 1.0, 0.4])
LV_Y0 = jnp.array([10.0, 2.0])
SUBSET = np.array([0, 1])  # d/dalpha, d/dbeta


def lv_sens_rhs(t, y, S, p):
    J = lv_jac(t, y, p)
    dfdp_full = jax.jacfwd(lv_rhs, argnums=2)(t, y, p)  # (n, 4)
    dfdp = dfdp_full[:, SUBSET]  # (n, k)
    return S @ J.T + dfdp.T


def finite_diff_sens(tvals, eps=1e-7):
    """dy(t)/dp via central differences with a very accurate solver."""
    cols = []
    for j in SUBSET:
        pp = np.asarray(LV_P).copy()
        pp[j] += eps
        hi = solve_ivp(
            lambda t, y: np.asarray(lv_rhs(t, jnp.array(y), jnp.array(pp))),
            (0, tvals[-1]), np.asarray(LV_Y0), t_eval=tvals,
            method="LSODA", rtol=1e-12, atol=1e-12,
        ).y.T
        pp[j] -= 2 * eps
        lo = solve_ivp(
            lambda t, y: np.asarray(lv_rhs(t, jnp.array(y), jnp.array(pp))),
            (0, tvals[-1]), np.asarray(LV_Y0), t_eval=tvals,
            method="LSODA", rtol=1e-12, atol=1e-12,
        ).y.T
        cols.append((hi - lo) / (2 * eps))
    return np.stack(cols, axis=1)  # (n_t, k, n)


def test_forward_sensitivities_match_finite_diff():
    tvals = np.linspace(0.5, 8.0, 8)
    S0 = jnp.zeros((2, 2))
    res = bdf_solve(
        lv_rhs, lv_jac, 0.0, LV_Y0, LV_P, jnp.array(tvals),
        BDFOptions(rtol=1e-9, atol=1e-9),
        sens_rhs=lv_sens_rhs, S0=S0,
    )
    assert int(res.status) == 0
    fd = finite_diff_sens(tvals)
    got = np.asarray(res.sens)
    scale = np.abs(fd).max()
    np.testing.assert_allclose(got, fd, rtol=2e-4, atol=2e-5 * scale)


def test_sensitivity_of_initial_value():
    # S0 = identity row for dy/dy0: solves variational equation
    rhs = lambda t, y, p: -p[0] * y
    jac = lambda t, y, p: jnp.array([[-p[0]]])
    sens = lambda t, y, S, p: S @ jac(t, y, p).T  # no param dependence
    tvals = jnp.array([1.0, 2.0])
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([5.0]), jnp.array([0.7]), tvals,
        BDFOptions(rtol=1e-10, atol=1e-12),
        sens_rhs=sens, S0=jnp.ones((1, 1)),
    )
    assert int(res.status) == 0
    # dy(t)/dy0 = exp(-0.7 t)
    np.testing.assert_allclose(
        np.asarray(res.sens[:, 0, 0]), np.exp(-0.7 * np.asarray(tvals)), rtol=1e-7
    )


def test_quadrature_integral():
    # y' = -y, q' = y  =>  q(t) = y0 (1 - e^-t)
    rhs = lambda t, y, p: -y
    jac = lambda t, y, p: -jnp.eye(1)
    quad = lambda t, y, p: y
    tvals = jnp.array([0.5, 1.0, 3.0])
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([2.0]), jnp.zeros(0), tvals,
        BDFOptions(rtol=1e-10, atol=1e-12, quad_err_con=True),
        quad_rhs=quad, quad0=jnp.zeros(1),
    )
    assert int(res.status) == 0
    expected = 2.0 * (1 - np.exp(-np.asarray(tvals)))
    np.testing.assert_allclose(np.asarray(res.quad[:, 0]), expected, rtol=1e-7)


def test_quadrature_time_dependent():
    # q' = t^2 => q = t^3/3 (y inert)
    rhs = lambda t, y, p: jnp.zeros(1)
    jac = lambda t, y, p: jnp.zeros((1, 1))
    quad = lambda t, y, p: jnp.array([t * t])
    tvals = jnp.array([1.0, 2.0])
    res = bdf_solve(
        rhs, jac, 0.0, jnp.zeros(1), jnp.zeros(0), tvals,
        BDFOptions(rtol=1e-10, atol=1e-12, quad_err_con=True),
        quad_rhs=quad, quad0=jnp.zeros(1),
    )
    assert int(res.status) == 0
    np.testing.assert_allclose(
        np.asarray(res.quad[:, 0]), np.asarray(tvals) ** 3 / 3, rtol=1e-6
    )


def test_sens_with_sympy_problem():
    def lv(t, y, p):
        return {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        }

    prob = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lv,
        derivative_params=[("alpha",), ("beta",)],
    )
    tvals = np.linspace(0.5, 8.0, 8)
    res = bdf_solve(
        prob.make_rhs(), prob.make_jac_dense(), 0.0, LV_Y0, LV_P,
        jnp.array(tvals), BDFOptions(rtol=1e-9, atol=1e-9),
        sens_rhs=prob.make_sensitivity_rhs(), S0=jnp.zeros((2, 2)),
    )
    assert int(res.status) == 0
    fd = finite_diff_sens(tvals)
    scale = np.abs(fd).max()
    np.testing.assert_allclose(np.asarray(res.sens), fd, rtol=2e-4, atol=2e-5 * scale)


def test_sens_vmap():
    tvals = jnp.linspace(0.5, 5.0, 4)

    def solve_one(y0):
        return bdf_solve(
            lv_rhs, lv_jac, 0.0, y0, LV_P, tvals,
            BDFOptions(rtol=1e-8, atol=1e-8),
            sens_rhs=lv_sens_rhs, S0=jnp.zeros((2, 2)),
        )

    y0s = jnp.tile(LV_Y0, (8, 1)) * jnp.linspace(0.9, 1.1, 8)[:, None]
    res = jax.jit(jax.vmap(solve_one))(y0s)
    assert (np.asarray(res.status) == 0).all()
    solo = solve_one(y0s[3])
    np.testing.assert_allclose(
        np.asarray(res.sens[3]), np.asarray(solo.sens), rtol=1e-7, atol=1e-10
    )
