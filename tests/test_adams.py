"""Adams-Moulton integrator tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from sunode_tpu.ops.adams import adams_solve, _GAMMA, _GAMMA_STAR, _interp_y, ADAMS_MAX_ORDER, KA
from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem


def test_gamma_values():
    np.testing.assert_allclose(_GAMMA[:5], [1, 1 / 2, 5 / 12, 3 / 8, 251 / 720], rtol=1e-14)
    np.testing.assert_allclose(
        _GAMMA_STAR[:4], [1, -1 / 2, -1 / 12, -1 / 24], rtol=1e-13
    )


def lv_rhs(t, y, p):
    a, b, g, d = p[0], p[1], p[2], p[3]
    return jnp.array([a * y[0] - b * y[0] * y[1], d * y[0] * y[1] - g * y[1]])


LV_P = jnp.array([1.0, 0.3, 1.0, 0.4])
LV_Y0 = jnp.array([10.0, 2.0])


def test_exponential_decay():
    rhs = lambda t, y, p: -p[0] * y
    tvals = jnp.linspace(0.5, 5.0, 10)
    res = adams_solve(
        rhs, 0.0, jnp.array([1.0]), jnp.array([1.3]), tvals,
        BDFOptions(rtol=1e-10, atol=1e-12),
    )
    assert int(res.status) == 0
    np.testing.assert_allclose(
        np.asarray(res.ys[:, 0]), np.exp(-1.3 * np.asarray(tvals)), rtol=1e-8
    )


@pytest.mark.parametrize("rtol", [1e-6, 1e-8, 1e-10])
def test_lv_accuracy_and_efficiency(rtol):
    tvals = np.linspace(0.1, 10.0, 25)
    res = adams_solve(
        lv_rhs, 0.0, LV_Y0, LV_P, jnp.array(tvals), BDFOptions(rtol=rtol, atol=rtol)
    )
    assert int(res.status) == 0
    ref = solve_ivp(
        lambda t, y: np.asarray(lv_rhs(t, jnp.array(y), LV_P)),
        (0, 10), np.asarray(LV_Y0), t_eval=tvals,
        method="LSODA", rtol=1e-13, atol=1e-13,
    ).y.T
    err = np.abs(np.asarray(res.ys) - ref) / (np.abs(ref) + 1e-8)
    # compare against scipy's Adams (LSODA) at the same tolerance
    sol = solve_ivp(
        lambda t, y: np.asarray(lv_rhs(t, jnp.array(y), LV_P)),
        (0, 10), np.asarray(LV_Y0), t_eval=tvals,
        method="LSODA", rtol=rtol, atol=rtol,
    )
    err_scipy = np.abs(sol.y.T - ref) / (np.abs(ref) + 1e-8)
    assert err.max() < 10 * max(err_scipy.max(), rtol), (
        f"ours {err.max():.2e} vs LSODA {err_scipy.max():.2e}"
    )
    # Adams should use substantially fewer steps than our BDF at tight tols
    n_steps = int(res.stats["n_steps"])
    assert n_steps < 1000


@pytest.mark.parametrize("max_order", [9, 10, 12])
def test_high_orders_supported(max_order):
    """Adams orders 9-12 (CVODES runs Adams to 12) are a SUPPORTED regime
    on smooth problems, both JAX and native cores: raising the cap keeps
    full accuracy and a comparable step count.  The default stays 8
    because the fixed-leading-coefficient rescale conditioning worsens
    with order at tight tolerances and the step savings are problem-
    dependent (LV at a=0.52: order 9 saves ~7% of steps; LV at a=1.0 it
    costs ~3%)."""
    tvals = np.linspace(1.0, 25.0, 5)
    ref = solve_ivp(
        lambda t, y: np.asarray(lv_rhs(t, jnp.array(y), LV_P)),
        (0, 25), np.asarray(LV_Y0), t_eval=tvals,
        method="DOP853", rtol=1e-13, atol=1e-13,
    ).y.T
    opts = BDFOptions(rtol=1e-10, atol=1e-10, adams_max_order=max_order)
    res = adams_solve(lv_rhs, 0.0, LV_Y0, LV_P, jnp.array(tvals), opts)
    assert int(res.status) == 0
    err = np.max(np.abs((np.asarray(res.ys) - ref) / ref))
    assert err < 1e-7, f"order {max_order}: err {err:.2e}"
    res8 = adams_solve(
        lv_rhs, 0.0, LV_Y0, LV_P, jnp.array(tvals),
        BDFOptions(rtol=1e-10, atol=1e-10, adams_max_order=8),
    )
    # comparable efficiency: a high cap must not blow the step count up
    assert int(res.stats["n_steps"]) < 1.3 * int(res8.stats["n_steps"])

    # the native core accepts the same cap (A_MAX_ORDER = 12 in cvbdf.cpp)
    from sunode_tpu.native.cpu_solver import CpuSolver

    def rhs_sym(t, y, p):
        return {
            "h": p.a * y.h - p.b * y.h * y.l,
            "l": p.d * y.h * y.l - p.g * y.l,
        }

    prob = SympyProblem(
        params={"a": (), "b": (), "g": (), "d": ()},
        states={"h": (), "l": ()},
        rhs_sympy=rhs_sym,
        derivative_params=[("a",)],
    )
    s = CpuSolver(
        prob, abstol=1e-10, reltol=1e-10, method="ADAMS",
        adams_max_order=max_order,
    )
    s.set_params_dict(
        {"a": float(LV_P[0]), "b": float(LV_P[1]),
         "g": float(LV_P[2]), "d": float(LV_P[3])}
    )
    ys = s.solve(0.0, tvals, np.asarray(LV_Y0))
    assert np.max(np.abs((ys - ref) / ref)) < 1e-7


def test_order_climbs():
    tvals = jnp.linspace(1.0, 10.0, 5)
    res = adams_solve(lv_rhs, 0.0, LV_Y0, LV_P, tvals, BDFOptions(rtol=1e-10, atol=1e-10))
    assert int(res.status) == 0
    assert int(res.stats["final_order"]) >= 4


def test_interp_exact_for_low_order_poly():
    # f(t) = 3t^2 -> y = t^3; at order p>=3 the f-interpolant is exact
    rhs = lambda t, y, p: jnp.array([3 * t * t])
    tvals = jnp.array([0.77, 1.9])
    res = adams_solve(
        rhs, 0.0, jnp.array([0.0]), jnp.zeros(0), tvals, BDFOptions(rtol=1e-10, atol=1e-12)
    )
    assert int(res.status) == 0
    np.testing.assert_allclose(
        np.asarray(res.ys[:, 0]), np.asarray(tvals) ** 3, rtol=1e-9
    )


def test_vmap_and_jit():
    tvals = jnp.linspace(0.5, 6.0, 5)

    @jax.jit
    def solve_one(y0):
        return adams_solve(lv_rhs, 0.0, y0, LV_P, tvals, BDFOptions(rtol=1e-8, atol=1e-8))

    y0s = jnp.tile(LV_Y0, (6, 1)) * jnp.linspace(0.9, 1.1, 6)[:, None]
    rb = jax.jit(jax.vmap(solve_one))(y0s)
    assert (np.asarray(rb.status) == 0).all()
    solo = solve_one(y0s[2])
    np.testing.assert_allclose(np.asarray(rb.ys[2]), np.asarray(solo.ys), rtol=1e-7)


def test_solver_class_adams():
    def lv(t, y, p):
        return {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        }

    prob = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lv,
        derivative_params=[("alpha",)],
    )
    s_adams = Solver(prob, solver="ADAMS", abstol=1e-10, reltol=1e-10)
    s_bdf = Solver(prob, solver="BDF", abstol=1e-10, reltol=1e-10)
    s_adams.set_params_dict({"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4})
    s_bdf.set_params_dict({"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4})
    tv = np.linspace(0.5, 8, 7)
    out_a = s_adams.solve(0.0, tv, np.array([10.0, 2.0]))
    out_b = s_bdf.solve(0.0, tv, np.array([10.0, 2.0]))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-6)
    # sens with ADAMS runs as an augmented state (tests/test_solver_modes.py
    # checks the values against finite differences)
    Solver(prob, solver="ADAMS", sens_mode="simultaneous")


def test_failure_poisoning():
    rhs = lambda t, y, p: y * y
    tvals = jnp.array([0.5, 2.0])
    res = adams_solve(
        rhs, 0.0, jnp.array([1.0]), jnp.zeros(0), tvals,
        BDFOptions(rtol=1e-8, atol=1e-8, max_steps=2000),
    )
    assert int(res.status) != 0
    assert np.isnan(np.asarray(res.ys)[1, 0])
