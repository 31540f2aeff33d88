"""PyTensor wrapper — modeled on reference sunode/test_pytensor.py.

Skipped when pytensor is not installed (it is optional, like xarray)."""

import numpy as np
import pytest

pytensor = pytest.importorskip("pytensor")
import pytensor.tensor as pt  # noqa: E402

from sunode_tpu.wrappers.as_pytensor import solve_ivp  # noqa: E402


def lv(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


TVALS = np.linspace(0.5, 8, 7)


def _model(derivatives, **solver_kwargs):
    alpha = pt.dscalar("alpha")
    beta = pt.dscalar("beta")
    y0_h = pt.dscalar("y0_h")
    solved = solve_ivp(
        t0=0.0,
        y0={"hares": (y0_h, ()), "lynx": (np.float64(2.0), ())},
        params={
            "alpha": (alpha, ()),
            "beta": (beta, ()),
            "gamma": np.float64(1.0),
            "delta": np.float64(0.4),
            "extra": np.zeros(1),
        },
        tvals=TVALS,
        rhs=lv,
        derivatives=derivatives,
        solver_kwargs=solver_kwargs,
    )
    return (alpha, beta, y0_h), solved


def test_adjoint_shapes_and_grad():
    (alpha, beta, y0_h), solved = _model("adjoint")
    solution, flat, problem, sol, y0_flat, p_flat = solved
    loss = (flat**2).sum()
    g_alpha, g_beta, g_y0 = pytensor.grad(loss, [alpha, beta, y0_h])
    f = pytensor.function([alpha, beta, y0_h], [loss, g_alpha, g_beta, g_y0])
    l, ga, gb, gy = f(1.0, 0.3, 10.0)
    assert np.isfinite([l, ga, gb, gy]).all()
    # finite-difference check on alpha
    eps = 1e-6
    f0 = pytensor.function([alpha, beta, y0_h], loss)
    fd = (f0(1.0 + eps, 0.3, 10.0) - f0(1.0 - eps, 0.3, 10.0)) / (2 * eps)
    np.testing.assert_allclose(ga, fd, rtol=1e-4)


def test_forward_shapes_and_grad():
    (alpha, beta, y0_h), solved = _model(
        "forward", sens_mode="simultaneous"
    )
    solution, flat, problem, sol, y0_flat, p_flat, flat_sens, wrapper = solved
    loss = (flat**2).sum()
    g_alpha = pytensor.grad(loss, alpha)
    f = pytensor.function([alpha, beta, y0_h], [loss, g_alpha])
    l, ga = f(1.0, 0.3, 10.0)
    eps = 1e-6
    f0 = pytensor.function([alpha, beta, y0_h], loss)
    fd = (f0(1.0 + eps, 0.3, 10.0) - f0(1.0 - eps, 0.3, 10.0)) / (2 * eps)
    np.testing.assert_allclose(ga, fd, rtol=1e-4)


def test_forward_y0_grad_via_initial_values():
    (alpha, beta, y0_h), solved = _model("forward", sens_mode="simultaneous")
    _, flat, *_ = solved
    loss = (flat**2).sum()
    g_y0 = pytensor.grad(loss, y0_h)
    f = pytensor.function([alpha, beta, y0_h], [loss, g_y0])
    eps = 1e-6
    f0 = pytensor.function([alpha, beta, y0_h], loss)
    _, gy = f(1.0, 0.3, 10.0)
    fd = (f0(1.0, 0.3, 10.0 + eps) - f0(1.0, 0.3, 10.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(gy, fd, rtol=1e-4)


def test_solution_named_access():
    (_, _, _), solved = _model("adjoint")
    solution = solved[0]
    assert "hares" in solution and "lynx" in solution


def test_grad_wrt_tvals():
    pt_tvals = pt.dvector("tv")
    alpha = pt.dscalar("alpha")
    solved = solve_ivp(
        t0=0.0,
        y0={"hares": (np.float64(10.0), ()), "lynx": (np.float64(2.0), ())},
        params={
            "alpha": (alpha, ()),
            "beta": np.float64(0.3),
            "gamma": np.float64(1.0),
            "delta": np.float64(0.4),
        },
        tvals=pt_tvals,
        rhs=lv,
        derivatives="adjoint",
    )
    flat = solved[1]
    loss = (flat**2).sum()
    g_tv = pytensor.grad(loss, pt_tvals)
    f = pytensor.function([alpha, pt_tvals], g_tv)
    g = f(1.0, TVALS)
    assert np.isfinite(g).all() and g.shape == TVALS.shape
