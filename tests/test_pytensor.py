"""PyTensor wrapper — modeled on reference sunode/test_pytensor.py.

Runs against the real pytensor when installed; otherwise against the
vendored Op-protocol shim (sunode_tpu/_compat/pt_shim.py), so the wrapper's
perform/grad bodies execute either way."""

import numpy as np
import pytest

from sunode_tpu._compat.pt_shim import install as _install_shim

_install_shim()

import pytensor  # noqa: E402
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


def test_nuts_leapfrog_smoke():
    """BASELINE config 4 smoke: logp + dlogp through SolveODEAdjoint driving
    HMC leapfrog steps (what PyMC NUTS executes per tree extension).

    The posterior is a Gaussian likelihood on noisy LV observations with a
    Gaussian prior on (alpha, beta); gradients flow through the adjoint Op.
    """
    alpha = pt.dscalar("alpha")
    beta = pt.dscalar("beta")
    solved = solve_ivp(
        t0=0.0,
        y0={"hares": (np.float64(10.0), ()), "lynx": (np.float64(2.0), ())},
        params={
            "alpha": (alpha, ()),
            "beta": (beta, ()),
            "gamma": np.float64(1.0),
            "delta": np.float64(0.4),
        },
        tvals=TVALS,
        rhs=lv,
        derivatives="adjoint",
    )
    flat = solved[1]

    # synthetic observations from the true trajectory
    rng = np.random.default_rng(0)
    f_truth = pytensor.function([alpha, beta], flat)
    data = f_truth(1.0, 0.3) + 0.1 * rng.standard_normal((len(TVALS), 2))
    sigma = 0.1

    resid = flat - pt.as_tensor_variable(data)
    loglike = -0.5 * (resid * resid).sum() / sigma**2
    logprior = -0.5 * ((alpha - 1.0) ** 2 + (beta - 0.3) ** 2) / 0.5**2
    logp = loglike + logprior

    dlogp = pytensor.grad(logp, [alpha, beta])
    logp_dlogp = pytensor.function([alpha, beta], [logp] + dlogp)

    # a few HMC leapfrog steps
    q = np.array([1.02, 0.31])
    p = np.array([0.3, -0.2])
    eps = 1e-4
    lp0, ga, gb = logp_dlogp(*q)
    g = np.array([ga, gb])
    H0 = -float(lp0) + 0.5 * float(p @ p)
    for _ in range(5):
        p = p + 0.5 * eps * g
        q = q + eps * p
        lp, ga, gb = logp_dlogp(*q)
        g = np.array([ga, gb])
        p = p + 0.5 * eps * g
    H1 = -float(lp) + 0.5 * float(p @ p)
    assert np.isfinite([H0, H1]).all()
    # leapfrog is symplectic: the Hamiltonian is nearly conserved when the
    # gradients are consistent with the logp (a wrong gradient diverges fast)
    assert abs(H1 - H0) < 1e-2 * (1 + abs(H0))


def test_nan_poisoning_through_op():
    """A diverging parameter region must yield NaN logp/grad (so a sampler
    rejects) rather than raising — reference as_pytensor.py:244-247."""
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
        tvals=TVALS,
        rhs=lv,
        derivatives="adjoint",
    )
    flat = solved[1]
    loss = (flat**2).sum()
    g = pytensor.grad(loss, alpha)
    f = pytensor.function([alpha], [loss, g])
    l_ok, g_ok = f(1.0)
    assert np.isfinite(l_ok) and np.isfinite(g_ok)
    l_bad, g_bad = f(np.nan)  # a diverged sampler proposal
    assert np.isnan(l_bad) and np.isnan(g_bad)


def test_nullgrad_raises_not_zero():
    """grad through an op whose input gradient is grad_not_implemented must
    raise (pytensor NullTypeGradError semantics), never silently return
    zeros (code-review round 2)."""
    from sunode_tpu._compat.pt_shim import NullTypeGradError

    x = pt.dscalar("x")
    e = pt.as_tensor_variable(np.asarray(2.0)) ** x  # d/d(exponent): null
    with pytest.raises(NullTypeGradError):
        pytensor.grad(e, x)
