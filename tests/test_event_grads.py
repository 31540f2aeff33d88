"""Differentiable event times (sunode_tpu/events.py): IFT gradients of the
bouncing-ball impact time against closed forms and central FD — the
hybrid-system gradient capability the reference never had (its rootfinding
surface, 16_cvodes.h:195-214, is not exposed at all)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.events import make_event_fn
from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem


@pytest.fixture(scope="module")
def ball():
    return SympyProblem(
        params={"g": ()},
        states={"x": (), "v": ()},
        rhs_sympy=lambda t, y, p: {"x": y.v, "v": -p.g},
        derivative_params=[("g",)],
    )


def _roots(t, y, p):
    return [y.x]


OPTS = BDFOptions(rtol=1e-10, atol=1e-12)
H, G = 2.0, 9.81


def _drag_rhs(t, y, p):
    return {"x": y.v, "v": -p.g - p.c * y.v}


def _closed_forms():
    t_star = np.sqrt(2 * H / G)
    return dict(
        t_star=t_star,
        dt_dg=-t_star / (2 * G),
        dt_dh=1.0 / (G * t_star),
        v_star=-G * t_star,
        dv_dg=-t_star / 2,
        dv_dh=-1.0 / t_star,
    )


@pytest.mark.parametrize("derivatives", ["forward", "adjoint"])
def test_impact_time_gradients_closed_form(ball, derivatives):
    event = make_event_fn(ball, _roots, options=OPTS, derivatives=derivatives)
    cf = _closed_forms()
    p_fix = jnp.zeros((0,))

    def t_of(p_sub, y0):
        return event(0.0, y0, p_sub, p_fix, 3.0)[0]

    y0 = jnp.array([H, 0.0])
    p_sub = jnp.array([G])
    t_ev = t_of(p_sub, y0)
    assert abs(float(t_ev) - cf["t_star"]) < 1e-8

    dg = jax.grad(t_of, argnums=0)(p_sub, y0)
    dy0 = jax.grad(t_of, argnums=1)(p_sub, y0)
    assert abs(float(dg[0]) - cf["dt_dg"]) < 1e-6
    assert abs(float(dy0[0]) - cf["dt_dh"]) < 1e-6
    # dt*/dv0: t* solves h + v0 t - g t^2/2 = 0; at v0=0, dt*/dv0 = t*/(g t*)
    # = 1/g... derive: dt/dv0 = -t*/(v0 - g t*) = 1/g at v0=0
    assert abs(float(dy0[1]) - 1.0 / G) < 1e-6


def test_impact_state_gradients_closed_form(ball):
    event = make_event_fn(ball, _roots, options=OPTS)
    cf = _closed_forms()
    p_fix = jnp.zeros((0,))

    def v_of(p_sub, y0):
        return event(0.0, y0, p_sub, p_fix, 3.0)[1][1]  # impact velocity

    y0 = jnp.array([H, 0.0])
    p_sub = jnp.array([G])
    assert abs(float(v_of(p_sub, y0)) - cf["v_star"]) < 1e-7
    dg = jax.grad(v_of, argnums=0)(p_sub, y0)
    dy0 = jax.grad(v_of, argnums=1)(p_sub, y0)
    assert abs(float(dg[0]) - cf["dv_dg"]) < 1e-6
    assert abs(float(dy0[0]) - cf["dv_dh"]) < 1e-6
    # impact position x* == 0 identically: zero gradients
    def x_of(p_sub):
        return event(0.0, y0, p_sub, p_fix, 3.0)[1][0]

    dx = jax.grad(x_of)(p_sub)
    assert abs(float(dx[0])) < 1e-6


def test_impact_time_matches_central_fd_nonlinear(ball):
    """Drag makes the closed form disappear; FD is the oracle."""
    prob = SympyProblem(
        params={"g": (), "c": ()},
        states={"x": (), "v": ()},
        rhs_sympy=lambda t, y, p: {"x": y.v, "v": -p.g - p.c * y.v},
        derivative_params=[("g",), ("c",)],
    )
    event = make_event_fn(prob, _roots, options=OPTS)
    p_fix = jnp.zeros((0,))
    y0 = jnp.array([H, 0.0])

    def t_of(p_sub):
        return event(0.0, y0, p_sub, p_fix, 3.0)[0]

    p0 = jnp.array([G, 0.3])
    grad = np.asarray(jax.grad(t_of)(p0))
    eps = 1e-6
    for k in range(2):
        pp = np.asarray(p0).copy(); pp[k] += eps
        pm = np.asarray(p0).copy(); pm[k] -= eps
        fd = (float(t_of(jnp.asarray(pp))) - float(t_of(jnp.asarray(pm)))) / (
            2 * eps
        )
        assert abs(grad[k] - fd) < 1e-5 * max(1.0, abs(fd)), (k, grad[k], fd)


def test_event_fn_composes_with_jit_and_vmap(ball):
    event = make_event_fn(ball, _roots, options=OPTS)
    p_fix = jnp.zeros((0,))

    @jax.jit
    def batch_times(h_batch):
        y0s = jnp.stack([h_batch, jnp.zeros_like(h_batch)], axis=1)
        fn = lambda y0: event(0.0, y0, jnp.array([G]), p_fix, 3.0)[0]
        return jax.vmap(fn)(y0s)

    hs = jnp.array([0.5, 1.0, 2.0, 4.0])
    ts = np.asarray(batch_times(hs))
    np.testing.assert_allclose(ts, np.sqrt(2 * np.asarray(hs) / G), atol=1e-8)


def test_event_fn_validation_and_no_root(ball):
    with pytest.raises(ValueError, match="root_terminal=False"):
        make_event_fn(ball, _roots, which=1)
    with pytest.raises(ValueError, match="root_cap"):
        make_event_fn(ball, _roots, which=9, root_terminal=False)
    # no root in [0, t_max]: inf time, NaN gradient (not a crash)
    event = make_event_fn(ball, _roots, options=OPTS)
    p_fix = jnp.zeros((0,))
    y0 = jnp.array([H, 0.0])
    t_ev = event(0.0, y0, jnp.array([0.01]), p_fix, 0.5)[0]  # barely falls
    assert not np.isfinite(float(t_ev))


@pytest.mark.parametrize("kinds", [("BDF", "BDF"), ("ADAMS", "ADAMS")])
def test_adjoint_solver_with_terminal_event(kinds):
    """VERDICT r3 #9: CVodeF-records-while-rootfinding analog.
    AdjointSolver(roots=...) stops the recording pass at the terminal
    root; solve_backward zeroes the (NaN) post-impact cotangent rows and
    returns the exact gradient of the pre-impact observable (FD-checked
    against a rootless tight solve — the pre-impact trajectory is
    identical with or without the event)."""
    import jax.numpy as jnp

    from sunode_tpu.solver import AdjointSolver
    from sunode_tpu.wrappers.as_jax import make_solve_fn

    prob = SympyProblem(
        params={"g": (), "c": ()},
        states={"x": (), "v": ()},
        rhs_sympy=_drag_rhs,
        derivative_params=[("g",), ("c",)],
    )
    y0 = np.array([H, 0.0])
    p_dict = {"g": G, "c": 0.3}
    # impact at ~0.65s with drag: two observations before, two after
    tvals = np.array([0.2, 0.4, 0.8, 1.0])

    solver, adjoint_solver = kinds
    s = AdjointSolver(
        prob, abstol=1e-10, reltol=1e-10, roots=_roots,
        solver=solver, adjoint_solver=adjoint_solver,
    )
    assert not s._native_adj_eligible()  # event recording is the JAX path
    s.set_params_dict(p_dict)
    ys = s.solve_forward(0.0, tvals, y0)
    st = s.last_stats
    assert int(st["n_roots"]) == 1
    t_root = float(st["roots_t"][0])
    assert 0.4 < t_root < 0.8
    assert np.isfinite(ys[:2]).all() and np.isnan(ys[2:]).all()

    # L = sum of x(t_i)^2 over the PRE-impact observations; the NaN rows'
    # cotangents (as a naive loss would produce) must be sanitized away
    grads = 2.0 * ys
    grads[:, 1] = 0.0  # only x enters L
    quad, lam = s.solve_backward(tvals[-1], 0.0, tvals, grads)
    assert np.isfinite(quad).all() and np.isfinite(lam).all()

    # FD oracle through the rootless differentiable solve (identical
    # dynamics before the impact)
    from sunode_tpu.ops.bdf import BDFOptions

    plain = make_solve_fn(
        prob, derivatives=None, options=BDFOptions(rtol=1e-12, atol=1e-13)
    )
    tv_pre = jnp.asarray(tvals[:2])

    def L(p_sub, y0v):
        ys = plain(0.0, jnp.asarray(y0v), jnp.asarray(p_sub), jnp.zeros((0,)), tv_pre)
        return float(jnp.sum(ys[:, 0] ** 2))

    p0 = np.array([G, 0.3])
    eps = 1e-6
    for k in range(2):
        pp, pm = p0.copy(), p0.copy()
        pp[k] += eps
        pm[k] -= eps
        fd = (L(pp, y0) - L(pm, y0)) / (2 * eps)
        assert abs(quad[k] - fd) < 1e-5 * max(1.0, abs(fd)), (k, quad[k], fd)
    # dL/dy0 = -lamda (reference sign convention)
    for k in range(2):
        yp, ym = y0.copy(), y0.copy()
        yp[k] += eps
        ym[k] -= eps
        fd = (L(p0, yp) - L(p0, ym)) / (2 * eps)
        assert abs(-lam[k] - fd) < 1e-5 * max(1.0, abs(fd)), (k, -lam[k], fd)

    # pickling keeps the event config (reference AdjointSolver cannot
    # pickle at all)
    import pickle

    s2 = pickle.loads(pickle.dumps(s))
    s2.solve_forward(0.0, tvals, y0)
    assert abs(float(s2.last_stats["roots_t"][0]) - t_root) < 1e-12


def test_second_root_nonterminal(ball):
    """which=1 on a recording solve: the oscillator's second zero of x."""
    prob = SympyProblem(
        params={"w": ()},
        states={"x": (), "v": ()},
        rhs_sympy=lambda t, y, p: {"x": y.v, "v": -p.w * p.w * y.x},
        derivative_params=[("w",)],
    )
    event = make_event_fn(
        prob, _roots, which=1, root_terminal=False, options=OPTS
    )
    p_fix = jnp.zeros((0,))
    y0 = jnp.array([1.0, 0.0])

    def t2(p_sub):
        return event(0.0, y0, p_sub, p_fix, 6.0)[0]

    w = 1.3
    # x = cos(w t): zeros at (k + 1/2) pi / w; second is 3pi/(2w)
    t_expect = 3 * np.pi / (2 * w)
    assert abs(float(t2(jnp.array([w]))) - t_expect) < 1e-8
    dw = float(jax.grad(t2)(jnp.array([w]))[0])
    assert abs(dw - (-t_expect / w)) < 1e-6
