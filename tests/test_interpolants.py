"""Adjoint-interpolant exactness properties (round 3).

The quintic Hermite evaluator (hermite_order=5 rows) and the CV_POLYNOMIAL
barycentric evaluator must reproduce polynomial trajectories exactly on
their degree class — the property that pins the O(h^6) reconstruction
claims in docs/limitations.md.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sunode_tpu.adjoint import (
    _quintic_basis,
    make_hermite_eval,
    make_hermite_eval_batched,
    make_polynomial_eval,
    make_polynomial_eval_batched,
)


def _poly_traj(ts, coeffs):
    poly = np.polynomial.Polynomial(coeffs)
    return poly(ts), poly.deriv(1)(ts), poly.deriv(2)(ts)


def _saved_single(ts, y, f, fd=None, n_pad=4):
    S = len(ts) + n_pad
    t_buf = np.full(S, np.inf)
    t_buf[: len(ts)] = ts
    mk = lambda a: np.pad(  # noqa: E731
        a[:, None], ((0, n_pad), (0, 0)), constant_values=0.0
    )
    saved = {
        "t": jnp.asarray(t_buf),
        "y": jnp.asarray(mk(y)),
        "f": jnp.asarray(mk(f)),
        "n_saved": jnp.asarray(len(ts)),
        "overflow": jnp.asarray(False),
    }
    if fd is not None:
        saved["fd"] = jnp.asarray(mk(fd))
    return saved


def test_quintic_basis_degree5_exact():
    rng = np.random.default_rng(0)
    c = rng.standard_normal(6)
    poly = np.polynomial.Polynomial(c)
    d1, d2 = poly.deriv(1), poly.deriv(2)
    t0, t1 = 0.3, 1.1
    h = t1 - t0
    for t in np.linspace(t0, t1, 9):
        tau = (t - t0) / h
        H = _quintic_basis(jnp.asarray(tau))
        val = (
            H[0] * poly(t0) + H[1] * h * d1(t0) + H[2] * h * h * d2(t0)
            + H[3] * poly(t1) + H[4] * h * d1(t1) + H[5] * h * h * d2(t1)
        )
        assert abs(float(val) - poly(t)) < 1e-12


def test_quintic_hermite_eval_exact_on_quintic():
    rng = np.random.default_rng(1)
    c = rng.standard_normal(6)
    ts = np.sort(rng.uniform(0, 3, 7))
    y, f, fd = _poly_traj(ts, c)
    saved = _saved_single(ts, y, f, fd)
    y_at = make_hermite_eval(saved)
    poly = np.polynomial.Polynomial(c)
    for t in np.linspace(ts[0], ts[-1], 25):
        got = float(y_at(jnp.asarray(t))[0])
        assert abs(got - poly(t)) < 1e-10 * (1 + abs(poly(t))), t


def test_cubic_hermite_eval_exact_on_cubic():
    rng = np.random.default_rng(2)
    c = rng.standard_normal(4)
    ts = np.sort(rng.uniform(0, 3, 6))
    y, f, _ = _poly_traj(ts, c)
    saved = _saved_single(ts, y, f)  # no fd -> cubic path
    y_at = make_hermite_eval(saved)
    poly = np.polynomial.Polynomial(c)
    for t in np.linspace(ts[0], ts[-1], 19):
        got = float(y_at(jnp.asarray(t))[0])
        assert abs(got - poly(t)) < 1e-11 * (1 + abs(poly(t)))


def test_polynomial_eval_exact_on_degree5():
    """POLY_K=6-point barycentric Lagrange reproduces degree-5 exactly —
    only from y samples (no derivative rows)."""
    rng = np.random.default_rng(3)
    c = rng.standard_normal(6)
    ts = np.sort(rng.uniform(0, 3, 9))
    y, f, _ = _poly_traj(ts, c)
    saved = _saved_single(ts, y, f)
    y_at = make_polynomial_eval(saved)
    poly = np.polynomial.Polynomial(c)
    for t in np.linspace(ts[0], ts[-1], 25):
        got = float(y_at(jnp.asarray(t))[0])
        assert abs(got - poly(t)) < 1e-9 * (1 + abs(poly(t))), t
    # exact node hits return the stored samples
    for k in range(len(ts)):
        got = float(y_at(jnp.asarray(ts[k]))[0])
        assert abs(got - y[k]) < 1e-12


def test_polynomial_eval_degree_reduces_with_few_rows():
    """With fewer recorded rows than POLY_K the degree reduces gracefully
    (pad rows carry weight zero)."""
    rng = np.random.default_rng(4)
    c = rng.standard_normal(3)  # quadratic
    ts = np.sort(rng.uniform(0, 2, 4))  # only 4 rows < POLY_K=6
    y, f, _ = _poly_traj(ts, c)
    saved = _saved_single(ts, y, f, n_pad=6)
    y_at = make_polynomial_eval(saved)
    poly = np.polynomial.Polynomial(c)
    for t in np.linspace(ts[0], ts[-1], 11):
        got = float(y_at(jnp.asarray(t))[0])
        assert abs(got - poly(t)) < 1e-10 * (1 + abs(poly(t)))


def _batched_from_single(saved, reps=3):
    out = {
        "t": jnp.broadcast_to(saved["t"][:, None], saved["t"].shape + (reps,)),
        "n_saved": jnp.broadcast_to(saved["n_saved"][None], (reps,)),
        "overflow": jnp.broadcast_to(saved["overflow"][None], (reps,)),
    }
    parts = [saved["y"], saved["f"]]
    if "fd" in saved:
        parts.append(saved["fd"])
        out["fd"] = jnp.broadcast_to(
            saved["fd"][:, :, None], saved["fd"].shape + (reps,)
        )
    yf = jnp.concatenate(parts, axis=1)
    out["yf"] = jnp.broadcast_to(yf[:, :, None], yf.shape + (reps,))
    out["y"] = jnp.broadcast_to(saved["y"][:, :, None], saved["y"].shape + (reps,))
    out["f"] = jnp.broadcast_to(saved["f"][:, :, None], saved["f"].shape + (reps,))
    return out


def test_quintic_stiffness_gate_switches():
    """With an 'L' row recorded, intervals with h*L > 1 must fall back to
    the cubic value (poisoned fd is ignored); intervals with h*L <= 1 keep
    the quintic (exact on a quintic polynomial)."""
    rng = np.random.default_rng(7)
    c = rng.standard_normal(6)
    ts = np.sort(rng.uniform(0, 3, 8))
    y, f, fd = _poly_traj(ts, c)
    poisoned_fd = fd + 1e6  # garbage second-derivative data
    poly = np.polynomial.Polynomial(c)

    def with_L(L_val, fd_rows):
        saved = _saved_single(ts, y, f, fd_rows)
        Ls = np.zeros(len(saved["t"]))
        Ls[: len(ts)] = L_val
        saved["L"] = jnp.asarray(Ls)
        return make_hermite_eval(saved)

    cubic_ref = make_hermite_eval(_saved_single(ts, y, f))  # no fd
    ungated_errs = []
    for t in np.linspace(ts[0] + 1e-6, ts[-1] - 1e-6, 9):
        # gate open (tiny L): quintic -> exact on clean fd
        got_open = float(with_L(1e-9, fd)(jnp.asarray(t))[0])
        assert abs(got_open - poly(t)) < 1e-10 * (1 + abs(poly(t)))
        # gate closed (huge L): poisoned fd must be IGNORED -> cubic value
        got_closed = float(with_L(1e12, poisoned_fd)(jnp.asarray(t))[0])
        ref = float(cubic_ref(jnp.asarray(t))[0])
        np.testing.assert_allclose(got_closed, ref, rtol=1e-12, atol=1e-12)
        # ungated poisoned quintic would be wildly wrong (sanity of the test;
        # per-point error vanishes near nodes where the H2/H5 weights -> 0)
        got_ungated = float(with_L(1e-9, poisoned_fd)(jnp.asarray(t))[0])
        ungated_errs.append(abs(got_ungated - poly(t)))
    assert max(ungated_errs) > 1.0


def test_quintic_gate_on_stiff_robertson_record():
    """End-to-end regression: the hermite_order=5 checkpoint record of a
    stiff Robertson solve must reconstruct y(t) at cubic quality or better.

    Without the h*||J|| gate the quintic's h^2*(J f) rows amplify the
    forward solve's node error by (hL)^2 in the h*L >> 1 regime (measured
    max-rel 2.7e-2 ungated vs 1.8e-8 cubic at fwd rtol 1e-10 — a 1e-4
    gradient bias).  Matches the native engine's gate (cvbdf.cpp)."""
    from scipy.integrate import solve_ivp

    from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
    from sunode_tpu.symode.problem import SympyProblem

    def rob(t, y, p):
        r1 = p.k1 * y.a
        r2 = p.k2 * y.b * y.b
        r3 = p.k3 * y.b * y.c
        return {"a": -r1 + r3, "b": r1 - r2 - r3, "c": r2}

    prob = SympyProblem(
        params={"k1": (), "k2": (), "k3": ()},
        states={"a": (), "b": (), "c": ()},
        rhs_sympy=rob,
        derivative_params=[],
    )
    rhs, jac = prob.make_rhs(), prob.make_jac_dense()
    pvec = jnp.asarray(prob.params.flatten_dict({"k1": 0.04, "k2": 3e7, "k3": 1e4}))
    y0 = jnp.array([1.0, 0.0, 0.0])
    res = bdf_solve(
        rhs, jac, 0.0, y0, pvec, jnp.array([1e5]),
        BDFOptions(rtol=1e-8, atol=1e-14, max_steps=100_000,
                   save_steps=2048, hermite_order=5),
    )
    assert int(res.status) == 0
    assert "L" in res.saved  # BDF quintic rows carry the gate data
    # the stiff tail must actually trip the gate somewhere
    ts_rec = np.asarray(res.saved["t"])
    Ls = np.asarray(res.saved["L"])
    ns = int(res.saved["n_saved"])
    hL = np.diff(ts_rec[:ns]) * np.maximum(Ls[: ns - 1], Ls[1:ns])
    assert (hL > 1.0).any() and (hL <= 1.0).any()

    y_at = make_hermite_eval(res.saved)
    tq = np.logspace(-2, np.log10(9.5e4), 60)
    got = np.asarray(jnp.stack([y_at(jnp.asarray(t)) for t in tq]))
    ref = solve_ivp(
        lambda t, y: [
            -0.04 * y[0] + 1e4 * y[1] * y[2],
            0.04 * y[0] - 3e7 * y[1] ** 2 - 1e4 * y[1] * y[2],
            3e7 * y[1] ** 2,
        ],
        (0.0, 1e5), [1.0, 0.0, 0.0], t_eval=tq, method="BDF",
        rtol=1e-11, atol=1e-16, jac=lambda t, y: [
            [-0.04, 1e4 * y[2], 1e4 * y[1]],
            [0.04, -6e7 * y[1] - 1e4 * y[2], -1e4 * y[1]],
            [0.0, 6e7 * y[1], 0.0],
        ],
    ).y.T
    scale = np.abs(ref) + np.array([1e-10, 1e-12, 1e-10])
    maxrel = float((np.abs(got - ref) / scale).max())
    assert maxrel < 1e-4, f"gated quintic reconstruction maxrel {maxrel:.2e}"


@pytest.mark.parametrize("mode", ["hermite", "polynomial"])
def test_batched_evaluators_match_single(mode):
    rng = np.random.default_rng(5)
    c = rng.standard_normal(6)
    ts = np.sort(rng.uniform(0, 3, 8))
    y, f, fd = _poly_traj(ts, c)
    saved = _saved_single(ts, y, f, fd)
    saved_b = _batched_from_single(saved)
    if mode == "hermite":
        single = make_hermite_eval(saved)
        batched = make_hermite_eval_batched(saved_b)
    else:
        single = make_polynomial_eval(saved)
        batched = make_polynomial_eval_batched(saved_b)
    for t in np.linspace(ts[0], ts[-1], 13):
        s = float(single(jnp.asarray(t))[0])
        b = np.asarray(batched(jnp.full((3,), t)))
        np.testing.assert_allclose(b[0], s, rtol=1e-12, atol=1e-12)
        assert np.allclose(b[:, 0], b[:, 1])
