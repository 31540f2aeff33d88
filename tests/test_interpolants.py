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
