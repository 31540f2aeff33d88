"""Property-based tests (reference test_basic.py uses hypothesis the same way)."""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from sunode_tpu.paramspec import ParamSpec
from sunode_tpu.ops.linalg import solve_dense
from sunode_tpu.ops import bdf as bm


@given(
    shapes=st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 3)), min_size=1, max_size=5
    )
)
@settings(max_examples=30, deadline=None)
def test_paramspec_flatten_roundtrip(shapes):
    spec_dict = {}
    for i, (ndim0, k) in enumerate(shapes):
        shape = tuple([k] * min(ndim0, 2))
        spec_dict[f"v{i}"] = shape
    spec = ParamSpec(spec_dict)
    rng = np.random.default_rng(0)
    values = {name: rng.standard_normal(shape) for name, shape in spec_dict.items()}
    vec = spec.flatten_dict(values)
    assert vec.shape == (spec.n_items,)
    back = spec.unflatten(vec)
    for name, shape in spec_dict.items():
        np.testing.assert_allclose(back[name], values[name])


@given(
    n=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_lu_solve_random_wellconditioned(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + (n + 1) * np.eye(n)
    b = rng.standard_normal(n)
    x = solve_dense(jnp.array(A), jnp.array(b))
    np.testing.assert_allclose(np.asarray(A @ np.asarray(x)), b, atol=1e-8)


@given(
    q=st.integers(1, 5),
    factor=st.floats(0.2, 5.0),
    seed=st.integers(0, 1000),
)
@settings(max_examples=30, deadline=None)
def test_rescale_D_invertible(q, factor, seed):
    """Rescaling by r then by 1/r must round-trip (well within fp error)."""
    rng = np.random.default_rng(seed)
    D = jnp.asarray(rng.standard_normal((bm.KD, 3)))
    D2 = bm._rescale_D(D, q, factor)
    D3 = bm._rescale_D(D2, q, 1.0 / factor)
    np.testing.assert_allclose(np.asarray(D3[: q + 1]), np.asarray(D[: q + 1]), rtol=1e-7, atol=1e-9)


@given(
    q=st.integers(1, 5),
    s=st.floats(-3.0, 0.0),
)
@settings(max_examples=30, deadline=None)
def test_interpolate_polynomial_reproduction(q, s):
    """The dense-output interpolant must reproduce degree-q polynomials."""
    h, t_n = 0.3, 2.0
    coeffs = np.arange(1, q + 2, dtype=float)
    poly = np.polynomial.Polynomial(coeffs)
    ts = [t_n - i * h for i in range(q + 1)]
    vals = [np.atleast_1d(poly(t)) for t in ts]
    rows = vals
    D = [vals[0]]
    for k in range(1, q + 1):
        rows = [rows[i] - rows[i + 1] for i in range(len(rows) - 1)]
        D.append(rows[0])
    D_full = jnp.zeros((bm.KD, 1)).at[: q + 1].set(jnp.array(np.array(D)))
    te = t_n + s * h
    got = bm._interpolate(D_full, q, t_n, h, te)
    np.testing.assert_allclose(np.asarray(got)[0], poly(te), rtol=1e-9, atol=1e-9)


@given(seed=st.integers(0, 500))
@settings(max_examples=15, deadline=None)
def test_solver_tolerance_scaling(seed):
    """Tighter tolerance must not increase the error (statistically)."""
    rng = np.random.default_rng(seed)
    k = float(rng.uniform(0.5, 2.0))
    rhs = lambda t, y, p: -p[0] * y
    jac = lambda t, y, p: jnp.array([[-p[0]]])
    tvals = jnp.array([1.0, 3.0])
    errs = []
    for rtol in (1e-5, 1e-9):
        res = bm.bdf_solve(
            rhs, jac, 0.0, jnp.array([2.0]), jnp.array([k]), tvals,
            bm.BDFOptions(rtol=rtol, atol=rtol),
        )
        assert int(res.status) == 0
        exact = 2.0 * np.exp(-k * np.asarray(tvals))
        errs.append(np.abs(np.asarray(res.ys[:, 0]) - exact).max())
    assert errs[1] <= errs[0] * 1.5 + 1e-12


@given(
    n=st.integers(2, 20),
    lower=st.integers(0, 4),
    upper=st.integers(0, 4),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=40, deadline=None)
def test_banded_lu_solves_random_systems(n, lower, upper, seed):
    """banded_factor/banded_solve match the dense solution for random
    banded systems of every bandwidth combination (incl. pure lower/upper
    triangular bands), with partial pivoting handling weak diagonals."""
    from sunode_tpu.ops.banded import banded_factor, banded_solve, dense_to_banded

    lower = min(lower, n - 1)
    upper = min(upper, n - 1)
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n))
    for i in range(n):
        for j in range(max(0, i - lower), min(n, i + upper + 1)):
            A[i, j] = rng.standard_normal()
    A += np.eye(n) * (0.25 if (lower or upper) else 1.0)
    if abs(np.linalg.det(A)) < 1e-8:
        A += np.eye(n)
    b = rng.standard_normal(n)
    ab = dense_to_banded(jnp.asarray(A), lower, upper)
    x = banded_solve(banded_factor(ab, lower, upper), jnp.asarray(b), lower, upper)
    ref = np.linalg.solve(A, b)
    cond = np.linalg.cond(A)
    np.testing.assert_allclose(
        np.asarray(x), ref, rtol=1e-8 * max(1.0, cond), atol=1e-10 * max(1.0, cond)
    )


@given(
    save_steps=st.integers(8, 40),
    n_rows=st.integers(10, 200),
    seed=st.integers(0, 1000),
)
@settings(max_examples=25, deadline=None)
def test_recording_thinning_invariants(save_steps, n_rows, seed):
    """In-loop thinning (ops/_recording.py, single-instance layout): after
    recording n_rows accepted steps with strictly increasing times into a
    save_steps buffer, the finite rows are a sorted subsequence of the
    input times that always includes the FIRST row, never overflows within
    capacity save_steps * 2^MAX_THIN, and has n_saved matching the count."""
    from sunode_tpu.ops._recording import (
        MAX_THIN,
        init_saved_single,
        record_step_single,
    )

    from sunode_tpu.ops._recording import finalize_saved_single

    rng = np.random.default_rng(seed)
    ts = np.cumsum(0.1 + rng.random(n_rows + 1))
    W = 3  # 1 + 2n with n=1
    buf0 = jnp.full((save_steps, W), jnp.inf)
    row0 = jnp.asarray([ts[0], 1.0, -1.0])
    buf0 = buf0.at[:, 1:].set(0.0).at[0].set(row0)
    sv = init_saved_single(buf0, True)
    for t in ts[1:]:
        row = jnp.asarray([t, 1.0, -1.0])
        sv = record_step_single(sv, jnp.asarray(True), row, save_steps, True)
    assert n_rows + 1 <= save_steps * 2**MAX_THIN
    assert not bool(sv["overflow"])
    buf, ns_arr, _ = finalize_saved_single(sv, True)
    ns = int(ns_arr)
    times = np.asarray(buf[:, 0])
    finite = times[np.isfinite(times)]
    assert len(finite) == ns
    assert (np.diff(finite) > 0).all()
    assert finite[0] == ts[0]
    # the recording must END at the LAST accepted step (the rolling tail):
    # a strided recording that stops earlier would leave the start of the
    # backward adjoint solve interpolating a stale constant state
    assert finite[-1] == ts[-1]
    # every kept time is one of the recorded times
    assert np.isin(finite, ts).all()
