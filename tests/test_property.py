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
