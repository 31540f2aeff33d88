"""band / spgmr linear-solver kinds (reference test_solve.py:157-181)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.krylov import gmres_solve
from sunode_tpu.problem import JaxProblem
from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem


def test_gmres_exact_small():
    rng = np.random.default_rng(0)
    A = np.eye(4) + 0.3 * rng.standard_normal((4, 4))
    b = rng.standard_normal(4)
    x = gmres_solve(lambda v: jnp.array(A) @ v, jnp.array(b), maxl=4)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-8)


def test_gmres_zero_rhs():
    x = gmres_solve(lambda v: 2 * v, jnp.zeros(3), maxl=3)
    np.testing.assert_allclose(np.asarray(x), 0.0)


def _heat_problem(n=24):
    """Method-of-lines heat equation: stiff, tridiagonal Jacobian."""

    def rhs(t, y, p):
        k = p.k
        left = jnp.concatenate([y.u[1:], jnp.zeros(1)])
        right = jnp.concatenate([jnp.zeros(1), y.u[:-1]])
        return {"u": k * (left - 2 * y.u + right)}

    return JaxProblem(
        params={"k": ()}, states={"u": (n,)}, rhs=rhs, derivative_params=["k"]
    )


@pytest.fixture(scope="module")
def heat():
    return _heat_problem()


def _heat_ref(n, k, tvals, y0):
    def np_rhs(t, y):
        out = np.empty_like(y)
        out[0] = k * (y[1] - 2 * y[0])
        out[-1] = k * (y[-2] - 2 * y[-1])
        out[1:-1] = k * (y[2:] - 2 * y[1:-1] + y[:-2])
        return out

    return solve_ivp(
        np_rhs, (0, tvals[-1]), y0, t_eval=tvals, method="BDF",
        rtol=1e-10, atol=1e-12,
    ).y.T


def test_band_matches_dense(heat):
    n = 24
    y0 = np.sin(np.pi * np.arange(n) / (n - 1)) + 0.5
    tvals = np.array([0.05, 0.2, 0.5])
    k = 100.0  # stiff

    dense = Solver(heat, abstol=1e-10, reltol=1e-8)
    band = Solver(
        heat,
        abstol=1e-10,
        reltol=1e-8,
        linear_solver="band",
        linear_solver_kwargs=dict(lower_bandwidth=1, upper_bandwidth=1),
    )
    for s in (dense, band):
        s.set_params_dict({"k": k})
    out_d = dense.solve(0.0, tvals, y0)
    out_b = band.solve(0.0, tvals, y0)
    np.testing.assert_allclose(out_b, out_d, rtol=1e-6, atol=1e-9)
    ref = _heat_ref(n, k, tvals, y0)
    err = np.abs(out_b - ref).max()
    assert err < 1e-5


def test_band_requires_bandwidths(heat):
    with pytest.raises(ValueError, match="bandwidth"):
        Solver(heat, linear_solver="band")


def test_spgmr_on_stiff_heat(heat):
    n = 24
    y0 = np.sin(np.pi * np.arange(n) / (n - 1)) + 0.5
    tvals = np.array([0.05, 0.2, 0.5])
    k = 100.0
    spg = Solver(heat, abstol=1e-10, reltol=1e-8, linear_solver="spgmr")
    spg.set_params_dict({"k": k})
    out = spg.solve(0.0, tvals, y0)
    ref = _heat_ref(n, k, tvals, y0)
    assert np.abs(out - ref).max() < 1e-5


def test_spgmr_finitediff(heat):
    n = 24
    y0 = np.sin(np.pi * np.arange(n) / (n - 1)) + 0.5
    tvals = np.array([0.05, 0.2])
    spg = Solver(
        heat, abstol=1e-10, reltol=1e-8, linear_solver="spgmr_finitediff"
    )
    spg.set_params_dict({"k": 100.0})
    out = spg.solve(0.0, tvals, y0)
    dense = Solver(heat, abstol=1e-10, reltol=1e-8)
    dense.set_params_dict({"k": 100.0})
    out_d = dense.solve(0.0, tvals, y0)
    np.testing.assert_allclose(out, out_d, rtol=1e-5, atol=1e-8)


def test_banded_jac_values(heat):
    jac_b = heat.make_banded_jac_dense(1, 1)
    jac_d = heat.make_jac_dense()
    y = jnp.linspace(0.5, 1.5, 24)
    p = jnp.array([3.0])
    np.testing.assert_allclose(
        np.asarray(jac_b(0.0, y, p)), np.asarray(jac_d(0.0, y, p)), rtol=1e-12
    )


def test_banded_storage_jac_values(heat):
    """make_banded_jac returns (l+u+1, n) banded storage matching the dense
    Jacobian (input format of ops/banded.banded_factor)."""
    from sunode_tpu.ops.banded import banded_to_dense

    jac_ab = heat.make_banded_jac(1, 1)
    jac_d = heat.make_jac_dense()
    y = jnp.linspace(0.5, 1.5, 24)
    p = jnp.array([3.0])
    ab = jac_ab(0.0, y, p)
    assert ab.shape == (3, 24)
    np.testing.assert_allclose(
        np.asarray(banded_to_dense(ab, 1, 1)),
        np.asarray(jac_d(0.0, y, p)),
        rtol=1e-12,
    )


def test_band_large_n_accuracy():
    """True banded Newton solve at n = 768 (the 3R scale of the SIR-256
    config): O(n*w^2) per factorization where dense would be O(n^3)."""
    n = 768
    prob = _heat_problem(n)
    y0 = np.sin(np.pi * np.arange(n) / (n - 1)) + 0.5
    tvals = np.array([0.02, 0.1])
    k = float(n * n) / 100.0  # grid-refined diffusion: stiff
    band = Solver(
        prob,
        abstol=1e-10,
        reltol=1e-8,
        linear_solver="band",
        linear_solver_kwargs=dict(lower_bandwidth=1, upper_bandwidth=1),
    )
    band.set_params_dict({"k": k})
    out = band.solve(0.0, tvals, y0)
    ref = _heat_ref(n, k, tvals, y0)
    assert np.abs(out - ref).max() < 1e-5


def test_band_batched_vmap(heat):
    n = 24
    B = 3
    y0 = np.stack(
        [np.sin(np.pi * np.arange(n) / (n - 1)) + 0.5 + 0.1 * b for b in range(B)]
    )
    tvals = np.array([0.05, 0.2])
    band = Solver(
        heat,
        abstol=1e-10,
        reltol=1e-8,
        linear_solver="band",
        linear_solver_kwargs=dict(lower_bandwidth=1, upper_bandwidth=1),
    )
    band.set_params_dict({"k": 100.0})
    out = band.solve(0.0, tvals, y0)
    for b in range(B):
        ref = _heat_ref(n, 100.0, tvals, y0[b])
        assert np.abs(np.asarray(out)[b] - ref).max() < 1e-5


def test_spgmr_sir_block_structure():
    """Demonstrated matrix-free configuration for the 3Rx3R SIR system
    (BASELINE config 5 family): the block layout (S|I|R compartments) is NOT
    banded — couplings sit at distance R — so the structured choice is
    spgmr, which needs no matrix at all (VERDICT round 1, item 6)."""
    R = 256

    def rhs(t, y, p):
        I_eff = y.I + p.mix * (jnp.roll(y.I, 1) + jnp.roll(y.I, -1))
        inf = p.beta * y.S * I_eff
        rec = p.gamma * y.I
        return {"S": -inf, "I": inf - rec, "R": rec}

    prob = JaxProblem(
        params={"beta": (), "gamma": (), "mix": ()},
        states={"S": (R,), "I": (R,), "R": (R,)},
        rhs=rhs,
        derivative_params=[("beta",)],
    )
    rng = np.random.default_rng(1)
    S0 = 0.99 + 0.005 * rng.standard_normal(R)
    I0 = 0.01 * np.abs(1 + 0.1 * rng.standard_normal(R))
    y0 = np.concatenate([S0, I0, np.zeros(R)])
    tvals = np.array([10.0, 30.0, 60.0])
    params = {"beta": 0.4, "gamma": 0.15, "mix": 0.05}

    spg = Solver(prob, abstol=1e-10, reltol=1e-8, linear_solver="spgmr")
    spg.set_params_dict(params)
    out_s = spg.solve(0.0, tvals, y0)

    adams = Solver(prob, abstol=1e-10, reltol=1e-8, solver="ADAMS")
    adams.set_params_dict(params)
    out_a = adams.solve(0.0, tvals, y0)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_a), rtol=1e-5, atol=1e-8)
