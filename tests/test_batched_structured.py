"""Batch-native structured Newton (VERDICT r3 item 1).

The stiff large-state batched quadrant — batched chemistry / reaction-
diffusion chains where CVODES users reach for band/KLU
(/root/reference/sunode/linear_solver_wrapper.py:99-122, matrix.py:105-200)
— runs batch-native here: ``bdf_solve_batched`` factors B lockstep banded
LUs in one static column loop (O(B n w^2) instead of dense O(B n^3)), and
``make_batched_solve_fn``'s adjoint gets the transposed-bandwidth treatment
``AdjointSolver`` already had.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched
from sunode_tpu.problem import JaxProblem
from sunode_tpu.solver import Solver

N_CHAIN = 24  # reaction-diffusion chain length
B = 5


def _rd_problem(n=N_CHAIN):
    """Stiff Fisher-KPP reaction-diffusion chain: tridiagonal Jacobian."""

    def rhs(t, y, p):
        u = y.u
        lap = jnp.concatenate([u[1:2] - u[0:1], u[2:] - u[1:-1], u[-2:-1] - u[-1:]])
        lap2 = jnp.concatenate([jnp.zeros(1, u.dtype), u[:-2] - u[1:-1], jnp.zeros(1, u.dtype)])
        return {"u": p.D * (lap + lap2) + p.r * u * (1.0 - u)}

    return JaxProblem(
        params={"D": (), "r": ()},
        states={"u": (n,)},
        rhs=rhs,
        derivative_params=[("D",), ("r",)],
    )


def _rd_inputs(n=N_CHAIN, b=B, seed=0):
    rng = np.random.default_rng(seed)
    y0 = 0.5 + 0.3 * rng.random((b, n))
    # large D -> stiff (diffusion CFL ~1/(2D) << reaction time scale)
    params = np.stack(
        [50.0 * (1 + 0.2 * rng.random(b)), 1.0 + 0.1 * rng.random(b)], axis=1
    )
    tvals = np.linspace(0.05, 1.0, 6)
    return y0, params, tvals


def test_batched_band_matches_vmap_dense():
    prob = _rd_problem()
    rhs, jac_dense = prob.make_rhs(), prob.make_jac_dense()
    jac_band = prob.make_banded_jac(1, 1)
    y0, params, tvals = _rd_inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-10)
    opts_band = opts._replace(linear_solver="band", band_lower=1, band_upper=1)

    ref = jax.vmap(
        lambda y, p: bdf_solve(rhs, jac_dense, 0.0, y, p, jnp.asarray(tvals), opts).ys
    )(jnp.asarray(y0), jnp.asarray(params))

    res = bdf_solve_batched(
        rhs, jac_band, 0.0, jnp.asarray(y0), jnp.asarray(params),
        jnp.asarray(tvals), opts_band,
    )
    assert np.all(np.asarray(res.status) == 0)
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref), rtol=1e-5, atol=1e-8)
    # the structured path really factored (not a dense fallback artifact)
    assert np.all(np.asarray(res.stats["n_factorizations"]) > 0)


def test_batched_band_with_sensitivities():
    prob = _rd_problem()
    rhs = prob.make_rhs()
    jac_dense = prob.make_jac_dense()
    jac_band = prob.make_banded_jac(1, 1)
    sens_rhs = prob.make_sensitivity_rhs()
    y0, params, tvals = _rd_inputs(seed=1)
    k, n = prob.n_params, prob.n_states
    S0 = np.zeros((B, k, n))
    opts = BDFOptions(rtol=1e-7, atol=1e-9)
    opts_band = opts._replace(linear_solver="band", band_lower=1, band_upper=1)

    ref = bdf_solve_batched(
        rhs, jac_dense, 0.0, jnp.asarray(y0), jnp.asarray(params),
        jnp.asarray(tvals), opts, sens_rhs=sens_rhs, S0=jnp.asarray(S0),
    )
    res = bdf_solve_batched(
        rhs, jac_band, 0.0, jnp.asarray(y0), jnp.asarray(params),
        jnp.asarray(tvals), opts_band, sens_rhs=sens_rhs, S0=jnp.asarray(S0),
    )
    assert np.all(np.asarray(res.status) == 0)
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res.sens), np.asarray(ref.sens), rtol=1e-3, atol=1e-6
    )


def test_solver_class_batched_band_routes_batch_native():
    """Solver(linear_solver='band') with a batched y0 must use the
    batch-native core (not vmap) and agree with the dense batched solve."""
    prob = _rd_problem()
    y0, params, tvals = _rd_inputs(seed=2)
    p_dict = {"D": 55.0, "r": 1.05}

    s_band = Solver(
        prob, reltol=1e-8, abstol=1e-10, linear_solver="band",
        linear_solver_kwargs=dict(lower_bandwidth=1, upper_bandwidth=1),
    )
    s_band.set_params_dict(p_dict)
    out_band = s_band.solve(0.0, tvals, y0)
    # routing check: the compiled fn is the batch-native one (single jit key)
    assert (len(tvals), True) in s_band._jit_cache

    s_dense = Solver(prob, reltol=1e-8, abstol=1e-10, native_single=False)
    s_dense.set_params_dict(p_dict)
    out_dense = s_dense.solve(0.0, tvals, y0)
    np.testing.assert_allclose(out_band, out_dense, rtol=1e-5, atol=1e-8)


def _sir_problem(n_regions):
    def rhs(t, y, p):
        I_eff = y.I + p.mix * (jnp.roll(y.I, 1) + jnp.roll(y.I, -1))
        inf = p.beta * y.S * I_eff
        rec = p.gamma * y.I
        return {"S": -inf, "I": inf - rec, "R": rec}

    return JaxProblem(
        params={"beta": (), "gamma": (), "mix": ()},
        states={"S": (n_regions,), "I": (n_regions,), "R": (n_regions,)},
        rhs=rhs,
        derivative_params=[("beta",), ("gamma",)],
    )


def test_solver_class_batched_sparse_matches_dense():
    """KLU-analog sparse Newton at batch scale: scrambled-structure SIR
    chain, batched initial conditions."""
    n_regions = 8
    prob = _sir_problem(n_regions)
    rng = np.random.default_rng(3)
    y0 = np.stack(
        [
            np.concatenate(
                [
                    0.99 + 0.005 * rng.standard_normal(n_regions),
                    0.01 * np.abs(1 + 0.1 * rng.standard_normal(n_regions)),
                    np.zeros(n_regions),
                ]
            )
            for _ in range(4)
        ]
    )
    params = {"beta": 0.4, "gamma": 0.15, "mix": 0.05}
    tvals = np.linspace(5.0, 60.0, 6)

    s_sparse = Solver(prob, reltol=1e-8, abstol=1e-10, linear_solver="sparse")
    s_sparse.set_params_dict(params)
    out_sparse = s_sparse.solve(0.0, tvals, y0)
    assert (len(tvals), True) in s_sparse._jit_cache

    s_dense = Solver(prob, reltol=1e-8, abstol=1e-10, native_single=False)
    s_dense.set_params_dict(params)
    out_dense = s_dense.solve(0.0, tvals, y0)
    np.testing.assert_allclose(out_sparse, out_dense, rtol=1e-5, atol=1e-8)


def test_batched_adjoint_band_matches_dense_gradients():
    """make_batched_solve_fn(linear_solver='band'): forward banded Newton +
    backward banded Newton at the TRANSPOSED bandwidths must reproduce the
    dense batched adjoint gradients."""
    from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

    prob = _rd_problem(16)
    y0, params, tvals = _rd_inputs(n=16, b=3, seed=4)
    p_sub = jnp.asarray(params)
    p_fix = jnp.zeros((0,))
    opts = BDFOptions(rtol=1e-8, atol=1e-10)

    grads = {}
    for ls, kw in (
        ("dense", {}),
        ("band", dict(linear_solver_kwargs=dict(lower_bandwidth=1, upper_bandwidth=1))),
    ):
        solve = make_batched_solve_fn(
            prob, derivatives="adjoint", options=opts, checkpoint_n=4096,
            linear_solver=ls, **kw,
        )

        def loss(ps):
            ys = solve(0.0, jnp.asarray(y0), ps, p_fix, jnp.asarray(tvals))
            return jnp.sum(ys**2)

        grads[ls] = np.asarray(jax.grad(loss)(p_sub))
    assert np.all(np.isfinite(grads["band"]))
    np.testing.assert_allclose(grads["band"], grads["dense"], rtol=1e-4, atol=1e-8)


def test_batched_adjoint_sparse_matches_dense_gradients():
    from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

    prob = _sir_problem(6)
    rng = np.random.default_rng(5)
    b = 3
    y0 = np.stack(
        [
            np.concatenate(
                [
                    0.99 + 0.005 * rng.standard_normal(6),
                    0.01 * np.abs(1 + 0.1 * rng.standard_normal(6)),
                    np.zeros(6),
                ]
            )
            for _ in range(b)
        ]
    )
    p_sub = jnp.asarray(
        np.stack([0.4 + 0.02 * rng.random(b), 0.15 + 0.01 * rng.random(b)], axis=1)
    )
    p_fix = jnp.asarray([0.05])
    tvals = np.linspace(5.0, 40.0, 5)
    opts = BDFOptions(rtol=1e-8, atol=1e-10)

    grads = {}
    for ls in ("dense", "sparse"):
        solve = make_batched_solve_fn(
            prob, derivatives="adjoint", options=opts, checkpoint_n=4096,
            linear_solver=ls,
        )

        def loss(ps):
            ys = solve(0.0, jnp.asarray(y0), ps, p_fix, jnp.asarray(tvals))
            return jnp.sum(ys**2)

        grads[ls] = np.asarray(jax.grad(loss)(p_sub))
    assert np.all(np.isfinite(grads["sparse"]))
    np.testing.assert_allclose(grads["sparse"], grads["dense"], rtol=1e-4, atol=1e-8)


def test_batched_spgmr_matches_vmap():
    """Matrix-free GMRES Newton runs batch-native (lockstep SoA Arnoldi/
    Givens over a (maxl+1, maxl, B) Hessenberg — ops/krylov.py
    gmres_solve_batched), closing the last structurally-vmap quadrant for
    large-state batched stiff work (VERDICT r4 item 7)."""
    prob = _rd_problem(24)
    rhs, jac = prob.make_rhs(), prob.make_jac_dense()
    y0, params, tvals = _rd_inputs(24, 4)
    opts = BDFOptions(rtol=1e-8, atol=1e-10, linear_solver="spgmr")
    res = jax.jit(
        lambda y, p: bdf_solve_batched(
            rhs, jac, 0.0, y, p, jnp.asarray(tvals), opts
        )
    )(jnp.asarray(y0), jnp.asarray(params))
    assert np.all(np.asarray(res.status) == 0)
    ys_v = jax.jit(
        jax.vmap(
            lambda y, p: bdf_solve(
                rhs, jac, 0.0, y, p, jnp.asarray(tvals), opts
            ).ys
        )
    )(jnp.asarray(y0), jnp.asarray(params))
    np.testing.assert_allclose(
        np.asarray(res.ys), np.asarray(ys_v), rtol=1e-6, atol=1e-8
    )


def test_solver_class_batched_spgmr_routes_batch_native():
    s = Solver(
        _rd_problem(16), abstol=1e-10, reltol=1e-8, linear_solver="spgmr"
    )
    y0, params, tvals = _rd_inputs(16, 3)
    s.set_params_dict({"D": 50.0, "r": 1.0})
    s._params = np.ascontiguousarray(params)
    ys = s.solve(0.0, tvals, y0)
    st = s.last_stats
    assert "n_attempts" in st  # shared attempt counter = batch-native core
    assert np.all(np.isfinite(ys))


def test_batched_solve_fn_band_requires_bdf():
    from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

    with pytest.raises(ValueError, match="requires method='BDF'"):
        make_batched_solve_fn(
            _rd_problem(8), method="ADAMS", linear_solver="band",
            linear_solver_kwargs=dict(lower_bandwidth=1, upper_bandwidth=1),
        )
