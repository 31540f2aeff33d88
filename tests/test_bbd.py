"""Bordered-block-diagonal Schur Newton (ops/bbd.py): the KLU analog for
dense-row/arrowhead patterns where RCM bandwidth is O(n).

The reference covers these patterns with SuiteSparse KLU's dynamic fill-in
(/root/reference/sunode/linear_solver_wrapper.py:99-122); under jit the
same patterns are solved by pulling the few dense rows/columns into a
static border: banded LU on the interior + a k x k dense Schur complement
(SparsePlan(border='auto') -> BDFOptions.sparse_border).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bbd import (
    bbd_factor,
    bbd_form_newton,
    bbd_solve,
    dense_to_packed,
    packed_to_dense,
)
from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched
from sunode_tpu.ops.sparsity import SparsePlan, make_colored_banded_jac
from sunode_tpu.problem import JaxProblem
from sunode_tpu.solver import Solver

N_CHAIN = 20


def _hub_problem(n=N_CHAIN):
    """Tridiagonal chain + one hub state coupled to EVERY node: the
    Jacobian is an arrowhead (dense last row and column), the exact
    pattern class where bandwidth-only orderings degrade to O(n^3)."""

    def rhs(t, y, p):
        u = y.u
        lap = jnp.concatenate(
            [u[1:2] - u[0:1], u[2:] - u[1:-1], u[-2:-1] - u[-1:]]
        )
        lap2 = jnp.concatenate(
            [jnp.zeros(1, u.dtype), u[:-2] - u[1:-1], jnp.zeros(1, u.dtype)]
        )
        du = p.D * (lap + lap2) - u * (u - 1.0) + p.c * y.h
        dh = -p.a * y.h + p.b * jnp.mean(u)
        return {"u": du, "h": dh}

    return JaxProblem(
        params={"D": (), "a": (), "b": (), "c": ()},
        states={"u": (n,), "h": ()},
        rhs=rhs,
        derivative_params=[("D",), ("b",)],
    )


def _arrowhead_pattern(n):
    pat = np.zeros((n, n), bool)
    for i in range(n - 1):
        pat[i, i] = True
        if i > 0:
            pat[i, i - 1] = True
        if i < n - 2:
            pat[i, i + 1] = True
    pat[n - 1, :] = True
    pat[:, n - 1] = True
    return pat


def test_plan_selects_border_on_arrowhead():
    n = 32
    plan = SparsePlan(_arrowhead_pattern(n))
    assert plan.k_border >= 1, plan.density_summary()
    # interior is genuinely banded once the hub is bordered
    assert plan.lower + plan.upper <= 4, (plan.lower, plan.upper)
    # without the border the RCM bandwidth is O(n)
    plan0 = SparsePlan(_arrowhead_pattern(n), border=0)
    assert plan0.k_border == 0
    assert plan0.lower + plan0.upper >= n // 2


def test_plan_keeps_banded_patterns_unbordered():
    # tridiagonal: a border can never beat the w=2 banded cost model
    n = 24
    pat = np.zeros((n, n), bool)
    idx = np.arange(n)
    pat[idx, idx] = True
    pat[idx[:-1], idx[1:]] = True
    pat[idx[1:], idx[:-1]] = True
    plan = SparsePlan(pat)
    assert plan.k_border == 0
    assert plan.lower + plan.upper <= 2


def test_bbd_factor_solve_matches_dense():
    n = 24
    rng = np.random.default_rng(0)
    pat = _arrowhead_pattern(n)
    plan = SparsePlan(pat)
    assert plan.k_border >= 1
    A = np.where(pat, rng.standard_normal((n, n)), 0.0)
    c = 0.37
    M_dense = np.eye(n) - c * A
    r = rng.standard_normal(n)

    J_packed = dense_to_packed(jnp.asarray(A), plan)
    M_packed = bbd_form_newton(
        J_packed, c, plan.lower, plan.upper, plan.k_border
    )
    # layout roundtrip: packed M == permuted dense M
    Mp = np.asarray(
        packed_to_dense(M_packed, plan.lower, plan.upper, plan.k_border)
    )
    np.testing.assert_allclose(
        Mp, M_dense[plan.perm][:, plan.perm], atol=1e-14
    )
    factors = bbd_factor(M_packed, plan.lower, plan.upper, plan.k_border)
    z = bbd_solve(
        factors, jnp.asarray(r[plan.perm]), plan.lower, plan.upper,
        plan.k_border,
    )
    x = np.asarray(z)[plan.inv_perm]
    np.testing.assert_allclose(x, np.linalg.solve(M_dense, r), rtol=1e-10)


def test_bbd_singular_poisons_with_nan():
    n = 12
    pat = _arrowhead_pattern(n)
    plan = SparsePlan(pat)
    # A = (1/c) I makes M = I - cA exactly singular
    c = 0.5
    A = np.eye(n) / c
    J_packed = dense_to_packed(jnp.asarray(A), plan)
    M_packed = bbd_form_newton(
        J_packed, c, plan.lower, plan.upper, plan.k_border
    )
    factors = bbd_factor(M_packed, plan.lower, plan.upper, plan.k_border)
    z = bbd_solve(
        factors, jnp.ones(n), plan.lower, plan.upper, plan.k_border
    )
    assert bool(factors[-1])
    assert np.all(np.isnan(np.asarray(z)))


def test_colored_packed_jac_matches_autodiff():
    prob = _hub_problem(16)
    rhs = prob.make_rhs()
    plan = SparsePlan(prob.jac_sparsity())
    assert plan.k_border >= 1
    jb = make_colored_banded_jac(rhs, plan)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.uniform(0.2, 0.9, prob.n_states))
    p = jnp.asarray([8.0, 1.0, 2.0, 0.5])
    packed = jb(0.0, y, p)
    J = jax.jacfwd(lambda yy: rhs(0.0, yy, p))(y)
    Jp = np.asarray(J)[plan.perm][:, plan.perm]
    np.testing.assert_allclose(
        np.asarray(packed_to_dense(packed, plan.lower, plan.upper, plan.k_border)),
        Jp,
        atol=1e-12,
    )


def _hub_inputs(n=N_CHAIN, b=4, seed=2):
    rng = np.random.default_rng(seed)
    y0 = np.concatenate(
        [0.4 + 0.3 * rng.random((b, n)), 0.1 * rng.random((b, 1))], axis=1
    )
    # stiff: fast diffusion + fast hub relaxation vs slow reaction
    params = np.stack(
        [
            40.0 * (1 + 0.2 * rng.random(b)),  # D
            30.0 * (1 + 0.1 * rng.random(b)),  # a
            2.0 + 0.2 * rng.random(b),  # b
            0.5 + 0.1 * rng.random(b),  # c
        ],
        axis=1,
    )
    tvals = np.linspace(0.05, 1.0, 6)
    return y0, params, tvals


def test_single_bdf_sparse_bbd_matches_dense():
    prob = _hub_problem()
    rhs, jac_dense = prob.make_rhs(), prob.make_jac_dense()
    plan = SparsePlan(prob.jac_sparsity())
    assert plan.k_border >= 1
    jac_packed = make_colored_banded_jac(rhs, plan)
    y0, params, tvals = _hub_inputs(b=1)
    opts = BDFOptions(rtol=1e-8, atol=1e-10)
    opts_bbd = opts._replace(
        linear_solver="sparse",
        band_lower=plan.lower,
        band_upper=plan.upper,
        sparse_perm=plan.perm,
        sparse_border=plan.k_border,
    )
    ref = bdf_solve(
        rhs, jac_dense, 0.0, jnp.asarray(y0[0]), jnp.asarray(params[0]),
        jnp.asarray(tvals), opts,
    )
    res = bdf_solve(
        rhs, jac_packed, 0.0, jnp.asarray(y0[0]), jnp.asarray(params[0]),
        jnp.asarray(tvals), opts_bbd,
    )
    assert int(res.status) == 0
    np.testing.assert_allclose(
        np.asarray(res.ys), np.asarray(ref.ys), rtol=1e-5, atol=1e-8
    )
    assert int(res.stats["n_factorizations"]) > 0


def test_batched_sparse_bbd_matches_vmap_dense():
    prob = _hub_problem()
    rhs, jac_dense = prob.make_rhs(), prob.make_jac_dense()
    plan = SparsePlan(prob.jac_sparsity())
    jac_packed = make_colored_banded_jac(rhs, plan)
    y0, params, tvals = _hub_inputs()
    opts = BDFOptions(rtol=1e-8, atol=1e-10)
    opts_bbd = opts._replace(
        linear_solver="sparse",
        band_lower=plan.lower,
        band_upper=plan.upper,
        sparse_perm=plan.perm,
        sparse_border=plan.k_border,
    )
    ref = jax.vmap(
        lambda y, p: bdf_solve(
            rhs, jac_dense, 0.0, y, p, jnp.asarray(tvals), opts
        ).ys
    )(jnp.asarray(y0), jnp.asarray(params))
    res = bdf_solve_batched(
        rhs, jac_packed, 0.0, jnp.asarray(y0), jnp.asarray(params),
        jnp.asarray(tvals), opts_bbd,
    )
    assert np.all(np.asarray(res.status) == 0)
    np.testing.assert_allclose(
        np.asarray(res.ys), np.asarray(ref), rtol=1e-5, atol=1e-8
    )
    assert np.all(np.asarray(res.stats["n_factorizations"]) > 0)


def test_solver_class_batched_sparse_bbd():
    """Solver(linear_solver='sparse') on the hub problem: the auto plan
    picks a border, routes batch-native, and matches the dense solve."""
    prob = _hub_problem(16)
    y0, _, tvals = _hub_inputs(16, b=3, seed=3)
    p_dict = {"D": 40.0, "a": 30.0, "b": 2.0, "c": 0.5}

    s_sparse = Solver(prob, reltol=1e-8, abstol=1e-10, linear_solver="sparse")
    assert s_sparse._sparse_plan.k_border >= 1
    s_sparse.set_params_dict(p_dict)
    out_sparse = s_sparse.solve(0.0, tvals, y0)
    assert (len(tvals), True) in s_sparse._jit_cache

    s_dense = Solver(prob, reltol=1e-8, abstol=1e-10, native_single=False)
    s_dense.set_params_dict(p_dict)
    out_dense = s_dense.solve(0.0, tvals, y0)
    np.testing.assert_allclose(out_sparse, out_dense, rtol=1e-5, atol=1e-8)


def test_batched_adjoint_sparse_bbd_gradients():
    """Adjoint with BBD Newton in BOTH directions (backward border from the
    TRANSPOSED pattern) matches the dense batched adjoint gradients."""
    from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

    prob = _hub_problem(12)
    y0, params, tvals = _hub_inputs(12, b=3, seed=4)
    p_sub = jnp.asarray(params[:, [0, 2]])  # (D, b)
    p_fix = jnp.asarray(params[0, [1, 3]])  # (a, c) shared
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
    np.testing.assert_allclose(
        grads["sparse"], grads["dense"], rtol=1e-4, atol=1e-8
    )


def test_make_solve_fn_sparse_bbd_adjoint_matches_dense():
    """Single-instance functional surface: make_solve_fn(linear_solver=
    'sparse') routes the hub problem through BBD Newton in both adjoint
    directions and reproduces the dense gradients."""
    from sunode_tpu.wrappers.as_jax import make_solve_fn

    prob = _hub_problem(12)
    y0, params, tvals = _hub_inputs(12, b=1, seed=5)
    p_sub = jnp.asarray(params[0, [0, 2]])  # (D, b)
    p_fix = jnp.asarray(params[0, [1, 3]])  # (a, c)
    opts = BDFOptions(rtol=1e-8, atol=1e-10)

    grads = {}
    for ls in ("dense", "sparse"):
        solve = make_solve_fn(
            prob, derivatives="adjoint", options=opts, linear_solver=ls
        )

        def loss(ps):
            ys = solve(0.0, jnp.asarray(y0[0]), ps, p_fix, jnp.asarray(tvals))
            return jnp.sum(ys**2)

        grads[ls] = np.asarray(jax.grad(loss)(p_sub))
    assert np.all(np.isfinite(grads["sparse"]))
    np.testing.assert_allclose(
        grads["sparse"], grads["dense"], rtol=1e-4, atol=1e-8
    )


def test_event_fn_sparse_bbd_matches_dense():
    """make_event_fn(linear_solver='sparse'): the primal localization AND
    the differentiable re-solve run structured Newton; event time, state
    and gradients match the dense-Jacobian event machinery."""
    from sunode_tpu.events import make_event_fn

    prob = _hub_problem(12)
    y0, params, _ = _hub_inputs(12, b=1, seed=6)

    # event: hub state crosses a threshold from below
    def roots(t, y, p):
        return [y.h - 0.05]

    opts = BDFOptions(rtol=1e-10, atol=1e-12)
    p_sub = jnp.asarray(params[0, [0, 2]])
    p_fix = jnp.asarray(params[0, [1, 3]])
    y0f = jnp.asarray(y0[0]).at[-1].set(0.0)

    outs = {}
    for ls in ("dense", "sparse"):
        event = make_event_fn(
            prob, roots, options=opts, derivatives="forward",
            linear_solver=ls,
        )

        def t_of(ps):
            return event(0.0, y0f, ps, p_fix, 2.0)[0]

        t_ev = t_of(p_sub)
        g = jax.grad(t_of)(p_sub)
        outs[ls] = (float(t_ev), np.asarray(g))
    t_d, g_d = outs["dense"]
    t_s, g_s = outs["sparse"]
    assert np.isfinite(t_s) and t_s < 2.0
    np.testing.assert_allclose(t_s, t_d, rtol=1e-8)
    np.testing.assert_allclose(g_s, g_d, rtol=1e-5, atol=1e-10)
