"""linear_solver='sparse' — the KLU analog (VERDICT r2 item 2).

Reference: the user hands a sparsity pattern to KLU
(/root/reference/sunode/matrix.py:105-200, linear_solver_wrapper.py:99-122).
Here the pattern comes from the symbolic Jacobian (exact) or probe points
(JaxProblem), feeds a reverse-Cuthill-McKee permutation + greedy column
coloring, and the Newton solve runs colored-jvp banded LU: cost scales with
the permuted bandwidth (nnz structure), not n^2/n^3.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.ops.sparsity import (
    SparsePlan,
    bandwidths,
    color_columns,
    csc_pattern,
    make_colored_banded_jac,
    min_degree_order,
    rcm_permutation,
)
from sunode_tpu.problem import JaxProblem
from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem


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


def test_coloring_is_structurally_orthogonal():
    rng = np.random.default_rng(0)
    pat = rng.random((40, 40)) < 0.08
    np.fill_diagonal(pat, True)
    colors = color_columns(pat)
    for c in range(colors.max() + 1):
        cols = np.flatnonzero(colors == c)
        assert (pat[:, cols].sum(axis=1) <= 1).all()


def test_rcm_recovers_scrambled_band():
    n = 50
    pat = np.zeros((n, n), bool)
    for i in range(n):
        for d in (-2, -1, 0, 1, 2):
            if 0 <= i + d < n:
                pat[i, i + d] = True
    rp = np.random.default_rng(1).permutation(n)
    scrambled = pat[rp][:, rp]
    assert sum(bandwidths(scrambled)) > n // 2
    perm = rcm_permutation(scrambled)
    l, u = bandwidths(scrambled[perm][:, perm])
    assert l + u <= 6  # near-pentadiagonal recovered


def test_csc_pattern_roundtrip():
    rng = np.random.default_rng(7)
    pat = rng.random((30, 30)) < 0.1
    np.fill_diagonal(pat, True)
    indptr, indices = csc_pattern(pat)
    assert indptr.dtype == np.int64 and indices.dtype == np.int64
    assert indptr[-1] == pat.sum()
    back = np.zeros_like(pat)
    for j in range(30):
        back[indices[indptr[j]:indptr[j + 1]], j] = True
    np.testing.assert_array_equal(back, pat)


def _elimination_fill(pattern, order):
    """Fill-in count of a symmetric elimination order (clique model)."""
    adj = pattern | pattern.T
    np.fill_diagonal(adj, False)
    adj = adj.copy()
    n = adj.shape[0]
    alive = np.ones(n, bool)
    fill = 0
    for v in order:
        alive[v] = False
        nb = np.flatnonzero(adj[v] & alive)
        for a in nb:
            for b in nb:
                if a < b and not adj[a, b]:
                    fill += 1
                    adj[a, b] = adj[b, a] = True
    return fill


def test_min_degree_beats_natural_on_arrowhead():
    """The fill-reducing role AMD plays in KLU: on an arrowhead pattern
    (full first row/column) natural order fills the WHOLE matrix while
    minimum degree is fill-free."""
    n = 30
    pat = np.zeros((n, n), bool)
    pat[0, :] = pat[:, 0] = True
    np.fill_diagonal(pat, True)
    order = min_degree_order(pat)
    assert sorted(order.tolist()) == list(range(n))  # a permutation
    assert _elimination_fill(pat, order) == 0
    natural = _elimination_fill(pat, np.arange(n))
    assert natural == (n - 1) * (n - 2) // 2  # fully dense fill


def test_min_degree_on_banded_pattern_stays_low_fill():
    n = 40
    pat = np.zeros((n, n), bool)
    for i in range(n):
        for d in (-1, 0, 1):
            if 0 <= i + d < n:
                pat[i, i + d] = True
    order = min_degree_order(pat)
    assert sorted(order.tolist()) == list(range(n))
    assert _elimination_fill(pat, order) <= n  # tridiagonal: ~no fill


def test_sympy_exact_sparsity():
    """SympyProblem.jac_sparsity is the exact symbolic pattern."""
    prob = SympyProblem(
        params={"k": ()},
        states={"a": (), "b": (), "c": ()},
        rhs_sympy=lambda t, y, p: {
            "a": -p.k * y.a,
            "b": p.k * y.a - y.b,
            "c": y.b,
        },
        derivative_params=[("k",)],
    )
    pat = prob.jac_sparsity()
    expected = np.array(
        [[True, False, False], [True, True, False], [False, True, False]]
    )
    assert (pat == expected).all()


def test_jaxproblem_probe_sparsity_matches_autodiff():
    prob = _sir_problem(8)
    pat = prob.jac_sparsity()
    jac = prob.make_jac_dense()
    y = jnp.asarray(np.random.default_rng(2).uniform(0.1, 1.0, prob.n_states))
    p = jnp.asarray([0.4, 0.15, 0.05])
    J = np.asarray(jac(0.0, y, p))
    assert (pat | (J == 0)).all()  # every true nonzero is in the pattern


def test_sparse_solver_matches_dense_sir():
    """SIR-chain: sparse Newton path reproduces the dense solve, with
    bandwidth (hence Newton cost) independent of problem layout."""
    n_regions = 16
    prob = _sir_problem(n_regions)
    n = prob.n_states  # 48

    rng = np.random.default_rng(3)
    y0 = np.concatenate(
        [
            0.99 + 0.005 * rng.standard_normal(n_regions),
            0.01 * np.abs(1 + 0.1 * rng.standard_normal(n_regions)),
            np.zeros(n_regions),
        ]
    )
    params = {"beta": 0.4, "gamma": 0.15, "mix": 0.05}
    tvals = np.linspace(5.0, 60.0, 6)

    dense = Solver(prob, reltol=1e-8, abstol=1e-10, native_single=False)
    dense.set_params_dict(params)
    out_dense = dense.solve(0.0, tvals, y0)

    sparse = Solver(prob, reltol=1e-8, abstol=1e-10, linear_solver="sparse")
    sparse.set_params_dict(params)
    plan = sparse._sparse_plan
    # the RCM-permuted SIR-chain bandwidth is O(1) (measured (10, 10) for
    # every region count), not O(n):
    assert plan.lower + plan.upper + 1 <= 24, (plan.lower, plan.upper, n)
    # Jacobian construction needs ~chromatic-number jvp sweeps, not n
    assert plan.n_colors <= 8, plan.n_colors
    out_sparse = sparse.solve(0.0, tvals, y0)
    np.testing.assert_allclose(out_sparse, out_dense, rtol=1e-6, atol=1e-10)


def test_sparse_bandwidth_scales_with_structure_not_n():
    """VERDICT done-criterion: Newton cost scales with nnz structure.  The
    permuted bandwidth (and color count) stay CONSTANT as the region count
    grows, so banded-LU cost is O(n w^2) = O(n), vs dense O(n^3)."""
    widths, colors = [], []
    for n_regions in (8, 32, 64):
        # border=0 pins the plain RCM plan: this test is about RCM finding
        # the local structure.  border='auto' may legitimately peel the
        # all-to-all I-coupling at small n (cost-model win, tests/test_bbd.py).
        plan = SparsePlan(_sir_problem(n_regions).jac_sparsity(), border=0)
        widths.append(plan.lower + plan.upper + 1)
        colors.append(plan.n_colors)
    assert widths[0] == widths[1] == widths[2], widths
    assert max(colors) <= 8, colors


def test_colored_banded_jac_equals_autodiff():
    prob = _sir_problem(12)
    rhs = prob.make_rhs()
    # border=0: plain-banded layout (the bordered packed layout has its own
    # gate, tests/test_bbd.py::test_colored_packed_jac_matches_autodiff)
    plan = SparsePlan(prob.jac_sparsity(), border=0)
    jb = make_colored_banded_jac(rhs, plan)
    from sunode_tpu.ops.banded import banded_to_dense

    y = jnp.asarray(np.random.default_rng(4).uniform(0.1, 1.0, prob.n_states))
    p = jnp.asarray([0.4, 0.15, 0.05])
    ab = jb(0.0, y, p)
    J = jax.jacfwd(lambda yy: rhs(0.0, yy, p))(y)
    Jp = np.asarray(J)[plan.perm][:, plan.perm]
    np.testing.assert_allclose(
        np.asarray(banded_to_dense(ab, plan.lower, plan.upper)), Jp, atol=1e-12
    )


def test_adjoint_solver_sparse_matches_dense():
    """AdjointSolver(linear_solver='sparse') — structure-exploiting Newton
    solves in BOTH directions (forward J, backward -J^T with the transposed
    pattern) — must reproduce the dense adjoint gradients."""
    from sunode_tpu.solver import AdjointSolver

    n_regions = 8
    prob = _sir_problem(n_regions)
    rng = np.random.default_rng(5)
    y0 = np.concatenate(
        [
            0.99 + 0.005 * rng.standard_normal(n_regions),
            0.01 * np.abs(1 + 0.1 * rng.standard_normal(n_regions)),
            np.zeros(n_regions),
        ]
    )
    params = {"beta": 0.4, "gamma": 0.15, "mix": 0.05}
    tvals = np.linspace(5.0, 40.0, 5)
    grads = np.ones((len(tvals), prob.n_states))

    out = {}
    for ls in ("dense", "sparse"):
        s = AdjointSolver(
            prob, abstol=1e-8, reltol=1e-8, checkpoint_n=4096, linear_solver=ls
        )
        s.set_params_dict(params)
        y_out, grad_out, lamda_out = s.make_output_buffers(tvals)
        s.solve_forward(0.0, tvals, y0, y_out)
        s.solve_backward(tvals[-1], 0.0, tvals, grads, grad_out, lamda_out)
        out[ls] = (grad_out.copy(), lamda_out.copy())
    np.testing.assert_allclose(out["sparse"][0], out["dense"][0], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(out["sparse"][1], out["dense"][1], rtol=1e-4, atol=1e-8)
