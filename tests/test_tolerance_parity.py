"""Tolerance parity: all four scalar/vector atol x rtol combinations, and
quadrature blocks under ADAMS (VERDICT r4 item 9).

The reference accepts every (scalar|vector atol) x (scalar|vector rtol)
combination (/root/reference/sunode/solver.py:394-417; note its VV/VS
branches call CVodeVVtolerances/CVodeVStolerances which its own cdef
headers never declare — only SS/SV exist in 16_cvodes.h:170-171 — so the
vector-rtol path could never actually run there).  Here the per-component
WRMS weight atol_i + rtol_i*|y_i| makes vector rtol native to every core.

CVODES quadrature integration is LMM-independent (16_cvodes.h:246-267);
adams_solve now carries quad blocks like bdf_solve.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.adams import adams_solve
from sunode_tpu.ops.adams_batched import adams_solve_batched
from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched
from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem


def _rhs(t, y, p):
    # two decoupled decays with very different magnitudes: vector
    # tolerances matter when one component is ~1e6 times the other
    return jnp.array([-y[0], -0.5 * y[1]])


def _jac(t, y, p):
    return jnp.diag(jnp.array([-1.0, -0.5]))


Y0 = jnp.array([1.0, 1e6])
TV = jnp.linspace(0.5, 4.0, 6)
P = jnp.zeros(1)


def _exact(t):
    return np.stack([np.exp(-t), 1e6 * np.exp(-0.5 * t)], axis=-1)


@pytest.mark.parametrize("core", ["bdf", "adams", "bdf_batched", "adams_batched"])
@pytest.mark.parametrize(
    "rtol, atol",
    [
        (1e-8, 1e-10),                                   # SS
        (1e-8, np.array([1e-10, 1e-4])),                 # SV
        (np.array([1e-8, 1e-6]), 1e-10),                 # VS
        (np.array([1e-8, 1e-6]), np.array([1e-10, 1e-4])),  # VV
    ],
    ids=["SS", "SV", "VS", "VV"],
)
def test_four_tolerance_combinations(core, rtol, atol):
    opts = BDFOptions(rtol=rtol, atol=atol)
    if core == "bdf":
        res = jax.jit(lambda y: bdf_solve(_rhs, _jac, 0.0, y, P, TV, opts))(Y0)
        ys, status = res.ys, res.status
    elif core == "adams":
        res = jax.jit(lambda y: adams_solve(_rhs, 0.0, y, P, TV, opts))(Y0)
        ys, status = res.ys, res.status
    elif core == "bdf_batched":
        res = jax.jit(
            lambda y: bdf_solve_batched(_rhs, _jac, 0.0, y, P[None], TV, opts)
        )(Y0[None])
        ys, status = res.ys[0], res.status[0]
    else:
        res = jax.jit(
            lambda y: adams_solve_batched(_rhs, 0.0, y, P[None], TV, opts)
        )(Y0[None])
        ys, status = res.ys[0], res.status[0]
    assert int(np.asarray(status)) == 0
    exact = _exact(np.asarray(TV))
    # each component meets ITS requested relative accuracy (with the usual
    # integrator safety slack)
    err = np.abs(np.asarray(ys) - exact) / np.abs(exact)
    rtol_v = np.broadcast_to(np.asarray(rtol), (2,))
    assert np.all(err < 100 * rtol_v[None, :] + 1e-9), err.max(axis=0)


def test_vector_rtol_loosens_where_requested():
    # component 1 with rtol 1e-3 needs far fewer steps than with 1e-10 —
    # proof the vector actually reaches the error test, not just validation
    tight = BDFOptions(rtol=1e-10, atol=1e-12)
    mixed = BDFOptions(rtol=np.array([1e-10, 1e-3]), atol=1e-12)
    # decouple so the loose component dominates the step count when tight
    def rhs(t, y, p):
        return jnp.array([-y[0], jnp.cos(40.0 * t)])

    def jac(t, y, p):
        return jnp.zeros((2, 2)).at[0, 0].set(-1.0)

    y0 = jnp.array([1.0, 0.0])
    r_tight = bdf_solve(rhs, jac, 0.0, y0, P, TV, tight)
    r_mixed = bdf_solve(rhs, jac, 0.0, y0, P, TV, mixed)
    assert int(r_mixed.stats["n_steps"]) < int(r_tight.stats["n_steps"]) * 0.7
    # the tight component stays tight
    exact0 = np.exp(-np.asarray(TV))
    assert np.max(np.abs(np.asarray(r_mixed.ys)[:, 0] - exact0)) < 1e-7


def test_solver_class_accepts_vector_rtol():
    prob = SympyProblem(
        params={"k": ()},
        states={"a": (), "b": ()},
        rhs_sympy=lambda t, y, p: {"a": -p.k * y.a, "b": -0.5 * p.k * y.b},
        derivative_params=[("k",)],
    )
    s = Solver(prob, abstol=1e-10, reltol=np.array([1e-8, 1e-6]))
    s.set_params_dict({"k": 1.0})
    assert not s._native_eligible()  # vector rtol is a JAX-core feature
    tv = np.linspace(0.5, 3.0, 5)
    ys = s.solve(0.0, tv, {"a": 1.0, "b": 1e6})
    exact = np.stack([np.exp(-tv), 1e6 * np.exp(-0.5 * tv)], axis=-1)
    assert np.max(np.abs(ys - exact) / np.abs(exact)) < 1e-5


def test_adams_quadrature_block():
    # q' = y with y = e^{-t}: q(t) = 1 - e^{-t} (CVodeQuadInit under
    # CV_ADAMS; quadrature is LMM-independent, 16_cvodes.h:246-267)
    def rhs(t, y, p):
        return -y

    res = jax.jit(
        lambda y: adams_solve(
            rhs, 0.0, y, P, TV,
            BDFOptions(rtol=1e-10, atol=1e-12, quad_err_con=True),
            quad_rhs=lambda t, y, p: y,
            quad0=jnp.zeros(1),
        )
    )(jnp.array([1.0]))
    assert int(res.status) == 0
    expected = 1.0 - np.exp(-np.asarray(TV))
    np.testing.assert_allclose(np.asarray(res.quad[:, 0]), expected, rtol=1e-7)


def test_adams_quadrature_time_dependent_with_vector_rtol():
    def rhs(t, y, p):
        return -y

    res = adams_solve(
        rhs, 0.0, jnp.array([1.0]), P, TV,
        BDFOptions(rtol=np.array([1e-9]), atol=1e-12, quad_err_con=True),
        quad_rhs=lambda t, y, p: jnp.array([t * t]),
        quad0=jnp.zeros(1),
    )
    assert int(res.status) == 0
    np.testing.assert_allclose(
        np.asarray(res.quad[:, 0]), np.asarray(TV) ** 3 / 3, rtol=1e-6
    )


def test_adams_quad_rejects_save_steps():
    with pytest.raises(ValueError, match="save_steps"):
        adams_solve(
            _rhs, 0.0, Y0, P, TV, BDFOptions(save_steps=64),
            quad_rhs=lambda t, y, p: y, quad0=jnp.zeros(2),
        )


def test_seminorm_adjoint_vector_rtol_matches_tight():
    """Seminorm adjoint error control (Kidger et al., arXiv:2009.09457),
    expressed through vector rtol: loosening the M/W blocks of the
    transition backward to 1e-3 while y stays tight must leave the
    gradient within tight-solve accuracy (the chip sweep in
    docs/performance.md 'seminorm' section measured +7.5% throughput at
    unchanged error; this gates the correctness half on CPU)."""
    from sunode_tpu.wrappers.as_jax import make_batched_solve_fn
    from sunode_tpu.symode import SympyProblem

    problem = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lambda t, y, p: {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        },
        derivative_params=[("alpha",), ("beta",)],
    )
    n = 2
    tvals = jnp.linspace(1.0, 8.0, 9)
    y0 = jnp.asarray(np.tile([10.0, 2.0], (3, 1)))
    psub = jnp.asarray(np.tile([1.0, 0.3], (3, 1)) * np.array([[1.0], [1.02], [0.98]]))
    p_fix = jnp.array([1.0, 0.4])

    def grad_of(adj_opts):
        solve = make_batched_solve_fn(
            problem,
            derivatives="adjoint",
            options=BDFOptions(rtol=1e-8, atol=1e-8, adams_max_order=6),
            adjoint_options=adj_opts,
            checkpoint_n=256,
            method="ADAMS",
            adjoint_interpolation="transition",
        )
        return jax.grad(
            lambda q: jnp.sum(solve(0.0, y0, q, p_fix, tvals) ** 2)
        )(psub)

    g_tight = np.asarray(grad_of(BDFOptions(rtol=1e-9, atol=1e-9, adams_max_order=6)))
    rv = np.concatenate([np.full(n, 1e-7), np.full(n * n, 1e-3)])
    g_semi = np.asarray(
        grad_of(
            BDFOptions(
                rtol=rv, atol=1e-7, adams_max_order=6,
                quad_rtol=1e-3, quad_atol=1e-3,
            )
        )
    )
    assert np.all(np.isfinite(g_semi))
    np.testing.assert_allclose(g_semi, g_tight, rtol=2e-4, atol=1e-6)
