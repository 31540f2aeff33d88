"""Regression tests for code-review findings."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn


def lv_sympy(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


@pytest.fixture(scope="module")
def lv_problem():
    return SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lv_sympy,
        derivative_params=[("alpha",), ("beta",)],
    )


def test_duplicate_observation_times_adjoint(lv_problem):
    """Repeated tvals (two data points at the same time) must not collapse
    the fused backward pass."""
    tvals = jnp.asarray([1.0, 3.0, 3.0, 5.0, 8.0])  # duplicate at t=3
    solve = make_batched_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-8, atol=1e-8),
        adjoint_options=BDFOptions(rtol=1e-8, atol=1e-8),
        method="ADAMS",
    )
    y0 = jnp.asarray([[10.0, 2.0]])
    psub = jnp.asarray([[1.0, 0.3]])
    p_fix = jnp.asarray([1.0, 0.4])

    def loss(psub):
        return jnp.sum(solve(0.0, y0, psub, p_fix, tvals) ** 2)

    g = jax.jit(jax.grad(loss))(psub)
    assert np.isfinite(np.asarray(g)).all()

    # cross-check against distinct-times gradient with doubled weight at t=3
    tvals2 = jnp.asarray([1.0, 3.0, 5.0, 8.0])
    solve2 = make_batched_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-8, atol=1e-8),
        adjoint_options=BDFOptions(rtol=1e-8, atol=1e-8),
        method="ADAMS",
    )

    def loss2(psub):
        ys = solve2(0.0, y0, psub, p_fix, tvals2)
        w = jnp.asarray([1.0, 2.0, 1.0, 1.0])[None, :, None]
        return jnp.sum(w * ys**2)

    g2 = jax.jit(jax.grad(loss2))(psub)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-5)


def test_exactly_full_checkpoint_buffer_not_overflow():
    """A forward pass that fills the buffer exactly must not be flagged."""
    rhs = lambda t, y, p: -y
    jac = lambda t, y, p: -jnp.eye(1)
    # count the steps first
    probe = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.zeros(0), jnp.array([2.0]),
        BDFOptions(rtol=1e-8, atol=1e-10, save_steps=512),
    )
    ns = int(probe.saved["n_saved"])
    # rerun with a buffer of exactly that size (legacy clamp semantics;
    # thinning never overflows — tests/test_checkpoint_thinning.py)
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.zeros(0), jnp.array([2.0]),
        BDFOptions(
            rtol=1e-8, atol=1e-10, save_steps=ns, checkpoint_thinning=False
        ),
    )
    assert int(res.saved["n_saved"]) == ns
    assert not bool(res.saved["overflow"])
    # one smaller must overflow
    res2 = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.zeros(0), jnp.array([2.0]),
        BDFOptions(
            rtol=1e-8, atol=1e-10, save_steps=ns - 1, checkpoint_thinning=False
        ),
    )
    assert bool(res2.saved["overflow"])


def test_solver_rejects_conflicting_kwargs(lv_problem):
    with pytest.raises(ValueError, match="inside options"):
        Solver(lv_problem, reltol=1e-6, options=BDFOptions(max_order=3))
    # options alone is fine
    Solver(lv_problem, options=BDFOptions(rtol=1e-6, atol=1e-8))


def test_adams_low_order_cap_respected():
    from sunode_tpu.ops.adams import adams_solve

    rhs = lambda t, y, p: -p[0] * y
    tvals = jnp.linspace(0.5, 5.0, 6)
    res = adams_solve(
        rhs, 0.0, jnp.array([1.0]), jnp.array([1.0]), tvals,
        BDFOptions(rtol=1e-8, atol=1e-10, adams_max_order=2),
    )
    assert int(res.status) == 0
    assert int(res.stats["final_order"]) <= 2
