"""method='ADAMS' through the batched adjoint wrapper."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions
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


TVALS = jnp.linspace(1.0, 8.0, 6)
P_FIX = jnp.array([1.0, 0.4])
B = 6


def _inputs():
    rng = np.random.default_rng(7)
    y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))))
    psub = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))))
    return y0s, psub


def test_adams_adjoint_grads_match_bdf(lv_problem):
    y0s, psub = _inputs()
    opts = BDFOptions(rtol=1e-9, atol=1e-9)
    aopts = BDFOptions(rtol=1e-9, atol=1e-9)
    s_adams = make_batched_solve_fn(
        lv_problem, derivatives="adjoint", options=opts, adjoint_options=aopts,
        method="ADAMS",
    )
    s_bdf = make_batched_solve_fn(
        lv_problem, derivatives="adjoint", options=opts, adjoint_options=aopts,
        method="BDF",
    )

    def loss(solve, y0s, psub):
        return jnp.sum(solve(0.0, y0s, psub, P_FIX, TVALS) ** 2)

    ga = jax.jit(jax.grad(lambda y, p: loss(s_adams, y, p), argnums=(0, 1)))(y0s, psub)
    gb = jax.jit(jax.grad(lambda y, p: loss(s_bdf, y, p), argnums=(0, 1)))(y0s, psub)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), rtol=5e-4, atol=1e-7)


def test_adams_primal_matches_bdf(lv_problem):
    y0s, psub = _inputs()
    opts = BDFOptions(rtol=1e-10, atol=1e-10)
    sa = make_batched_solve_fn(lv_problem, derivatives=None, options=opts, method="ADAMS")
    sb = make_batched_solve_fn(lv_problem, derivatives=None, options=opts, method="BDF")
    ya = jax.jit(lambda y, p: sa(0.0, y, p, P_FIX, TVALS))(y0s, psub)
    yb = jax.jit(lambda y, p: sb(0.0, y, p, P_FIX, TVALS))(y0s, psub)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-8)
