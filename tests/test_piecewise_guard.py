"""Safe-where guarding of Piecewise: domain-guarded pieces (log/sqrt/1/x on
a guarded domain) must not leak NaN into values or gradients, even though
jnp.where evaluates both branches (ADVICE round 1; the reference's numba
codegen takes real branches, ref lambdify.py:328-341)."""

import numpy as np
import jax
import jax.numpy as jnp
import sympy as sy

from sunode_tpu.symode import SympyProblem
from sunode_tpu.symode.lambdify import lambdify_jax


def test_guarded_log_sqrt_values_and_grads():
    x = sy.Symbol("x")
    expr = sy.Piecewise(
        (sy.log(x), x > 0), (sy.sqrt(-x), x < -1), (sy.Integer(0), True)
    )
    f = lambdify_jax(["_x"], np.array(expr, dtype=object), {"x": "_x"})
    g = jax.grad(lambda v: f(v))
    for v, fv, gv in [(2.0, np.log(2.0), 0.5), (-4.0, 2.0, -0.25), (-0.5, 0.0, 0.0)]:
        assert np.isclose(float(f(jnp.asarray(v))), fv)
        assert np.isclose(float(g(jnp.asarray(v))), gv)


def test_guarded_negative_power_default_piece():
    # singular op in the DEFAULT piece: guarded by ~(any earlier condition)
    x = sy.Symbol("x")
    expr = sy.Piecewise((sy.Integer(0), x <= 0), (1 / x, True))
    f = lambdify_jax(["_x"], np.array(expr, dtype=object), {"x": "_x"})
    g = jax.grad(lambda v: f(v))
    assert float(f(jnp.asarray(0.0))) == 0.0
    assert float(g(jnp.asarray(0.0))) == 0.0
    assert np.isclose(float(f(jnp.asarray(2.0))), 0.5)
    assert np.isclose(float(g(jnp.asarray(2.0))), -0.25)


def test_guarded_piecewise_inside_problem_gradient():
    """End-to-end: an RHS with a domain-guarded log keeps adjoint gradients
    finite when the state wanders through the guarded region."""
    prob = SympyProblem(
        params={"a": ()},
        states={"y": ()},
        rhs_sympy=lambda t, y, p: {
            # decays toward 0; log term only active while y > 1
            "y": -p.a * y.y + sy.Piecewise((sy.log(y.y), y.y > 1), (0, True))
        },
        derivative_params=[("a",)],
    )
    rhs = prob.make_rhs()
    val = rhs(0.0, jnp.asarray([0.5]), jnp.asarray([1.0]))
    assert np.isfinite(np.asarray(val)).all()
    jac = prob.make_jac_dense()
    J = jac(0.0, jnp.asarray([0.5]), jnp.asarray([1.0]))
    assert np.isfinite(np.asarray(J)).all()
    J2 = jac(0.0, jnp.asarray([2.0]), jnp.asarray([1.0]))
    assert np.isclose(float(J2[0, 0]), -1.0 + 0.5)
