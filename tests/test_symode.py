import numpy as np
import pytest
import sympy as sy
import jax
import jax.numpy as jnp

from sunode_tpu.symode import SympyProblem, lambdify_jax, interpolate_spline
from sunode_tpu.symode.lambdify import logaddexp, expit, dexpit, CardinalBSpline
from sunode_tpu.problem import JaxProblem


def lotka_volterra(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


@pytest.fixture
def lv_problem():
    return SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lotka_volterra,
        derivative_params=[("alpha",), ("beta",)],
    )


LV_P = np.array([0.1, 0.2, 0.3, 0.4])  # alpha, beta, gamma, delta
LV_Y = np.array([1.0, 0.1])


def lv_rhs_np(t, y, p):
    a, b, g, d = p
    h, l = y
    return np.array([a * h - b * l * h, d * h * l - g * l])


def lv_jac_np(t, y, p):
    a, b, g, d = p
    h, l = y
    return np.array([[a - b * l, -b * h], [d * l, d * h - g]])


def test_rhs_values(lv_problem):
    rhs = lv_problem.make_rhs()
    got = rhs(0.0, jnp.array(LV_Y), jnp.array(LV_P))
    np.testing.assert_allclose(np.asarray(got), lv_rhs_np(0.0, LV_Y, LV_P), rtol=1e-14)


def test_jac_values(lv_problem):
    jac = lv_problem.make_jac_dense()
    got = jac(0.0, jnp.array(LV_Y), jnp.array(LV_P))
    np.testing.assert_allclose(np.asarray(got), lv_jac_np(0.0, LV_Y, LV_P), rtol=1e-14)


def test_adjoint_rhs_values(lv_problem):
    lam = np.array([0.5, -1.5])
    fn = lv_problem.make_adjoint_rhs()
    got = fn(0.0, jnp.array(LV_Y), jnp.array(lam), jnp.array(LV_P))
    expected = -lam @ lv_jac_np(0.0, LV_Y, LV_P)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-14)


def test_quad_rhs_values(lv_problem):
    lam = np.array([0.5, -1.5])
    fn = lv_problem.make_adjoint_quad_rhs()
    got = fn(0.0, jnp.array(LV_Y), jnp.array(lam), jnp.array(LV_P))
    # dfdp over (alpha, beta): df1/da = h, df1/db = -l h; df2 = 0
    h, l = LV_Y
    dfdp = np.array([[h, -l * h], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(got), lam @ dfdp, rtol=1e-14)


def test_sensitivity_rhs(lv_problem):
    S = np.arange(4.0).reshape(2, 2)  # (n_deriv, n_states)
    fn = lv_problem.make_sensitivity_rhs()
    got = fn(0.0, jnp.array(LV_Y), jnp.array(S), jnp.array(LV_P))
    J = lv_jac_np(0.0, LV_Y, LV_P)
    h, l = LV_Y
    dfdp = np.array([[h, -l * h], [0.0, 0.0]])
    expected = S @ J.T + dfdp.T
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-14)


def test_sensitivity_rhs_explicit_matches(lv_problem):
    S = np.arange(4.0).reshape(2, 2)
    f1 = lv_problem.make_sensitivity_rhs()
    f2 = lv_problem.make_sensitivity_rhs_explicit()
    a = f1(0.0, jnp.array(LV_Y), jnp.array(S), jnp.array(LV_P))
    b = f2(0.0, jnp.array(LV_Y), jnp.array(S), jnp.array(LV_P))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-13)


def test_jac_prod(lv_problem):
    v = np.array([1.0, 2.0])
    fn = lv_problem.make_rhs_jac_prod()
    got = fn(0.0, jnp.array(LV_Y), jnp.array(v), jnp.array(LV_P))
    np.testing.assert_allclose(
        np.asarray(got), lv_jac_np(0.0, LV_Y, LV_P) @ v, rtol=1e-14
    )


def test_rhs_is_jittable_and_gradable(lv_problem):
    rhs = lv_problem.make_rhs()
    f = jax.jit(rhs)
    np.testing.assert_allclose(
        np.asarray(f(0.0, jnp.array(LV_Y), jnp.array(LV_P))),
        lv_rhs_np(0.0, LV_Y, LV_P),
    )
    g = jax.grad(lambda y: rhs(0.0, y, jnp.array(LV_P)).sum())(jnp.array(LV_Y))
    assert np.isfinite(np.asarray(g)).all()


def test_vector_states_and_params():
    def rhs(t, y, p):
        return {"x": -p.k * y.x}

    prob = SympyProblem(
        params={"k": (3,)},
        states={"x": (3,)},
        rhs_sympy=rhs,
        derivative_params=[("k",)],
    )
    f = prob.make_rhs()
    y = jnp.array([1.0, 2.0, 3.0])
    k = jnp.array([0.5, 1.0, 1.5])
    np.testing.assert_allclose(np.asarray(f(0.0, y, k)), -np.asarray(k) * np.asarray(y))
    J = prob.make_jac_dense()(0.0, y, k)
    np.testing.assert_allclose(np.asarray(J), np.diag(-np.asarray(k)))


def test_nested_params_and_states():
    def rhs(t, y, p):
        return {
            "a": {"x": -p.rates.k * y.a.x + p.shift},
            "b": p.rates.k * y.a.x,
        }

    prob = SympyProblem(
        params={"rates": {"k": ()}, "shift": ()},
        states={"a": {"x": ()}, "b": ()},
        rhs_sympy=rhs,
        derivative_params=[("rates", "k")],
    )
    f = prob.make_rhs()
    out = f(0.0, jnp.array([2.0, 0.0]), jnp.array([1.5, 0.25]))
    np.testing.assert_allclose(np.asarray(out), [-3.0 + 0.25, 3.0])


def test_missing_state_rhs_raises():
    with pytest.raises(ValueError, match="No right-hand-side"):
        SympyProblem(
            params={"k": ()},
            states={"x": (), "y": ()},
            rhs_sympy=lambda t, y, p: {"x": -y.x},
            derivative_params=[],
        )


def test_extra_state_rhs_raises():
    with pytest.raises(ValueError, match="Unknown state"):
        SympyProblem(
            params={"k": ()},
            states={"x": ()},
            rhs_sympy=lambda t, y, p: {"x": -y.x, "zz": y.x},
            derivative_params=[],
        )


def test_wrong_shape_rhs_raises():
    with pytest.raises(ValueError, match="Invalid shape"):
        SympyProblem(
            params={},
            states={"x": (2,)},
            rhs_sympy=lambda t, y, p: {"x": np.array([y.x[0]], dtype=object)},
            derivative_params=[],
        )


def test_time_dependent_rhs():
    prob = SympyProblem(
        params={},
        states={"x": ()},
        rhs_sympy=lambda t, y, p: {"x": sy.sin(t) * y.x},
        derivative_params=[],
    )
    f = prob.make_rhs()
    got = f(1.3, jnp.array([2.0]), jnp.zeros(0))
    np.testing.assert_allclose(np.asarray(got), [np.sin(1.3) * 2.0], rtol=1e-14)


def test_coords_dict_rhs():
    coords = {"city": np.array(["lon", "par"])}
    prob = SympyProblem(
        params={"k": ()},
        states={"x": ("city",)},
        rhs_sympy=lambda t, y, p: {"x": {"lon": -p.k * y.x[0], "par": -p.k * y.x[1]}},
        derivative_params=[],
        coords=coords,
    )
    f = prob.make_rhs()
    got = f(0.0, jnp.array([1.0, 2.0]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(got), [-0.5, -1.0])


# ---------------------------------------------------------------------------
# lambdify specials
# ---------------------------------------------------------------------------
def test_lambdify_cse_preserved():
    a, b = sy.symbols("__y_0 __y_1", real=True)
    big = sy.exp(a + b)
    exprs = np.array([big + 1, big * 2, big * 3 + a], dtype=object)
    fn = lambdify_jax(["_y"], exprs, {"__y_0": "_y[0]", "__y_1": "_y[1]"})
    # CSE should have pulled exp(a+b) into a let-binding
    assert "_x0" in fn.__source__
    assert fn.__source__.count("jnp.exp") == 1
    out = fn(jnp.array([0.5, 0.25]))
    e = np.exp(0.75)
    np.testing.assert_allclose(np.asarray(out), [e + 1, 2 * e, 3 * e + 0.5], rtol=1e-14)


def test_logaddexp_lowering_and_derivative():
    x = sy.Symbol("__y_0", real=True)
    expr = logaddexp(x, 2 * x)
    d = sy.diff(expr, x)
    fn = lambdify_jax(["_y"], np.array([expr, d], dtype=object), {"__y_0": "_y[0]"})
    v, dv = np.asarray(fn(jnp.array([0.3])))
    np.testing.assert_allclose(v, np.logaddexp(0.3, 0.6), rtol=1e-14)
    eps = 1e-7
    num = (np.logaddexp(0.3 + eps, 0.6 + 2 * eps) - np.logaddexp(0.3 - eps, 0.6 - 2 * eps)) / (2 * eps)
    np.testing.assert_allclose(dv, num, rtol=1e-6)


def test_expit_dexpit():
    x = sy.Symbol("__y_0", real=True)
    fn = lambdify_jax(
        ["_y"],
        np.array([expit(x), dexpit(x), sy.diff(expit(x), x)], dtype=object),
        {"__y_0": "_y[0]"},
    )
    v, dv, dv2 = np.asarray(fn(jnp.array([0.7])))
    s = 1 / (1 + np.exp(-0.7))
    np.testing.assert_allclose(v, s, rtol=1e-14)
    np.testing.assert_allclose(dv, s * (1 - s), rtol=1e-14)
    np.testing.assert_allclose(dv2, s * (1 - s), rtol=1e-14)


def test_logsumexp_rewrite():
    a, b = sy.symbols("__y_0 __y_1", real=True)
    expr = sy.log(sy.exp(a) + sy.exp(b))
    fn = lambdify_jax(
        ["_y"], np.array([expr], dtype=object), {"__y_0": "_y[0]", "__y_1": "_y[1]"}
    )
    assert "logaddexp" in fn.__source__
    # stability: huge inputs should not overflow
    out = np.asarray(fn(jnp.array([800.0, 801.0])))
    np.testing.assert_allclose(out, [np.logaddexp(800.0, 801.0)])


def test_cardinal_bspline_partition_of_unity():
    x = sy.Symbol("__y_0", real=True)
    degree = 3
    # sum of shifted cardinal B-splines over enough shifts is 1 on the interior
    expr = sum(CardinalBSpline(degree, x - i) for i in range(-4, 5))
    fn = lambdify_jax(["_y"], np.array([expr], dtype=object), {"__y_0": "_y[0]"})
    for xv in [2.0, 2.5, 3.7]:
        np.testing.assert_allclose(np.asarray(fn(jnp.array([xv]))), [1.0], atol=1e-12)


def test_interpolate_spline_endpoints():
    x = sy.Symbol("__y_0", real=True)
    vals = [1.0, 2.0, 4.0, 3.0, 5.0]
    expr = interpolate_spline(x, vals, 0.0, 1.0, 1)  # linear spline
    fn = lambdify_jax(["_y"], np.array([expr], dtype=object), {"__y_0": "_y[0]"})
    # Degree-1 cardinal spline interpolates values at uniform sites
    for i, v in enumerate(vals):
        xv = i / (len(vals) - 1)
        np.testing.assert_allclose(np.asarray(fn(jnp.array([xv]))), [v], atol=1e-12)


# ---------------------------------------------------------------------------
# JaxProblem (direct-JAX authoring mode)
# ---------------------------------------------------------------------------
def test_jax_problem_matches_sympy(lv_problem):
    def lv_jax(t, y, p):
        return {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        }

    jp = JaxProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs=lv_jax,
        derivative_params=[("alpha",), ("beta",)],
    )
    y = jnp.array(LV_Y)
    p = jnp.array(LV_P)
    np.testing.assert_allclose(
        np.asarray(jp.make_rhs()(0.0, y, p)),
        np.asarray(lv_problem.make_rhs()(0.0, y, p)),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(jp.make_jac_dense()(0.0, y, p)),
        np.asarray(lv_problem.make_jac_dense()(0.0, y, p)),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(jp.make_adjoint_quad_rhs()(0.0, y, jnp.array([0.5, -1.5]), p)),
        np.asarray(
            lv_problem.make_adjoint_quad_rhs()(0.0, y, jnp.array([0.5, -1.5]), p)
        ),
        rtol=1e-13,
    )


def test_explog_opt_stabilizes_softmax():
    """Opt-in explog rewrite (reference lambdify.py:362-432 analog):
    sign-definite exp-sum quotients go through log space so softmax-style
    expressions cannot overflow."""
    import sympy.codegen.rewriting as rw

    from sunode_tpu.symode.lambdify import DEFAULT_OPTIMS, explog_opt, lambdify_jax

    c1, c2 = sy.symbols("c1 c2", real=True)
    e = sy.exp(c2) / (sy.exp(c1) + sy.exp(c2))
    opt = rw.optimize(e, DEFAULT_OPTIMS + (explog_opt,))
    assert "logaddexp" in str(opt)
    f = lambdify_jax(
        ["_a", "_b"], np.array(opt, dtype=object), {"c1": "_a", "c2": "_b"},
        optims=(),
    )
    out = float(f(jnp.asarray(1000.0), jnp.asarray(1001.0)))
    assert np.isclose(out, 1 / (1 + np.exp(-1.0)))
