import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from sunode_tpu.ops import bdf as bdf_mod
from sunode_tpu.ops.bdf import BDFOptions, bdf_solve, STATUS


# ---------------------------------------------------------------------------
# unit tests of the numerical kernels
# ---------------------------------------------------------------------------
def _differences(ts, poly):
    """Backward differences of poly sampled at ts[0] > ts[1] > ... (t_n first)."""
    vals = [np.atleast_1d(poly(t)) for t in ts]
    D = [vals[0]]
    rows = vals
    for k in range(1, len(ts)):
        rows = [rows[i] - rows[i + 1] for i in range(len(rows) - 1)]
        D.append(rows[0])
    return np.array(D)


def test_rescale_D_polynomial_exactness():
    # D for a cubic at spacing h must transform to D at spacing r*h exactly
    q = 3
    h, r = 0.1, 0.37
    t_n = 1.0
    poly = lambda t: np.array([t**3 - 2 * t + 1.0])
    ts_old = [t_n - i * h for i in range(q + 1)]
    ts_new = [t_n - i * (r * h) for i in range(q + 1)]
    D_old = _differences(ts_old, poly)
    D_new_expected = _differences(ts_new, poly)
    D_full = jnp.zeros((bdf_mod.KD, 1), jnp.float64).at[: q + 1].set(jnp.array(D_old))
    D_out = bdf_mod._rescale_D(D_full, q, r)
    np.testing.assert_allclose(
        np.asarray(D_out[: q + 1]), D_new_expected, rtol=1e-10, atol=1e-12
    )


def test_interpolate_polynomial_exactness():
    q = 4
    h = 0.2
    t_n = 2.0
    poly = lambda t: np.array([0.5 * t**4 - t**2 + 3.0])
    ts = [t_n - i * h for i in range(q + 1)]
    D = _differences(ts, poly)
    D_full = jnp.zeros((bdf_mod.KD, 1), jnp.float64).at[: q + 1].set(jnp.array(D))
    for te in [t_n, t_n - 0.5 * h, t_n - 1.7 * h, t_n - 3.2 * h]:
        got = bdf_mod._interpolate(D_full, q, t_n, h, te)
        np.testing.assert_allclose(np.asarray(got), poly(te), rtol=1e-12)


def test_update_D_consistency():
    # after an accepted step, D must equal true backward differences of the
    # extended sequence
    q = 2
    h = 0.1
    t_n = 1.0
    poly = lambda t: np.array([np.sin(t)])
    # old D at t_{n-1}:
    ts_old = [t_n - h - i * h for i in range(q + 2)]
    D_old = _differences(ts_old, poly)
    D_full = jnp.zeros((bdf_mod.KD, 1), jnp.float64).at[: q + 2].set(jnp.array(D_old))
    y_pred = np.sum(np.asarray(D_full[: q + 1]), axis=0)
    d = poly(t_n) - y_pred
    D_new = bdf_mod._update_D(D_full, q, jnp.array(d))
    ts_new = [t_n - i * h for i in range(q + 3)]
    D_expected = _differences(ts_new, poly)
    np.testing.assert_allclose(
        np.asarray(D_new[: q + 3]), D_expected, rtol=1e-9, atol=1e-12
    )


# ---------------------------------------------------------------------------
# integration golden tests vs scipy
# ---------------------------------------------------------------------------
def lv_rhs(t, y, p):
    a, b, g, d = p[0], p[1], p[2], p[3]
    return jnp.array([a * y[0] - b * y[0] * y[1], d * y[0] * y[1] - g * y[1]])


def lv_jac(t, y, p):
    return jax.jacfwd(lv_rhs, argnums=1)(t, y, p)


LV_P = jnp.array([1.0, 0.3, 1.0, 0.4])
LV_Y0 = jnp.array([10.0, 2.0])


def scipy_reference(rhs_np, y0, p, tvals, rtol, atol, t0=0.0):
    sol = solve_ivp(
        lambda t, y: rhs_np(t, y, p),
        (t0, tvals[-1]),
        y0,
        t_eval=tvals,
        method="LSODA",
        rtol=rtol * 1e-3,
        atol=atol * 1e-3,
    )
    assert sol.success
    return sol.y.T


def lv_rhs_np(t, y, p):
    a, b, g, d = p
    return np.array([a * y[0] - b * y[0] * y[1], d * y[0] * y[1] - g * y[1]])


@pytest.mark.parametrize("rtol", [1e-6, 1e-8, 1e-10])
def test_lotka_volterra_accuracy(rtol):
    """Tolerance-matched: our global error must be within 3x of what scipy's
    production BDF achieves at the same tolerance on the same problem."""
    tvals = np.linspace(0.1, 10.0, 25)
    opts = BDFOptions(rtol=rtol, atol=rtol)
    res = bdf_solve(lv_rhs, lv_jac, 0.0, LV_Y0, LV_P, jnp.array(tvals), opts)
    assert int(res.status) == STATUS["SUCCESS"]
    ref = scipy_reference(lv_rhs_np, np.asarray(LV_Y0), np.asarray(LV_P), tvals, rtol, rtol)
    err = np.abs(np.asarray(res.ys) - ref) / (np.abs(ref) + 1e-8)

    sol_bdf = solve_ivp(
        lambda t, y: lv_rhs_np(t, y, np.asarray(LV_P)),
        (0, tvals[-1]),
        np.asarray(LV_Y0),
        t_eval=tvals,
        method="BDF",
        rtol=rtol,
        atol=rtol,
    )
    err_scipy = np.abs(sol_bdf.y.T - ref) / (np.abs(ref) + 1e-8)
    assert err.max() < 3 * max(err_scipy.max(), rtol), (
        f"ours {err.max():.3e} vs scipy BDF {err_scipy.max():.3e} at rtol {rtol}"
    )


def test_exponential_decay_exact():
    rhs = lambda t, y, p: -p[0] * y
    jac = lambda t, y, p: jnp.array([[-p[0]]])
    tvals = jnp.linspace(0.5, 5.0, 10)
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.array([1.3]),
        tvals, BDFOptions(rtol=1e-10, atol=1e-12),
    )
    assert int(res.status) == 0
    expected = np.exp(-1.3 * np.asarray(tvals))
    np.testing.assert_allclose(np.asarray(res.ys[:, 0]), expected, rtol=1e-8)


def test_robertson_stiff():
    """The classic stiff kinetics benchmark (BASELINE.json config 3)."""

    def rob_rhs(t, y, p):
        k1, k2, k3 = p[0], p[1], p[2]
        r1 = k1 * y[0]
        r2 = k2 * y[1] * y[1]
        r3 = k3 * y[1] * y[2]
        return jnp.array([-r1 + r3, r1 - r2 - r3, r2])

    def rob_jac(t, y, p):
        return jax.jacfwd(rob_rhs, argnums=1)(t, y, p)

    p = jnp.array([0.04, 3e7, 1e4])
    y0 = jnp.array([1.0, 0.0, 0.0])
    tvals = jnp.array([4.0 * 10.0**k for k in range(-1, 6)])  # 0.4 ... 4e5
    opts = BDFOptions(rtol=1e-8, atol=jnp.array([1e-10, 1e-12, 1e-10]))
    res = bdf_solve(rob_rhs, rob_jac, 0.0, y0, p, tvals, opts)
    assert int(res.status) == 0

    def rob_np(t, y, p):
        k1, k2, k3 = p
        r1 = k1 * y[0]
        r2 = k2 * y[1] ** 2
        r3 = k3 * y[1] * y[2]
        return np.array([-r1 + r3, r1 - r2 - r3, r2])

    sol = solve_ivp(
        lambda t, y: rob_np(t, y, [0.04, 3e7, 1e4]),
        (0, 4e5),
        [1.0, 0.0, 0.0],
        t_eval=np.asarray(tvals),
        method="BDF",
        rtol=1e-11,
        atol=[1e-13, 1e-15, 1e-13],
        jac=lambda t, y: np.asarray(rob_jac(t, jnp.array(y), p)),
    )
    assert sol.success
    ref = sol.y.T
    err = np.abs(np.asarray(res.ys) - ref) / (np.abs(ref) + 1e-12)
    assert err.max() < 1e-4, f"robertson max rel err {err.max():.3e}"
    # conservation: y0+y1+y2 == 1
    np.testing.assert_allclose(np.asarray(res.ys).sum(1), 1.0, rtol=1e-7)


def test_van_der_pol_stiff():
    mu = 1000.0

    def vdp_rhs(t, y, p):
        return jnp.array([y[1], p[0] * ((1 - y[0] ** 2) * y[1]) - y[0]])

    def vdp_jac(t, y, p):
        return jax.jacfwd(vdp_rhs, argnums=1)(t, y, p)

    tvals = jnp.array([500.0, 1000.0, 1500.0, 2000.0])
    res = bdf_solve(
        vdp_rhs, vdp_jac, 0.0, jnp.array([2.0, 0.0]), jnp.array([mu]),
        tvals, BDFOptions(rtol=1e-8, atol=1e-10),
    )
    assert int(res.status) == 0
    sol = solve_ivp(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (0, 2000.0),
        [2.0, 0.0],
        t_eval=np.asarray(tvals),
        method="BDF",
        rtol=1e-10,
        atol=1e-12,
    )
    assert sol.success
    err = np.abs(np.asarray(res.ys) - sol.y.T) / (np.abs(sol.y.T) + 1e-3)
    assert err.max() < 1e-4, f"vdp max rel err {err.max():.3e}"


def test_tval_at_t0():
    rhs = lambda t, y, p: -y
    jac = lambda t, y, p: -jnp.eye(1)
    tvals = jnp.array([0.0, 1.0, 2.0])
    res = bdf_solve(rhs, jac, 0.0, jnp.array([3.0]), jnp.zeros(0), tvals, BDFOptions())
    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys[:, 0]), 3.0 * np.exp(-np.asarray(tvals)), rtol=1e-6)


def test_failure_nan_poisoning():
    # blow-up ODE: y' = y^2, y(0)=1 diverges at t=1; solving past it must
    # fail gracefully with NaN outputs and a nonzero status
    rhs = lambda t, y, p: y * y
    jac = lambda t, y, p: (2 * y)[None, :]
    tvals = jnp.array([0.5, 0.9, 2.0])
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.zeros(0), tvals,
        BDFOptions(rtol=1e-8, atol=1e-8, max_steps=3000),
    )
    assert int(res.status) != 0
    ys = np.asarray(res.ys)
    # points before the singularity fine, after it NaN
    np.testing.assert_allclose(ys[0, 0], 1 / (1 - 0.5), rtol=1e-6)
    assert np.isnan(ys[2, 0])


def test_max_steps_exceeded():
    rhs = lambda t, y, p: -y
    jac = lambda t, y, p: -jnp.eye(1)
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.zeros(0), jnp.array([1e6]),
        BDFOptions(max_steps=5),
    )
    assert int(res.status) == STATUS["MAX_STEPS"]


def test_constraints_positive():
    # y' = -y with y>=0 constraint should integrate fine
    rhs = lambda t, y, p: -y
    jac = lambda t, y, p: -jnp.eye(1)
    res = bdf_solve(
        rhs, jac, 0.0, jnp.array([1.0]), jnp.zeros(0), jnp.array([1.0, 5.0]),
        BDFOptions(constraints=jnp.array([1.0])),
    )
    assert int(res.status) == 0
    assert (np.asarray(res.ys) >= 0).all()


def test_stats_populated():
    res = bdf_solve(lv_rhs, lv_jac, 0.0, LV_Y0, LV_P, jnp.linspace(0.1, 10, 5), BDFOptions())
    s = res.stats
    assert int(s["n_steps"]) > 10
    assert int(s["n_rhs_evals"]) >= int(s["n_steps"])
    assert int(s["n_jac_evals"]) >= 1
    assert 1 <= int(s["final_order"]) <= 5


def test_save_steps_trajectory():
    res = bdf_solve(
        lv_rhs, lv_jac, 0.0, LV_Y0, LV_P, jnp.linspace(0.1, 10, 5),
        BDFOptions(save_steps=2048),
    )
    assert res.saved is not None
    ns = int(res.saved["n_saved"])
    assert 10 < ns < 2048
    ts = np.asarray(res.saved["t"][:ns])
    assert (np.diff(ts) > 0).all()
    # saved f must equal rhs at saved points
    k = ns // 2
    f_expected = np.asarray(lv_rhs(res.saved["t"][k], res.saved["y"][k], LV_P))
    np.testing.assert_allclose(np.asarray(res.saved["f"][k]), f_expected, rtol=1e-12)


def test_jit_and_vmap():
    tvals = jnp.linspace(0.1, 10, 8)

    @jax.jit
    def solve_one(y0, p):
        return bdf_solve(lv_rhs, lv_jac, 0.0, y0, p, tvals, BDFOptions(rtol=1e-8, atol=1e-8))

    r1 = solve_one(LV_Y0, LV_P)
    assert int(r1.status) == 0

    batch = 16
    y0s = jnp.tile(LV_Y0, (batch, 1)) * jnp.linspace(0.8, 1.2, batch)[:, None]
    ps = jnp.tile(LV_P, (batch, 1))
    rb = jax.jit(jax.vmap(solve_one))(y0s, ps)
    assert (np.asarray(rb.status) == 0).all()
    # middle element consistent with solo solve
    r_mid = solve_one(y0s[7], ps[7])
    np.testing.assert_allclose(np.asarray(rb.ys[7]), np.asarray(r_mid.ys), rtol=1e-6, atol=1e-10)


def test_first_step_option():
    res = bdf_solve(
        lv_rhs, lv_jac, 0.0, LV_Y0, LV_P, jnp.linspace(0.1, 10, 5),
        BDFOptions(first_step=1e-4),
    )
    assert int(res.status) == 0
