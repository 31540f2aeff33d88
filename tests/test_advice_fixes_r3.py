"""Regression tests for the round-3 advisor/judge findings (ADVICE.md r2):

1. checkpoint thinning must be loud: the thinning level is surfaced in solve
   stats and ``AdjointSolver`` warns when it is > 0 (ADVICE medium).
2. batched thinning records a lane's rolling tail at a record event the lane
   happened to reject, so desynchronized lanes keep ~2^shift spacing
   (ADVICE low, _recording.py:74).
3. the transition adjoint flags ill-conditioned fundamental-matrix solves
   (status 97 -> NaN) instead of returning degraded gradients with status 0
   (ADVICE low, adjoint.py:329).
4. a singular banded factorization poisons its solves with NaN so the Newton
   isfinite check rejects deterministically (ADVICE low, banded.py:108).
"""

import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched
from sunode_tpu.symode import SympyProblem


@pytest.fixture(scope="module")
def lv_problem():
    return SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lambda t, y, p: {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        },
        derivative_params=[("alpha",), ("beta",)],
    )


TVALS = jnp.linspace(1.0, 12.0, 5)
Y0 = jnp.asarray([10.0, 2.0])
P = jnp.asarray([1.0, 0.3, 1.0, 0.4])


def test_thinning_level_in_stats_single(lv_problem):
    rhs, jac = lv_problem.make_rhs(), lv_problem.make_jac_dense()
    res_big = bdf_solve(
        rhs, jac, 0.0, Y0, P, TVALS,
        BDFOptions(rtol=1e-8, atol=1e-8, save_steps=4096),
    )
    assert int(res_big.stats["checkpoint_thinning_levels"]) == 0
    n_steps = int(res_big.stats["n_steps"])
    res_small = bdf_solve(
        rhs, jac, 0.0, Y0, P, TVALS,
        BDFOptions(rtol=1e-8, atol=1e-8, save_steps=max(8, n_steps // 4)),
    )
    assert int(res_small.status) == 0
    assert int(res_small.stats["checkpoint_thinning_levels"]) >= 1


def test_thinning_level_in_stats_batched(lv_problem):
    rhs, jac = lv_problem.make_rhs(), lv_problem.make_jac_dense()
    y0 = jnp.broadcast_to(Y0, (3, 2))
    p = jnp.broadcast_to(P, (3, 4))
    res = bdf_solve_batched(
        rhs, jac, 0.0, y0, p, TVALS,
        BDFOptions(rtol=1e-8, atol=1e-8, save_steps=16),
    )
    assert np.asarray(res.status == 0).all()
    assert int(res.stats["checkpoint_thinning_levels"]) >= 1


def test_adjoint_solver_warns_on_thinning(lv_problem):
    from sunode_tpu.solver import AdjointSolver

    # native_single=False: thinning is a JAX-checkpoint-path concept — the
    # native CVodeF record is growable and never thins, so B=1 BDF/hermite
    # would otherwise route around the machinery under test
    solver = AdjointSolver(
        lv_problem, abstol=1e-8, reltol=1e-8, checkpoint_n=16,
        native_single=False,
    )
    solver.set_params_dict(
        {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
    )
    with pytest.warns(RuntimeWarning, match="thinned"):
        solver.solve_forward(0.0, np.asarray(TVALS), np.asarray(Y0))
    assert int(np.max(solver.last_stats["checkpoint_thinning_levels"])) >= 1

    # an adequately sized buffer must stay silent
    solver2 = AdjointSolver(
        lv_problem, abstol=1e-8, reltol=1e-8, checkpoint_n=4096,
        native_single=False,
    )
    solver2.set_params_dict(
        {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        solver2.solve_forward(0.0, np.asarray(TVALS), np.asarray(Y0))
    assert int(np.max(solver2.last_stats["checkpoint_thinning_levels"])) == 0


def test_batched_thinning_desynced_lane_spacing(lv_problem):
    """A lane whose accepts desynchronize from the shared attempt counter
    must still get ~uniform checkpoint coverage: with the rolling tail
    recorded at rejected record events, the worst per-lane gap between
    consecutive recorded rows stays bounded by a small multiple of the mean
    gap (before the fix a desynced lane could lose every other record)."""
    rhs, jac = lv_problem.make_rhs(), lv_problem.make_jac_dense()
    B = 6
    rng = np.random.default_rng(3)
    # widely varying difficulty -> lanes reject at different attempts
    y0 = jnp.asarray(
        np.array([10.0, 2.0]) * (1 + 0.3 * rng.standard_normal((B, 2)))
    )
    p = jnp.asarray(
        np.array([1.0, 0.3, 1.0, 0.4])
        * (1 + 0.5 * np.abs(rng.standard_normal((B, 4))))
    )
    res = bdf_solve_batched(
        rhs, jac, 0.0, y0, p, TVALS,
        BDFOptions(rtol=1e-8, atol=1e-8, save_steps=32),
    )
    assert np.asarray(res.status == 0).all()
    assert not np.asarray(res.saved["overflow"]).any()
    ts = np.asarray(res.saved["t"])
    n_saved = np.asarray(res.saved["n_saved"])
    for b in range(B):
        col = ts[: n_saved[b], b]
        assert np.isfinite(col).all()
        assert (np.diff(col) > 0).all()
        gaps = np.diff(col)
        # bounded worst-case spacing relative to the lane's own mean gap
        assert gaps.max() <= 6 * gaps.mean(), (b, gaps.max(), gaps.mean())


def test_transition_adjoint_flags_illconditioned():
    """Strongly contracting dynamics make the backward fundamental matrix M
    blow up exponentially; cond(M) >> 1/eps must set status 97 and NaN the
    gradients rather than silently returning garbage."""
    from sunode_tpu.adjoint import adjoint_backward_transition_batched

    # y' = diag(-a, -b) y with a >> b: M(tau) ~ diag(e^{a t}, e^{b t})
    def rhs(t, y, p):
        return jnp.array([-p[0] * y[0], -p[1] * y[1]])

    def adjoint_jac(t, y, lam, p):  # -J^T
        return jnp.array([[p[0], 0.0], [0.0, p[1]]])

    def dfdp(t, y, p):
        return jnp.array([[-y[0], 0.0], [0.0, -y[1]]])

    tvals = jnp.linspace(1.0, 10.0, 4)
    B = 2
    params = jnp.asarray([[6.0, 0.01], [0.05, 0.01]])  # lane 0 stiff, lane 1 benign
    y0 = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
    # forward emissions at tvals (exact solutions)
    y_end = jnp.stack(
        [
            jnp.exp(-params[:, 0] * tvals[-1]),
            jnp.exp(-params[:, 1] * tvals[-1]),
        ],
        axis=1,
    )
    grads = jnp.ones((B, tvals.shape[0], 2))
    adj = adjoint_backward_transition_batched(
        rhs, adjoint_jac, dfdp, 0.0, tvals, grads, params, 2, y_end,
        BDFOptions(rtol=1e-10, atol=1e-10),
    )
    status = np.asarray(adj.status)
    assert status[0] == 97, status  # ill-conditioned lane flagged
    assert np.isnan(np.asarray(adj.lamda)[0]).all()
    assert status[1] == 0, status  # benign lane untouched
    assert np.isfinite(np.asarray(adj.lamda)[1]).all()
    growth = np.asarray(adj.stats["transition_growth"])
    assert growth[0] > 1e10 and growth[1] < 1e10


def test_transition_adjoint_f32_gates_not_false_flagged(lv_problem):
    """The conditioning gates must be dtype-aware: a healthy f32 solve leaves
    rel_resid ~ few * eps_f32 ~ 1e-6, so the f64 gate (1e-6) false-flagged
    ~half of all f32 lanes (measured 46% finite on the 10k-lane bench before
    the fix).  A benign f32 LV batch must come back fully finite."""
    from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

    B = 64
    rng = np.random.default_rng(0)
    tvals = jnp.linspace(1.0, 10.0, 11).astype(jnp.float32)
    y0s = jnp.asarray(
        np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))),
        jnp.float32,
    )
    p_subs = jnp.asarray(
        np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))),
        jnp.float32,
    )
    p_fix = jnp.asarray([1.0, 0.4], jnp.float32)
    solve = make_batched_solve_fn(
        lv_problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-5, atol=1e-5, adams_max_order=6),
        adjoint_options=BDFOptions(rtol=1e-4, atol=1e-4, adams_max_order=6),
        method="ADAMS",
        adjoint_interpolation="transition",
    )

    def loss(y0s, p_subs):
        return jnp.sum(solve(0.0, y0s, p_subs, p_fix, tvals) ** 2)

    gy, gp = jax.grad(loss, argnums=(0, 1))(y0s, p_subs)
    assert gy.dtype == jnp.float32
    assert np.isfinite(np.asarray(gy)).all()
    assert np.isfinite(np.asarray(gp)).all()


def test_banded_singular_factor_poisons_solve():
    from sunode_tpu.ops.banded import banded_factor, banded_solve, dense_to_banded

    A = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    factors = banded_factor(dense_to_banded(A, 1, 1), 1, 1)
    assert bool(factors[2])
    x = banded_solve(factors, jnp.ones(3), 1, 1)
    assert np.isnan(np.asarray(x)).all()

    Ag = jnp.asarray([[2.0, 1.0, 0.0], [1.0, 2.0, 1.0], [0.0, 1.0, 2.0]])
    factors_g = banded_factor(dense_to_banded(Ag, 1, 1), 1, 1)
    assert not bool(factors_g[2])
    x_g = banded_solve(factors_g, jnp.ones(3), 1, 1)
    np.testing.assert_allclose(
        np.asarray(x_g), np.linalg.solve(np.asarray(Ag), np.ones(3)), rtol=1e-12
    )


def test_resume_in_place_work_bounded(lv_problem):
    """MAX_STEPS retries resume from (final_time, final_state) with a warm
    step size (CVode-resume semantics, ref solver.py:510-519): total step
    work across retries must be ~ the single-shot step count plus short
    order-1 ramps — NOT 2^k full re-runs — and outputs must match the
    unconstrained solve."""
    from sunode_tpu.solver import Solver

    params = {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
    tv = np.linspace(1.0, 12.0, 6)
    y0 = np.array([10.0, 2.0])

    # native_single=False: this test measures the JAX resume machinery
    ref = Solver(lv_problem, reltol=1e-10, abstol=1e-10, native_single=False)
    ref.set_params_dict(params)
    out_ref = ref.solve(0.0, tv, y0)
    full_steps = int(ref.last_stats["n_steps"])
    assert full_steps > 400  # needs many segments at max_steps=40

    s = Solver(lv_problem, reltol=1e-10, abstol=1e-10, max_steps=40,
               native_single=False)
    s.set_params_dict(params)
    out = s.solve(0.0, tv, y0)
    np.testing.assert_allclose(out, out_ref, rtol=1e-6, atol=1e-9)
    assert int(s.last_stats["n_resumes"]) >= 2
    total = int(s.last_stats["n_steps_total"])
    assert total < 1.5 * full_steps, (total, full_steps)

    # batched lanes resume from their own per-lane final_time
    rng = np.random.default_rng(0)
    y0b = y0 * (1 + 0.1 * rng.standard_normal((3, 2)))
    sb = Solver(lv_problem, reltol=1e-10, abstol=1e-10, max_steps=40)
    sb.set_params_dict(params)
    outb = sb.solve(0.0, tv, y0b)
    refb = Solver(lv_problem, reltol=1e-10, abstol=1e-10, native_single=False)
    refb.set_params_dict(params)
    np.testing.assert_allclose(outb, refb.solve(0.0, tv, y0b), rtol=1e-6, atol=1e-9)
    assert (np.asarray(sb.last_stats["n_steps_total"]) < 1.5 * full_steps).all()


def test_options_first_step_honored(lv_problem):
    """Code review r3: the traced first_step override must not silently
    disable a user-configured BDFOptions.first_step."""
    from sunode_tpu.solver import Solver

    params = {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
    tv = np.asarray([0.01])
    s_auto = Solver(
        lv_problem,
        options=BDFOptions(rtol=1e-6, atol=1e-6),
        native_single=False,
    )
    s_auto.set_params_dict(params)
    s_auto.solve(0.0, tv, np.array([10.0, 2.0]))
    n_auto = int(s_auto.last_stats["n_steps"])

    s_tiny = Solver(
        lv_problem,
        options=BDFOptions(rtol=1e-6, atol=1e-6, first_step=1e-9),
        native_single=False,
    )
    s_tiny.set_params_dict(params)
    s_tiny.solve(0.0, tv, np.array([10.0, 2.0]))
    n_tiny = int(s_tiny.last_stats["n_steps"])
    # ramping up from h0=1e-9 over a 1e-2 span costs many more steps than
    # the automatic h0; if the option were ignored the counts would match
    assert n_tiny > n_auto + 3, (n_tiny, n_auto)


def test_polynomial_eval_coincident_exact_nodes():
    """Code review r3: two recorded rows within the exact-match tolerance of
    the evaluation point must not double-count."""
    from sunode_tpu.adjoint import make_polynomial_eval

    ts = np.array([0.0, 0.5, 1.0, 1.0 + 1e-16, 1.5, 2.0, np.inf, np.inf])
    y = np.array([1.0, 2.0, 3.0, 3.0, 4.0, 5.0, 0.0, 0.0])
    saved = {
        "t": jnp.asarray(ts),
        "y": jnp.asarray(y[:, None]),
        "f": jnp.zeros((len(ts), 1)),
        "n_saved": jnp.asarray(6),
        "overflow": jnp.asarray(False),
    }
    y_at = make_polynomial_eval(saved)
    got = float(y_at(jnp.asarray(1.0))[0])
    assert abs(got - 3.0) < 1e-10, got  # not ~6.0


def test_nuts_tiny_warmup_keeps_mass():
    """Code review r3: an empty mass-adaptation window must leave inv_mass
    untouched (not install the bare 1e-3 regularizer)."""
    from sunode_tpu.sample import nuts_sample

    def logp(q):
        return -0.5 * jnp.sum(q**2, axis=1)

    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (2, 3)) * 0.1
    res = nuts_sample(
        logp, key, init, num_warmup=1, num_samples=3, max_treedepth=3
    )
    np.testing.assert_allclose(np.asarray(res.inv_mass), 1.0, rtol=1e-12)
    assert np.isfinite(np.asarray(res.samples)).all()


# --- round-3 self-review findings (second pass) -----------------------------


def test_transition_monitor_zero_cotangent_rows_f32(lv_problem):
    """A loss touching only the last observation leaves all-zero cotangent
    rows; in f32 the old +1e-300 division floor underflowed to 0, making
    0/0 = NaN disable the ill-conditioning gate AND poison the stats.
    rel_resid/growth must stay finite with zero rows."""
    from sunode_tpu.adjoint import adjoint_backward_transition_batched
    from sunode_tpu.ops.bdf_batched import bdf_solve_batched

    rhs, jac = lv_problem.make_rhs(), lv_problem.make_jac_dense()
    aj_jac = lv_problem.make_adjoint_jac_dense()
    dfdp = lv_problem.make_dfdp()
    for dtype in (jnp.float64, jnp.float32):
        rtol = 1e-8 if dtype == jnp.float64 else 1e-5
        y0 = jnp.asarray(np.broadcast_to([10.0, 2.0], (3, 2)).copy(), dtype)
        p = jnp.asarray(
            np.broadcast_to([1.0, 0.3, 1.0, 0.4], (3, 4)).copy(), dtype
        )
        tv = jnp.asarray(np.linspace(1.0, 6.0, 4), dtype)
        opts = BDFOptions(rtol=rtol, atol=rtol)
        res = bdf_solve_batched(rhs, jac, 0.0, y0, p, tv, opts)
        assert np.asarray(res.status == 0).all()
        grads = np.zeros((3, 4, 2), dtype=np.dtype(dtype))
        grads[:, -1, :] = 1.0  # ONLY the last observation
        adj = adjoint_backward_transition_batched(
            rhs, aj_jac, dfdp, 0.0, tv, jnp.asarray(grads), p, 2,
            jnp.asarray(np.asarray(res.ys)[:, -1, :], dtype), opts,
        )
        assert np.isfinite(
            np.asarray(adj.stats["transition_rel_residual"])
        ).all(), dtype
        assert np.isfinite(np.asarray(adj.stats["transition_growth"])).all(), dtype
        assert np.asarray(adj.status == 0).all()
        assert np.isfinite(np.asarray(adj.lamda)).all()


def test_huge_max_steps_clamps_to_i32(lv_problem):
    """Step budgets are traced as int32; max_steps past 2**31 must clamp
    instead of raising OverflowError (previously worked when the budget was
    a static Python int)."""
    from sunode_tpu.solver import Solver

    s = Solver(lv_problem, abstol=1e-8, reltol=1e-8, max_steps=2**33)
    s.set_params_dict({"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4})
    ys = s.solve(0.0, np.asarray(TVALS), np.array([10.0, 2.0]))
    assert np.isfinite(ys).all()
