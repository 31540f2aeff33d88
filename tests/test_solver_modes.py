"""Round-2 solver option honesty: distinct staggered sensitivities, Adams
forward sensitivities, ADAMS in the AdjointSolver class API, and the
polynomial-interpolation warning (VERDICT round 1, item 5)."""

import warnings

import numpy as np
import pytest
import jax.numpy as jnp

from sunode_tpu.solver import AdjointSolver, Solver
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


PARAMS = {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
Y0 = {"hares": 10.0, "lynx": 2.0}
TVALS = np.linspace(0.5, 8.0, 7)


def _sens_fd(problem, tvals, eps=1e-6):
    """FD reference for d y / d (alpha, beta)."""
    out = np.zeros((len(tvals), 2, 2))
    for j, name in enumerate(("alpha", "beta")):
        for sgn, sl in ((1, 0), (-1, 1)):
            s = Solver(problem, sens_mode=None)
            p = dict(PARAMS)
            p[name] += sgn * eps
            s.set_params_dict(p)
            ys = s.solve(0.0, tvals, np.array([10.0, 2.0]))
            out[:, j, :] += sgn * ys / (2 * eps)
    return out


def _run_sens(problem, **kw):
    s = Solver(problem, sens_mode=kw.pop("sens_mode", "simultaneous"), **kw)
    s.set_params_dict(PARAMS)
    y_out, sens_out = s.make_output_buffers(TVALS)
    s.solve(0.0, TVALS, np.array([10.0, 2.0]), y_out, sens_out=sens_out)
    return y_out, sens_out, s.last_stats


def test_staggered_matches_fd_on_lv(lv_problem):
    """On a smooth problem with no error-test rejections both modes do
    identical work; staggered must still give FD-correct sensitivities."""
    y_stg, sens_stg, _ = _run_sens(lv_problem, sens_mode="staggered")
    fd = _sens_fd(lv_problem, TVALS)
    np.testing.assert_allclose(sens_stg[:, :2, :], fd, rtol=1e-3, atol=1e-4)


def test_staggered_distinct_from_simultaneous_on_robertson():
    """CV_STAGGERED must genuinely sequence: on attempts whose state failed
    its own error test the sensitivity corrector never runs, so on a stiff
    problem with error-test rejections (Robertson has several in its startup
    transient) the step/sens-eval profile differs from CV_SIMULTANEOUS while
    the converged sensitivities agree (ref solver.py:360-392)."""
    prob = SympyProblem(
        params={"k1": (), "k2": (), "k3": ()},
        states={"a": (), "b": (), "c": ()},
        rhs_sympy=lambda t, y, p: {
            "a": -p.k1 * y.a + p.k3 * y.b * y.c,
            "b": p.k1 * y.a - p.k2 * y.b**2 - p.k3 * y.b * y.c,
            "c": p.k2 * y.b**2,
        },
        derivative_params=[("k1",)],
    )
    tvals = np.logspace(-3, 4, 8)
    # jitted-path whitebox check (native_single=False pins the JAX core,
    # whose stats expose the sens-specific eval counter)
    out = {}
    for mode in ("simultaneous", "staggered"):
        s = Solver(
            prob, sens_mode=mode, reltol=1e-8, abstol=1e-10,
            native_single=False,
        )
        s.set_params_dict({"k1": 0.04, "k2": 3e7, "k3": 1e4})
        y_out, sens_out = s.make_output_buffers(tvals)
        s.solve(0.0, tvals, np.array([1.0, 0.0, 0.0]), y_out, sens_out=sens_out)
        out[mode] = (sens_out.copy(), dict(s.last_stats))
    sens_sim, st_sim = out["simultaneous"]
    sens_stg, st_stg = out["staggered"]
    assert int(st_sim["n_error_test_fails"]) > 0
    assert (
        int(st_stg["n_sens_rhs_evals"]) != int(st_sim["n_sens_rhs_evals"])
        or int(st_stg["n_steps"]) != int(st_sim["n_steps"])
    )
    np.testing.assert_allclose(sens_stg, sens_sim, rtol=1e-4, atol=1e-10)

    # native path (the B=1 default route): the staggered profile spends
    # more Jacobian evals (one per accepted step for the sens corrector)
    # and fewer RHS evals than the simultaneous augmented corrector, while
    # the sensitivities agree
    out_n = {}
    for mode in ("simultaneous", "staggered"):
        s = Solver(prob, sens_mode=mode, reltol=1e-8, abstol=1e-10)
        s.set_params_dict({"k1": 0.04, "k2": 3e7, "k3": 1e4})
        assert s._native_sens_eligible()
        _, sens_n = s.solve(0.0, tvals, np.array([1.0, 0.0, 0.0]))
        out_n[mode] = (np.asarray(sens_n), dict(s.last_stats))
    sens_sim_n, st_sim_n = out_n["simultaneous"]
    sens_stg_n, st_stg_n = out_n["staggered"]
    assert int(st_stg_n["n_jac_evals"]) > int(st_sim_n["n_jac_evals"])
    np.testing.assert_allclose(sens_stg_n, sens_sim_n, rtol=1e-4, atol=1e-10)


def test_adams_forward_sensitivities(lv_problem):
    y, sens, _ = _run_sens(lv_problem, solver="ADAMS")
    fd = _sens_fd(lv_problem, TVALS)
    np.testing.assert_allclose(sens[:, :2, :], fd, rtol=1e-3, atol=1e-4)
    # batched path too
    s = Solver(lv_problem, sens_mode="simultaneous", solver="ADAMS")
    s.set_params_dict(PARAMS)
    B = 3
    y0b = np.tile(np.array([10.0, 2.0]), (B, 1))
    ys, sens_b = s.solve(0.0, TVALS, y0b)
    np.testing.assert_allclose(np.asarray(sens_b)[0], sens, rtol=1e-6, atol=1e-8)


def test_adjoint_solver_adams_class_api(lv_problem):
    ref = AdjointSolver(lv_problem, interpolation="hermite")
    sol = AdjointSolver(
        lv_problem, interpolation="hermite", solver="ADAMS", adjoint_solver="ADAMS"
    )
    for s in (ref, sol):
        s.set_params_dict(PARAMS)
    grads = np.ones((len(TVALS), 2))
    out = {}
    for name, s in (("bdf", ref), ("adams", sol)):
        y_out, grad_out, lamda_out = s.make_output_buffers(TVALS)
        s.solve_forward(0.0, TVALS, np.array([10.0, 2.0]), y_out)
        s.solve_backward(TVALS[-1], 0.0, TVALS, grads, grad_out, lamda_out)
        out[name] = (y_out.copy(), grad_out.copy(), lamda_out.copy())
    np.testing.assert_allclose(out["adams"][0], out["bdf"][0], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(out["adams"][1], out["bdf"][1], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(out["adams"][2], out["bdf"][2], rtol=1e-3, atol=1e-6)


def test_polynomial_interpolation_real_mode(lv_problem):
    """interpolation='polynomial' (CV_POLYNOMIAL, the reference default) is
    a real distinct scheme — it must run silently and agree with the
    Hermite-mode gradients to gradient tolerance."""
    grads = np.ones((len(TVALS), 2))
    out = {}
    for interp in ("hermite", "polynomial"):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            s = AdjointSolver(
                lv_problem, reltol=1e-8, abstol=1e-8, interpolation=interp
            )
        s.set_params_dict(PARAMS)
        y_out, grad_out, lamda_out = s.make_output_buffers(TVALS)
        s.solve_forward(0.0, TVALS, np.array([10.0, 2.0]), y_out)
        s.solve_backward(TVALS[-1], 0.0, TVALS, grads, grad_out, lamda_out)
        out[interp] = (grad_out.copy(), lamda_out.copy())
    np.testing.assert_allclose(
        out["polynomial"][0], out["hermite"][0], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        out["polynomial"][1], out["hermite"][1], rtol=1e-3, atol=1e-6
    )


def test_max_steps_retry_recovers(lv_problem):
    """CV_TOO_MUCH_WORK bounded-retry parity (ref solver.py:510-519): a
    max_steps budget too small for one pass succeeds after retries with a
    doubled budget instead of raising."""
    s = Solver(lv_problem, reltol=1e-10, abstol=1e-10, max_steps=40)
    s.set_params_dict(PARAMS)
    out = s.solve(0.0, TVALS, np.array([10.0, 2.0]))  # needs ~200+ steps
    ref = Solver(lv_problem, reltol=1e-10, abstol=1e-10)
    ref.set_params_dict(PARAMS)
    np.testing.assert_allclose(out, ref.solve(0.0, TVALS, np.array([10.0, 2.0])),
                               rtol=1e-8)

    from sunode_tpu.solver import SolverError

    s0 = Solver(lv_problem, reltol=1e-10, abstol=1e-10, max_steps=40,
                max_retries=0)
    s0.set_params_dict(PARAMS)
    with pytest.raises(SolverError, match="max_steps"):
        s0.solve(0.0, TVALS, np.array([10.0, 2.0]))


def test_batched_staggered_matches_single(lv_problem):
    """Batched staggered solves now run BATCH-NATIVE with real CV_STAGGERED
    sequencing (per-lane state-error gating of the sens corrector — round-3
    upgrade of the former vmap(bdf_solve) routing) and must match per-lane
    single staggered solves to solver tolerance."""
    s = Solver(lv_problem, sens_mode="staggered")
    s.set_params_dict(PARAMS)
    B = 3
    y0b = np.tile(np.array([10.0, 2.0]), (B, 1)) * np.linspace(0.95, 1.05, B)[:, None]
    ys_b, sens_b = s.solve(0.0, TVALS, y0b)
    # the batch-native core is actually in use: its stats carry the shared
    # attempt counter (vmap(bdf_solve) has none)
    assert "n_attempts" in s.last_stats
    for b in range(B):
        ys_1, sens_1 = s.solve(0.0, TVALS, y0b[b])
        np.testing.assert_allclose(np.asarray(ys_b)[b], ys_1, rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(sens_b)[b], sens_1, rtol=1e-3, atol=1e-5
        )


def test_adams_sens_err_con_off_does_not_dilute(lv_problem):
    """sens_err_con=False must EXCLUDE the sens rows from error control, not
    dilute the state norm by sqrt(1+k): the augmented solve's step count
    stays close to the plain solve's (code-review round 2)."""
    from sunode_tpu.ops.bdf import BDFOptions

    plain = Solver(lv_problem, solver="ADAMS", reltol=1e-8, abstol=1e-8)
    plain.set_params_dict(PARAMS)
    plain.solve(0.0, TVALS, np.array([10.0, 2.0]))
    steps_plain = int(plain.last_stats["n_steps"])

    s = Solver(
        lv_problem,
        solver="ADAMS",
        sens_mode="simultaneous",
        options=BDFOptions(rtol=1e-8, atol=1e-8, sens_err_con=False),
    )
    s.set_params_dict(PARAMS)
    y_out, sens_out = s.make_output_buffers(TVALS)
    s.solve(0.0, TVALS, np.array([10.0, 2.0]), y_out, sens_out=sens_out)
    steps_aug = int(s.last_stats["n_steps"])
    # with the old diluted norm (atol_S=1e12 averaged in) the augmented
    # solve took ~sqrt(1+k) looser steps — markedly FEWER than plain
    assert steps_aug >= steps_plain * 0.9
    fd = _sens_fd(lv_problem, TVALS)
    np.testing.assert_allclose(sens_out[:, :2, :], fd, rtol=1e-3, atol=1e-4)
