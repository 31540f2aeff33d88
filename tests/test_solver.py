"""Solver / AdjointSolver class API — modeled on reference sunode/test_solve.py."""

import numpy as np
import pytest
import jax.numpy as jnp

from sunode_tpu.solver import Solver, AdjointSolver, SolverError
from sunode_tpu.symode import SympyProblem


def lv(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


@pytest.fixture(scope="module")
def problem():
    return SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lv,
        derivative_params=[("alpha",), ("beta",)],
    )


PARAMS = {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
TVALS = np.linspace(0.5, 8, 7)


def test_readme_flow(problem):
    """The exact README usage pattern (README.md:56-126)."""
    solver = Solver(problem, sens_mode=None, solver="BDF")
    y0 = np.zeros((), dtype=problem.state_dtype)
    y0["hares"] = 10.0
    y0["lynx"] = 2.0
    solver.set_params_dict(PARAMS)
    output = solver.make_output_buffers(TVALS)
    solver.solve(t0=0, tvals=TVALS, y0=y0, y_out=output)
    assert np.isfinite(output).all()
    # record-array style access
    rec = output.view(problem.state_dtype)
    assert rec["hares"].shape == (len(TVALS), 1) or rec["hares"].shape == (len(TVALS),)
    ds = solver.as_xarray(TVALS, output)
    assert "solution_hares" in ds.keys() or hasattr(ds, "solution_hares")
    assert ds.solution_hares.values.shape == (len(TVALS),)


def test_solve_flat_and_dict_y0(problem):
    solver = Solver(problem)
    solver.set_params_dict(PARAMS)
    out1 = solver.solve(0.0, TVALS, np.array([10.0, 2.0]))
    out2 = solver.solve(0.0, TVALS, {"hares": 10.0, "lynx": 2.0})
    np.testing.assert_allclose(out1, out2)


def test_params_roundtrip(problem):
    solver = Solver(problem)
    solver.set_params_dict(PARAMS)
    d = solver.get_params_dict()
    assert d["alpha"] == 1.0 and d["delta"] == 0.4
    solver.set_derivative_params(np.array([2.0, 0.5]))
    d = solver.get_params_dict()
    assert d["alpha"] == 2.0 and d["beta"] == 0.5 and d["gamma"] == 1.0
    solver.set_remaining_params(np.array([3.0, 0.7]))
    d = solver.get_params_dict()
    assert d["gamma"] == 3.0 and d["delta"] == 0.7


def test_forward_sensitivities(problem):
    solver = Solver(problem, sens_mode="simultaneous", abstol=1e-10, reltol=1e-10)
    solver.set_params_dict(PARAMS)
    y_out, sens_out = solver.make_output_buffers(TVALS)
    solver.solve(0.0, TVALS, np.array([10.0, 2.0]), y_out, sens_out=sens_out)
    assert sens_out.shape == (len(TVALS), 2, 2)
    assert np.isfinite(sens_out).all()
    assert np.abs(sens_out).max() > 0


def test_staggered_mode_works(problem):
    solver = Solver(problem, sens_mode="staggered")
    solver.set_params_dict(PARAMS)
    y_out, sens_out = solver.make_output_buffers(TVALS)
    solver.solve(0.0, TVALS, np.array([10.0, 2.0]), y_out, sens_out=sens_out)
    assert np.isfinite(sens_out).all()


def test_linear_solver_kinds(problem):
    for kind in ["dense", "dense_finitediff"]:
        solver = Solver(problem, linear_solver=kind)
        solver.set_params_dict(PARAMS)
        out = solver.solve(0.0, TVALS, np.array([10.0, 2.0]))
        assert np.isfinite(out).all()


def test_invalid_args(problem):
    with pytest.raises(ValueError):
        Solver(problem, solver="RK")
    with pytest.raises(ValueError):
        Solver(problem, sens_mode="staggered1")
    with pytest.raises(ValueError):
        Solver(problem, linear_solver="magic")


def test_adams_sens_constructs(problem):
    # Adams forward sensitivities run as an augmented state; value checks
    # live in tests/test_solver_modes.py
    Solver(problem, solver="ADAMS", sens_mode="simultaneous")


def test_batched_solve(problem):
    solver = Solver(problem)
    solver.set_params_dict(PARAMS)
    y0 = np.tile([10.0, 2.0], (12, 1)) * np.linspace(0.9, 1.1, 12)[:, None]
    out = solver.solve(0.0, TVALS, y0)
    assert out.shape == (12, len(TVALS), 2)
    solo = solver.solve(0.0, TVALS, y0[4])
    np.testing.assert_allclose(out[4], solo, rtol=1e-8)


def test_solver_error_raised(problem):
    solver = Solver(problem, max_steps=3)
    solver.set_params_dict(PARAMS)
    with pytest.raises(SolverError, match="too many steps"):
        solver.solve(0.0, TVALS, np.array([10.0, 2.0]))


def test_stats(problem):
    solver = Solver(problem)
    solver.set_params_dict(PARAMS)
    solver.solve(0.0, TVALS, np.array([10.0, 2.0]))
    s = solver.current_stats
    assert s["n_steps"] > 10
    assert s["n_rhs_evals"] > s["n_steps"]


def test_pickling(problem):
    import pickle

    solver = Solver(problem)
    solver.set_params_dict(PARAMS)
    out1 = solver.solve(0.0, TVALS, np.array([10.0, 2.0]))
    s2 = pickle.loads(pickle.dumps(solver))
    out2 = s2.solve(0.0, TVALS, np.array([10.0, 2.0]))
    np.testing.assert_allclose(out1, out2)


# ---------------------------------------------------------------------------
# AdjointSolver
# ---------------------------------------------------------------------------
def test_adjoint_solver_forward_backward(problem):
    solver = AdjointSolver(problem, checkpoint_n=8192)
    solver.set_params_dict(PARAMS)
    y_out, grad_out, lamda_out = solver.make_output_buffers(TVALS)
    solver.solve_forward(0.0, TVALS, np.array([10.0, 2.0]), y_out)
    assert np.isfinite(y_out).all()
    grads = np.ones((len(TVALS), 2))
    solver.solve_backward(TVALS[-1], 0.0, TVALS, grads, grad_out, lamda_out)
    assert np.isfinite(grad_out).all() and np.isfinite(lamda_out).all()

    # cross-check against the forward-sensitivity gradient:
    # dL/dp = sum_i g_i . S(t_i)
    fsolver = Solver(problem, sens_mode="simultaneous", abstol=1e-11, reltol=1e-11)
    fsolver.set_params_dict(PARAMS)
    yb, sens = fsolver.make_output_buffers(TVALS)
    fsolver.solve(0.0, TVALS, np.array([10.0, 2.0]), yb, sens_out=sens)
    expected_grad = np.einsum("ij,ikj->k", grads, sens)
    np.testing.assert_allclose(grad_out, expected_grad, rtol=1e-4, atol=1e-7)


def test_adjoint_backward_before_forward_raises(problem):
    solver = AdjointSolver(problem)
    with pytest.raises(SolverError, match="before solve_forward"):
        solver.solve_backward(8.0, 0.0, TVALS, np.ones((len(TVALS), 2)))


def test_checkpoint_info_native_record(problem):
    """checkpoint_info: CVodeGetAdjCheckPointsInfo analog on the native
    CVodeF record (16_cvodes.h:429-439)."""
    solver = AdjointSolver(problem)
    solver.set_params_dict(PARAMS)
    with pytest.raises(SolverError, match="before solve_forward"):
        solver.checkpoint_info()
    solver.solve_forward(0.0, TVALS, np.array([10.0, 2.0]))
    info = solver.checkpoint_info()
    assert info["capacity"] is None  # native record grows unbounded
    assert info["thinning_level"] == 0 and not info["overflow"]
    ts = info["times"]
    assert info["n_recorded"] == len(ts) > 10
    assert np.all(np.diff(ts) > 0)  # strictly advancing rows
    # the table must cover the backward sweep range
    assert info["t_first"] <= TVALS[0]
    assert info["t_last"] >= TVALS[-1] - 1e-9
    assert 0 < info["dt_min"] <= info["dt_mean"] <= info["dt_max"]


def test_checkpoint_info_jax_thinning(problem):
    """On the fixed-size JAX buffer, thinning shows up in checkpoint_info
    instead of requiring reaching into private state."""
    big = AdjointSolver(problem, checkpoint_n=8192, native_single=False)
    big.set_params_dict(PARAMS)
    big.solve_forward(0.0, TVALS, np.array([10.0, 2.0]))
    info_big = big.checkpoint_info()
    assert info_big["capacity"] in (8192, 8193)  # buffer holds t0 row + steps
    assert info_big["thinning_level"] == 0 and not info_big["overflow"]

    small_n = max(16, info_big["n_recorded"] // 4)
    small = AdjointSolver(problem, checkpoint_n=small_n, native_single=False)
    small.set_params_dict(PARAMS)
    with pytest.warns(RuntimeWarning, match="thinned"):
        small.solve_forward(0.0, TVALS, np.array([10.0, 2.0]))
    info = small.checkpoint_info()
    assert info["capacity"] in (small_n, small_n + 1)
    assert info["n_recorded"] <= info["capacity"]
    assert info["overflow"] and info["thinning_level"] >= 1
    # thinning doubles the spacing per level vs the big-buffer table
    assert info["dt_mean"] > info_big["dt_mean"] * 1.5
    assert np.all(np.diff(info["times"]) > 0)


def test_empty_and_nested_params():
    """Reference test_solve.py exercises scalar/nested/empty params."""

    def rhs(t, y, p):
        return {"x": -y.x * p.rates.k + p.off}

    prob = SympyProblem(
        params={"rates": {"k": ()}, "off": (), "unused": (3,)},
        states={"x": ()},
        rhs_sympy=rhs,
        derivative_params=[("rates", "k")],
    )
    solver = Solver(prob)
    solver.set_params_dict({"rates": {"k": 1.0}, "off": 0.5, "unused": np.zeros(3)})
    out = solver.solve(0.0, np.array([1.0, 2.0]), np.array([3.0]))
    # analytic: x(t) = 0.5 + 2.5 e^-t
    np.testing.assert_allclose(
        out[:, 0], 0.5 + 2.5 * np.exp(-np.array([1.0, 2.0])), rtol=1e-7
    )


def test_adjoint_solver_pickling(problem):
    import pickle

    solver = AdjointSolver(problem, checkpoint_n=4096)
    solver.set_params_dict(PARAMS)
    s2 = pickle.loads(pickle.dumps(solver))
    y_out, grad_out, lamda_out = s2.make_output_buffers(TVALS)
    s2.solve_forward(0.0, TVALS, np.array([10.0, 2.0]), y_out)
    assert np.isfinite(y_out).all()


def test_adjoint_solver_pickles_after_solve(problem):
    """Pickling must also work AFTER the first solve: the lazily-built
    native CpuSolver (ctypes.CDLL handles) is excluded from __getstate__
    (previously only the fresh object pickled)."""
    import pickle

    solver = AdjointSolver(problem, abstol=1e-8, reltol=1e-8)
    solver.set_params_dict(PARAMS)
    ys = solver.solve_forward(0.0, TVALS, np.array([10.0, 2.0]))
    s2 = pickle.loads(pickle.dumps(solver))  # must not raise on CDLL handles
    s2.set_params_dict(PARAMS)
    ys2 = s2.solve_forward(0.0, TVALS, np.array([10.0, 2.0]))
    np.testing.assert_allclose(ys2, ys, rtol=1e-10)
    # Solver too (its native handle was already excluded; keep it covered)
    fs = Solver(problem, abstol=1e-8, reltol=1e-8)
    fs.set_params_dict(PARAMS)
    out = fs.solve(0.0, TVALS, np.array([10.0, 2.0]))
    fs2 = pickle.loads(pickle.dumps(fs))
    fs2.set_params_dict(PARAMS)
    np.testing.assert_allclose(fs2.solve(0.0, TVALS, np.array([10.0, 2.0])), out, rtol=1e-10)


def test_batched_solve_adams(problem):
    solver = Solver(problem, solver="ADAMS", abstol=1e-9, reltol=1e-9)
    solver.set_params_dict(PARAMS)
    y0 = np.tile([10.0, 2.0], (6, 1)) * np.linspace(0.95, 1.05, 6)[:, None]
    out = solver.solve(0.0, TVALS, y0)
    assert out.shape == (6, len(TVALS), 2)
    solo = solver.solve(0.0, TVALS, y0[2])
    np.testing.assert_allclose(out[2], solo, rtol=1e-6, atol=1e-9)
