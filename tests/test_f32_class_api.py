"""f32 opt-in on the reference-shaped class API (VERDICT r4 item 5).

``Solver(..., dtype=np.float32)`` / ``AdjointSolver(..., dtype=np.float32)``
run the whole pipeline at f32 (TPU-speed mode) without abandoning the
reference-shaped API — previously the measured ~5.6x f32 win required
finding ``make_batched_solve_fn``.  The f64 default keeps reference
realtype semantics (/root/reference/sunode/basic.py:40-43) and the native
host fast path (which is f64-only and must be skipped at f32).

Error gates mirror tests/test_f32_mode.py: answers within f32-appropriate
tolerances of the f64 reference solve on the README Lotka-Volterra problem.
"""

import numpy as np
import pytest

from sunode_tpu.solver import AdjointSolver, Solver
from sunode_tpu.symode import SympyProblem

pytestmark = pytest.mark.filterwarnings("error::FutureWarning")


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
TVALS = np.linspace(1.0, 10.0, 8)


def _f64_reference(lv_problem, sens=False):
    s = Solver(
        lv_problem,
        abstol=1e-10,
        reltol=1e-10,
        sens_mode="simultaneous" if sens else None,
    )
    s.set_params_dict(PARAMS)
    if sens:
        return s.solve(0.0, TVALS, Y0)
    return s.solve(0.0, TVALS, Y0)


def test_solver_f32_forward(lv_problem):
    s32 = Solver(lv_problem, abstol=1e-5, reltol=1e-5, dtype=np.float32)
    s32.set_params_dict(PARAMS)
    assert s32._params.dtype == np.float32
    assert not s32._native_eligible()  # native realtype is f64-only
    ys = s32.solve(0.0, TVALS, Y0)
    assert ys.dtype == np.float32
    ref = _f64_reference(lv_problem)
    assert np.max(np.abs(ys - ref)) < 2e-3 * np.max(np.abs(ref))
    # buffers come out in the working dtype
    buf = s32.make_output_buffers(TVALS)
    assert buf.dtype == np.float32


def test_solver_f32_batched(lv_problem):
    s32 = Solver(lv_problem, abstol=1e-5, reltol=1e-5, dtype=np.float32)
    s32.set_params_dict(PARAMS)
    y0b = np.array([[10.0, 2.0], [8.0, 3.0]], np.float32)
    ys = s32.solve(0.0, TVALS, y0b)
    assert ys.dtype == np.float32
    ref = _f64_reference(lv_problem)
    assert np.max(np.abs(ys[0] - ref)) < 2e-3 * np.max(np.abs(ref))


def test_solver_f32_forward_sens(lv_problem):
    s32 = Solver(
        lv_problem,
        abstol=1e-5,
        reltol=1e-5,
        sens_mode="simultaneous",
        dtype=np.float32,
    )
    s32.set_params_dict(PARAMS)
    ys, sens = s32.solve(0.0, TVALS, Y0)
    assert ys.dtype == np.float32 and sens.dtype == np.float32
    s64 = Solver(
        lv_problem, abstol=1e-10, reltol=1e-10, sens_mode="simultaneous",
        native_single=False,
    )
    s64.set_params_dict(PARAMS)
    ys64, sens64 = s64.solve(0.0, TVALS, Y0)
    scale = np.max(np.abs(sens64))
    assert np.max(np.abs(sens - sens64)) < 5e-3 * scale


def test_adjoint_solver_f32_gradient(lv_problem):
    # same-gate structure as tests/test_f32_mode.py's adjoint test: the
    # f32 gradient must agree with the f64 reference gradient to f32 slack
    a32 = AdjointSolver(
        lv_problem,
        abstol=1e-5,
        reltol=1e-5,
        adjoint_abstol=1e-5,
        adjoint_reltol=1e-5,
        checkpoint_n=4096,
        dtype=np.float32,
    )
    a32.set_params_dict(PARAMS)
    assert not a32._native_adj_eligible()
    ys = a32.solve_forward(0.0, TVALS, Y0)
    assert ys.dtype == np.float32
    grads = np.zeros((len(TVALS), 2), np.float32)
    grads[-1, 0] = 1.0  # dL = d hares(t_end)
    quad32, lam32 = a32.solve_backward(TVALS[-1], 0.0, TVALS, grads)
    assert np.asarray(quad32).dtype == np.float32

    a64 = AdjointSolver(
        lv_problem, abstol=1e-10, reltol=1e-10, checkpoint_n=4096,
        native_single=False,
    )
    a64.set_params_dict(PARAMS)
    a64.solve_forward(0.0, TVALS, Y0)
    quad64, lam64 = a64.solve_backward(
        TVALS[-1], 0.0, TVALS, grads.astype(np.float64)
    )
    scale = max(np.max(np.abs(np.asarray(quad64))), 1.0)
    assert np.max(np.abs(np.asarray(quad32) - np.asarray(quad64))) < 5e-3 * scale
    assert np.max(np.abs(np.asarray(lam32) - np.asarray(lam64))) < 5e-3 * max(
        np.max(np.abs(np.asarray(lam64))), 1.0
    )


def test_f32_requires_representable_tolerances(lv_problem):
    with pytest.raises(ValueError, match="float32 precision"):
        Solver(lv_problem, dtype=np.float32)  # default 1e-10 is below f32
    with pytest.raises(ValueError, match="float32 precision"):
        AdjointSolver(lv_problem, dtype=np.float32)
    with pytest.raises(ValueError, match="float32 or float64"):
        Solver(lv_problem, dtype=np.int32)


def _lv_rhs(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


def test_f32_solver_pickles():
    import pickle

    # module-level rhs: the solver pickles by config (reference
    # solver.py:319-324 analog) so the rhs callable must be picklable
    problem = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=_lv_rhs,
        derivative_params=[("alpha",), ("beta",)],
    )
    s = Solver(problem, abstol=1e-5, reltol=1e-5, dtype=np.float32)
    s.set_params_dict(PARAMS)
    s2 = pickle.loads(pickle.dumps(s))
    assert s2._dtype == np.float32
    ys = s2.solve(0.0, TVALS, Y0)
    assert ys.dtype == np.float32
