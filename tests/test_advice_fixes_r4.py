"""Regression tests for the round-4 advisor findings.

1. (medium) A MAX_STEPS resume must MERGE non-terminal root records across
   segments instead of replacing stats wholesale — CVODES accumulates root
   reports across CVode() resumes.
2. (low) roots beyond root_cap: the buffers hold the FIRST root_cap roots
   and n_roots keeps counting (truncation signal), instead of the last
   slot being silently overwritten.
3. (low) root_directions is validated eagerly (shape + value set), like
   CVodeSetRootDirection.
4. (low) _root_scan is the single shared localization helper (no inline
   duplicate in bdf_solve's body).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve, STATUS


def _osc_rhs(t, y, p):
    return {"a": y.b, "b": -1.0 * y.a}


def _osc_root(t, y, p):
    return [y.a]


def _osc_solver(**kw):
    from sunode_tpu.symode import SympyProblem
    from sunode_tpu.solver import Solver

    prob = SympyProblem(
        params={"mu": ()},
        states={"a": (), "b": ()},
        rhs_sympy=_osc_rhs,
        derivative_params=[("mu",)],
    )
    s = Solver(prob, roots=_osc_root, root_terminal=False, **kw)
    s.set_params_dict({"mu": 1.0})
    return s


def test_resume_merges_root_records_across_segments():
    # cos t has roots at pi/2, 3pi/2, 5pi/2 in [0, 10].  With a tiny
    # max_steps budget the solve is interrupted and resumed mid-interval;
    # the merged stats must still carry ALL three roots in order.
    # native_single=False pins the JAX route: this test gates the JAX-side
    # resume/merge machinery specifically (the native C++ integrator never
    # resumes; its root reporting is covered below).
    solver = _osc_solver(
        abstol=1e-10, reltol=1e-10, max_steps=40, native_single=False
    )
    tvals = np.linspace(0.0, 10.0, 11)
    ys = solver.solve(0.0, tvals, {"a": 1.0, "b": 0.0})
    st = solver.last_stats
    assert int(st["n_resumes"]) >= 1, "test needs at least one resume"
    assert int(st["n_roots"]) == 3
    expect = np.array([np.pi / 2, 3 * np.pi / 2, 5 * np.pi / 2])
    assert np.allclose(np.asarray(st["roots_t"][:3]), expect, atol=1e-7)
    assert list(np.asarray(st["roots_found"][:3, 0])) == [-1, 1, -1]
    assert np.allclose(np.asarray(ys[:, 0]), np.cos(tvals), atol=1e-7)


def test_native_route_reports_roots_and_unified_stats_surface():
    # A symbolic-roots B=1 solve is native-eligible since the round-4
    # routing change; the native path must report the same roots AND carry
    # the same stats keys (n_resumes/n_steps_total) as the JAX path.
    solver = _osc_solver(abstol=1e-10, reltol=1e-10)
    tvals = np.linspace(0.0, 10.0, 11)
    ys = solver.solve(0.0, tvals, {"a": 1.0, "b": 0.0})
    st = solver.last_stats
    assert int(st["n_resumes"]) == 0
    assert int(st["n_steps_total"]) == int(st["n_steps"])
    assert int(st["n_roots"]) == 3
    expect = np.array([np.pi / 2, 3 * np.pi / 2, 5 * np.pi / 2])
    assert np.allclose(np.asarray(st["roots_t"][:3]), expect, atol=1e-7)
    assert np.allclose(np.asarray(ys[:, 0]), np.cos(tvals), atol=1e-7)


def test_resume_merges_root_records_batched():
    solver = _osc_solver(abstol=1e-10, reltol=1e-10, max_steps=40)
    tvals = np.linspace(0.0, 10.0, 11)
    y0b = np.array([[1.0, 0.0], [0.5, 0.5]])
    solver.solve(0.0, tvals, y0b)
    st = solver.last_stats
    assert int(np.max(st["n_resumes"])) >= 1
    # lane 0: cos t -> 3 roots; lane 1: 0.5 cos + 0.5 sin = cos(t - pi/4)
    # scaled -> roots at 3pi/4, 7pi/4, 11pi/4: also 3
    assert list(np.asarray(st["n_roots"])) == [3, 3]
    assert np.allclose(
        np.asarray(st["roots_t"][0, :3]),
        [np.pi / 2, 3 * np.pi / 2, 5 * np.pi / 2],
        atol=1e-7,
    )
    assert np.allclose(
        np.asarray(st["roots_t"][1, :3]),
        [3 * np.pi / 4, 7 * np.pi / 4, 11 * np.pi / 4],
        atol=1e-7,
    )


def _rhs(t, y, p):
    return jnp.array([y[1], -y[0]])


def _jac(t, y, p):
    return jnp.array([[0.0, 1.0], [-1.0, 0.0]])


def test_root_cap_keeps_first_roots_and_counts_past_cap():
    # cos t has 6 roots in [0, 20]; root_cap=4 must keep the FIRST four
    # and report n_roots=6 (truncation signal)
    opts = BDFOptions(rtol=1e-10, atol=1e-10)
    res = jax.jit(
        lambda y0: bdf_solve(
            _rhs, _jac, 0.0, y0, jnp.zeros(1), jnp.linspace(0.0, 20.0, 21),
            opts, root_fn=lambda t, y, p: y[:1], root_terminal=False,
            root_cap=4,
        )
    )(jnp.array([1.0, 0.0]))
    assert int(res.status) == STATUS["SUCCESS"]
    assert int(res.stats["n_roots"]) == 6
    expect = (2 * np.arange(4) + 1) * np.pi / 2
    assert np.allclose(np.asarray(res.stats["roots_t"]), expect, atol=1e-7)


@pytest.mark.parametrize(
    "bad, match",
    [([1, 0], "one entry per root_fn component"), ([2], "entries must be")],
)
def test_root_directions_validated_eagerly(bad, match):
    with pytest.raises(ValueError, match=match):
        bdf_solve(
            _rhs, _jac, 0.0, jnp.array([1.0, 0.0]), jnp.zeros(1),
            jnp.linspace(0.0, 3.0, 4), BDFOptions(),
            root_fn=lambda t, y, p: y[:1], root_directions=bad,
        )


def test_root_scan_is_shared_not_duplicated():
    import inspect
    from sunode_tpu.ops import bdf as bdf_mod

    src = inspect.getsource(bdf_mod.bdf_solve)
    assert "_root_scan(" in src
    # the old inline duplicate's distinctive per-component bisection is gone
    assert "jnp.diagonal" not in src
