"""Per-lane observation grids in the batch-native cores (VERDICT r4 item 8).

Real datasets are not observed on a shared grid: each chain/subject has its
own measurement times.  ``tvals`` may now be (B, n_t) — each lane emits on
its own ascending grid while the integrator stays lockstep SoA (the
emission loop's per-lane index gathers from the lane's own time column).
Pad ragged grids with copies of the final time.

The reference inherits CVODES's one-grid-per-solver-instance model
(/root/reference/sunode/solver.py:467-527 loops a single tvals array); its
users run one process per chain instead.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.adams_batched import adams_solve_batched
from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched
from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem

B = 4
OPTS = BDFOptions(rtol=1e-9, atol=1e-11)


def _rhs(t, y, p):
    return jnp.array([p[0] * y[0] - 0.3 * y[0] * y[1],
                      0.4 * y[0] * y[1] - y[1]])


def _jac(t, y, p):
    return jnp.array([
        [p[0] - 0.3 * y[1], -0.3 * y[0]],
        [0.4 * y[1], 0.4 * y[0] - 1.0],
    ])


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    y0 = np.tile([10.0, 5.0], (B, 1)) + rng.random((B, 2))
    ps = 1.0 + 0.1 * rng.random((B, 1))
    tv = np.sort(rng.uniform(0.5, 8.0, (B, 6)), axis=1)
    return jnp.asarray(y0), jnp.asarray(ps), jnp.asarray(tv)


def test_bdf_batched_per_lane_tvals_matches_vmap(inputs):
    y0, ps, tv = inputs
    res = jax.jit(
        lambda y, p, t: bdf_solve_batched(_rhs, _jac, 0.0, y, p, t, OPTS)
    )(y0, ps, tv)
    assert np.all(np.asarray(res.status) == 0)
    ys_v = jax.jit(
        jax.vmap(lambda y, p, t: bdf_solve(_rhs, _jac, 0.0, y, p, t, OPTS).ys)
    )(y0, ps, tv)
    np.testing.assert_allclose(
        np.asarray(res.ys), np.asarray(ys_v), rtol=1e-7, atol=1e-9
    )


def test_adams_batched_per_lane_tvals_matches_vmap(inputs):
    y0, ps, tv = inputs
    res = jax.jit(
        lambda y, p, t: adams_solve_batched(_rhs, 0.0, y, p, t, OPTS)
    )(y0, ps, tv)
    assert np.all(np.asarray(res.status) == 0)
    ys_v = jax.jit(
        jax.vmap(lambda y, p, t: bdf_solve(_rhs, _jac, 0.0, y, p, t, OPTS).ys)
    )(y0, ps, tv)
    np.testing.assert_allclose(
        np.asarray(res.ys), np.asarray(ys_v), rtol=1e-5, atol=1e-7
    )


def test_ragged_grid_padding_convention(inputs):
    # a lane with fewer observations pads with copies of its last time;
    # padded slots repeat the final value (harmless duplicates)
    y0, ps, _ = inputs
    tv = np.array([
        [1.0, 2.0, 3.0, 3.0, 3.0],
        [0.5, 1.5, 2.5, 3.5, 4.5],
        [2.0, 4.0, 4.0, 4.0, 4.0],
        [1.0, 1.1, 1.2, 1.3, 6.0],
    ])
    res = bdf_solve_batched(_rhs, _jac, 0.0, y0, ps, jnp.asarray(tv), OPTS)
    assert np.all(np.asarray(res.status) == 0)
    ys = np.asarray(res.ys)
    np.testing.assert_allclose(ys[0, 2], ys[0, 3], rtol=1e-12)
    np.testing.assert_allclose(ys[0, 2], ys[0, 4], rtol=1e-12)
    np.testing.assert_allclose(ys[2, 1], ys[2, 3], rtol=1e-12)


def test_solver_class_per_lane_tvals(inputs):
    prob = SympyProblem(
        params={"a": ()},
        states={"h": (), "l": ()},
        rhs_sympy=lambda t, y, p: {
            "h": p.a * y.h - 0.3 * y.h * y.l,
            "l": 0.4 * y.h * y.l - y.l,
        },
        derivative_params=[("a",)],
    )
    y0, ps, tv = inputs
    s = Solver(prob, abstol=1e-11, reltol=1e-9)
    s.set_params_dict({"a": 1.0})
    s._params = np.asarray(ps)
    ys = s.solve(0.0, np.asarray(tv), np.asarray(y0))
    assert "n_attempts" in s.last_stats  # batch-native core
    ys_ref = np.stack([
        np.asarray(
            bdf_solve(_rhs, _jac, 0.0, y0[i], ps[i], tv[i], OPTS).ys
        )
        for i in range(B)
    ])
    np.testing.assert_allclose(ys, ys_ref, rtol=1e-7, atol=1e-9)


def test_solver_per_lane_tvals_shape_validation(inputs):
    prob = SympyProblem(
        params={"a": ()},
        states={"h": (), "l": ()},
        rhs_sympy=lambda t, y, p: {"h": -p.a * y.h, "l": -y.l},
        derivative_params=[("a",)],
    )
    s = Solver(prob, abstol=1e-10, reltol=1e-8)
    s.set_params_dict({"a": 1.0})
    with pytest.raises(ValueError, match="per-lane tvals"):
        s.solve(0.0, np.ones((3, 4)), {"h": 1.0, "l": 1.0})  # unbatched y0


def test_per_lane_tvals_with_resume(inputs):
    # a tiny max_steps budget forces mid-solve resumes; the per-lane merge
    # (emitted = own-grid comparison) must still produce the right values
    prob = SympyProblem(
        params={"a": ()},
        states={"h": (), "l": ()},
        rhs_sympy=lambda t, y, p: {
            "h": p.a * y.h - 0.3 * y.h * y.l,
            "l": 0.4 * y.h * y.l - y.l,
        },
        derivative_params=[("a",)],
    )
    y0, ps, tv = inputs
    s = Solver(prob, abstol=1e-11, reltol=1e-9, max_steps=60)
    s.set_params_dict({"a": 1.0})
    s._params = np.asarray(ps)
    ys = s.solve(0.0, np.asarray(tv), np.asarray(y0))
    assert int(s.last_stats["n_resumes"]) >= 1
    ys_ref = np.stack([
        np.asarray(
            bdf_solve(_rhs, _jac, 0.0, y0[i], ps[i], tv[i], OPTS).ys
        )
        for i in range(B)
    ])
    np.testing.assert_allclose(ys, ys_ref, rtol=1e-6, atol=1e-8)


def test_per_lane_tvals_with_terminal_roots(inputs):
    # per-lane grids compose with the SoA rootfinding scan: each lane stops
    # at ITS root; outputs past it (on its own grid) are NaN
    def rhs(t, y, p):
        return jnp.array([y[1], -p[0] ** 2 * y[0]])

    def jac(t, y, p):
        return jnp.array([[0.0, 1.0], [-p[0] ** 2, 0.0]])

    w = np.array([1.0, 1.3, 0.7])
    y0 = jnp.asarray(np.tile([1.0, 0.0], (3, 1)))
    ps = jnp.asarray(w[:, None])
    # per-lane grids straddling each lane's root t* = pi/(2w)
    t_star = np.pi / (2 * w)
    tv = np.stack([np.array([0.5, 0.9, 1.5]) * ts for ts in t_star])
    res = bdf_solve_batched(
        rhs, jac, 0.0, y0, ps, jnp.asarray(tv), OPTS,
        root_fn=lambda t, y, p: y[:1],
    )
    from sunode_tpu.ops.bdf import STATUS

    assert np.all(np.asarray(res.status) == STATUS["ROOT_RETURN"])
    np.testing.assert_allclose(
        np.asarray(res.stats["roots_t"][:, 0]), t_star, atol=1e-8
    )
    ys = np.asarray(res.ys)
    # pre-root grid points emitted, post-root NaN — per lane's OWN grid
    assert np.all(np.isfinite(ys[:, :2]))
    assert np.all(np.isnan(ys[:, 2]))
    np.testing.assert_allclose(
        ys[:, 0, 0], np.cos(w * tv[:, 0]), atol=1e-8
    )
