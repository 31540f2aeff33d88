"""Post-mortem failure observability: a poisoned solve must report where it
died — (t, attempted h, order, worst-state index) of the fatal attempt — in
stats, the analog of the reference's user_data.error_* capture (ref
symode/problem.py:150-158; VERDICT round 1, item 9)."""

import numpy as np
import jax.numpy as jnp

from sunode_tpu.ops.adams import adams_solve
from sunode_tpu.ops.adams_batched import adams_solve_batched
from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.ops.bdf_batched import bdf_solve_batched


def _blowup_rhs(t, y, p):
    # finite-time blowup at t = 1/y0: forces step underflow near the pole
    return y * y


def _blowup_jac(t, y, p):
    return jnp.diag(2.0 * y)


TV = jnp.array([0.5, 2.0])  # t=2.0 is past the blowup at t=1
OPTS = BDFOptions(rtol=1e-8, atol=1e-8, max_steps=20_000)


def _check_pm(stats, status, t_blow, batched=False):
    status = np.asarray(status)
    et = np.asarray(stats["error_time"])
    eh = np.asarray(stats["error_step_size"])
    eq = np.asarray(stats["error_order"])
    ew = np.asarray(stats["error_worst_state"])
    assert (status != 0).all()
    # died while approaching the pole, with a collapsing step
    assert np.isfinite(et).all() and (et > 0.5).all() and (et <= t_blow + 0.1).all()
    assert np.isfinite(eh).all() and (eh > 0).all()
    assert (eq >= 1).all()
    assert (ew >= 0).all()


def test_bdf_single_postmortem():
    res = bdf_solve(
        _blowup_rhs, _blowup_jac, 0.0, jnp.array([1.0]), jnp.zeros(1), TV, OPTS
    )
    _check_pm(res.stats, res.status, 1.0)


def test_adams_single_postmortem():
    res = adams_solve(_blowup_rhs, 0.0, jnp.array([1.0]), jnp.zeros(1), TV, OPTS)
    _check_pm(res.stats, res.status, 1.0)


def test_bdf_batched_postmortem_mixed_lanes():
    # lane 0 blows up at t=1, lane 1 at t=1/0.25=4 (never; its solve succeeds)
    y0 = jnp.array([[1.0], [0.25]])
    res = bdf_solve_batched(
        _blowup_rhs, _blowup_jac, 0.0, y0, jnp.zeros((2, 1)), TV, OPTS
    )
    status = np.asarray(res.status)
    assert status[0] != 0 and status[1] == 0
    et = np.asarray(res.stats["error_time"])
    assert np.isfinite(et[0]) and 0.5 < et[0] <= 1.1
    # the surviving lane reports no fatal attempt
    assert np.isnan(et[1])
    assert np.asarray(res.stats["error_worst_state"])[1] == -1


def test_adams_batched_postmortem_mixed_lanes():
    y0 = jnp.array([[1.0], [0.25]])
    res = adams_solve_batched(_blowup_rhs, 0.0, y0, jnp.zeros((2, 1)), TV, OPTS)
    status = np.asarray(res.status)
    assert status[0] != 0 and status[1] == 0
    et = np.asarray(res.stats["error_time"])
    assert np.isfinite(et[0]) and 0.5 < et[0] <= 1.1
    assert np.isnan(et[1])
