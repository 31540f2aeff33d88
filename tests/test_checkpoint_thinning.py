"""Bounded-checkpoint thinning: checkpoint_n << accepted steps must still
produce correct gradients (FD-checked against a large-buffer run), not NaN —
the CVODEA bounded-buffer recovery analog (VERDICT round 1, item 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.adjoint import adjoint_backward, adjoint_backward_batched
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


def _run_batched(problem, save_steps, thinning=True):
    rhs = problem.make_rhs()
    jac = problem.make_jac_dense()
    B = 4
    rng = np.random.default_rng(7)
    y0 = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.2 * rng.standard_normal((B, 2))))
    p = jnp.asarray(
        np.array([1.0, 0.3, 1.0, 0.4]) * (1 + 0.2 * np.abs(rng.standard_normal((B, 4))))
    )
    grads = jnp.ones((B, TVALS.shape[0], 2))
    opts = BDFOptions(
        rtol=1e-8, atol=1e-8, save_steps=save_steps, checkpoint_thinning=thinning
    )
    res = bdf_solve_batched(rhs, jac, 0.0, y0, p, TVALS, opts)
    assert np.asarray(res.status == 0).all()
    adj = adjoint_backward_batched(
        problem.make_adjoint_rhs(),
        problem.make_adjoint_jac_dense(),
        problem.make_adjoint_quad_rhs(),
        res.saved,
        0.0,
        TVALS,
        grads,
        p,
        2,
        BDFOptions(rtol=1e-10, atol=1e-10),
    )
    return res, adj


def test_batched_thinning_small_buffer_correct_grads(lv_problem):
    res_ref, adj_ref = _run_batched(lv_problem, 4096)
    n_steps = int(np.asarray(res_ref.stats["n_steps"]).max())
    assert n_steps > 60
    # buffer 4x smaller than the step count -> at least two thinning levels
    res, adj = _run_batched(lv_problem, max(16, n_steps // 4))
    assert not np.asarray(res.saved["overflow"]).any()
    assert np.isfinite(np.asarray(adj.lamda)).all()
    # graceful degradation, not exactness: each thinning level doubles the
    # Hermite node spacing (~16x interpolation error per level).  Two levels
    # measured ~1.6e-2 worst-element relative error — usable gradients where
    # the old behavior was all-NaN.  (CVODES re-integrates sub-intervals
    # instead, trading time for accuracy; docs/limitations.md documents the
    # difference and the checkpoint_n knob.)
    np.testing.assert_allclose(
        np.asarray(adj.lamda), np.asarray(adj_ref.lamda), rtol=5e-2, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(adj.quad), np.asarray(adj_ref.quad), rtol=5e-2, atol=1e-6
    )


def test_batched_thinning_keeps_rows_sorted(lv_problem):
    res, _ = _run_batched(lv_problem, 32)
    ts = np.asarray(res.saved["t"])
    n_saved = np.asarray(res.saved["n_saved"])
    for b in range(ts.shape[1]):
        col = ts[: n_saved[b], b]
        assert np.isfinite(col).all()
        assert (np.diff(col) > 0).all()


def test_single_thinning_matches_large_buffer(lv_problem):
    rhs = lv_problem.make_rhs()
    jac = lv_problem.make_jac_dense()
    y0 = jnp.asarray([10.0, 2.0])
    p = jnp.asarray([1.0, 0.3, 1.0, 0.4])
    grads = jnp.ones((TVALS.shape[0], 2))

    def run(save_steps):
        opts = BDFOptions(rtol=1e-8, atol=1e-8, save_steps=save_steps)
        res = bdf_solve(rhs, jac, 0.0, y0, p, TVALS, opts)
        assert int(res.status) == 0
        saved = {
            "t": res.saved["t"],
            "y": res.saved["y"],
            "f": res.saved["f"],
            "n_saved": res.saved["n_saved"],
            "overflow": res.saved["overflow"],
        }
        adj = adjoint_backward(
            lv_problem.make_adjoint_rhs(),
            lv_problem.make_adjoint_jac_dense(),
            lv_problem.make_adjoint_quad_rhs(),
            saved,
            0.0,
            TVALS,
            grads,
            p,
            2,
            BDFOptions(rtol=1e-10, atol=1e-10),
        )
        return res, adj

    res_ref, adj_ref = run(4096)
    n_steps = int(res_ref.stats["n_steps"])
    res, adj = run(max(16, n_steps // 4))
    assert not bool(res.saved["overflow"])
    assert np.isfinite(np.asarray(adj.lamda)).all()
    np.testing.assert_allclose(
        np.asarray(adj.lamda), np.asarray(adj_ref.lamda), rtol=5e-3, atol=1e-6
    )


def test_legacy_mode_still_overflows(lv_problem):
    """checkpoint_thinning=False preserves the round-1 clamp semantics."""
    res, adj = _run_batched(lv_problem, 16, thinning=False)
    assert np.asarray(res.saved["overflow"]).all()
    assert np.isnan(np.asarray(adj.lamda)).all()


def test_thinning_records_final_step(lv_problem):
    """The recording must end at the last accepted step: the rolling tail
    row covers the steps after the last stride-aligned record, where the
    backward solve starts (code-review round 2)."""
    rhs = lv_problem.make_rhs()
    jac = lv_problem.make_jac_dense()
    y0 = jnp.asarray([10.0, 2.0])
    p = jnp.asarray([1.0, 0.3, 1.0, 0.4])
    for save_steps in (16, 32, 64):
        opts = BDFOptions(rtol=1e-8, atol=1e-8, save_steps=save_steps)
        res = bdf_solve(rhs, jac, 0.0, y0, p, TVALS, opts)
        assert int(res.status) == 0
        ns = int(res.saved["n_saved"])
        t_last = float(res.saved["t"][ns - 1])
        assert t_last == float(res.stats["final_time"])

    # batched: each lane's sorted recording ends at its own final time
    B = 3
    y0b = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.1 * np.arange(B))[:, None])
    pb = jnp.tile(p, (B, 1))
    res = bdf_solve_batched(
        rhs, jac, 0.0, y0b, pb, TVALS,
        BDFOptions(rtol=1e-8, atol=1e-8, save_steps=24),
    )
    for b in range(B):
        ns = int(np.asarray(res.saved["n_saved"])[b])
        t_last = float(np.asarray(res.saved["t"])[ns - 1, b])
        assert t_last == float(np.asarray(res.stats["final_time"])[b])
