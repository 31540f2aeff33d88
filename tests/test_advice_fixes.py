"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. ``_searchsorted_b`` binary-search fallback ran one iteration too few for
   power-of-two table sizes > 8192, returning -1 where numpy gives 0.
2. Once the shared attempt counter clamps to the last checkpoint slot, a
   REJECTED attempt used to pad (+inf) over a lane's previously-valid row
   without flagging overflow — silently-NaN gradients with status 0.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sunode_tpu.adjoint import _searchsorted_b, adjoint_backward_batched
from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.ops.bdf_batched import bdf_solve_batched
from sunode_tpu.symode import SympyProblem


def test_searchsorted_pow2_regression():
    # S = 16384 is a power of two > the 8192 one-pass threshold, forcing the
    # binary-search path that was off by one iteration.
    S, B = 16384, 4
    rng = np.random.default_rng(0)
    n_valid = np.array([1, 7, S // 2, S])
    ts = np.full((S, B), np.inf)
    for b in range(B):
        ts[: n_valid[b], b] = np.sort(rng.uniform(0.0, 10.0, n_valid[b]))
    # include queries below the first entry (expected -1), at entries, above
    queries = np.array([ts[0, b] - 1.0 for b in range(B)]), np.array(
        [ts[0, b] for b in range(B)]
    ), np.array([ts[min(n_valid[b], S) - 1, b] + 1.0 for b in range(B)]), rng.uniform(
        0.0, 10.0, B
    )
    for t in queries:
        got = np.asarray(_searchsorted_b(jnp.asarray(ts), jnp.asarray(t)))
        want = np.array(
            [np.searchsorted(ts[:, b], t[b], side="right") - 1 for b in range(B)]
        )
        np.testing.assert_array_equal(got, want)


def _lv_problem():
    def lv(t, y, p):
        return {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        }

    return SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lv,
        derivative_params=[("alpha",), ("beta",)],
    )


def test_no_silent_grad_poisoning_near_checkpoint_clamp():
    """For every checkpoint-buffer size: each lane must either be flagged
    overflow (NaN by contract) or produce gradients matching a large-buffer
    reference run — never silently-wrong/NaN with overflow False."""
    problem = _lv_problem()
    rhs = problem.make_rhs()
    jac = problem.make_jac_dense()
    aj_rhs = problem.make_adjoint_rhs()
    aj_jac = problem.make_adjoint_jac_dense()
    q_rhs = problem.make_adjoint_quad_rhs()

    B = 6
    rng = np.random.default_rng(7)
    y0 = jnp.asarray(
        np.array([10.0, 2.0]) * (1 + 0.3 * rng.standard_normal((B, 2)))
    )
    # widely varying difficulty -> widely varying step counts across lanes
    p = jnp.asarray(
        np.array([1.0, 0.3, 1.0, 0.4])
        * (1 + 0.4 * np.abs(rng.standard_normal((B, 4))))
    )
    tvals = jnp.linspace(1.0, 12.0, 5)
    grads = jnp.ones((B, tvals.shape[0], 2))
    opts = BDFOptions(rtol=1e-8, atol=1e-8)

    def run(save_steps):
        # legacy clamp semantics under test (checkpoint_thinning=True never
        # overflows here — covered by tests/test_checkpoint_thinning.py)
        res = bdf_solve_batched(
            rhs, jac, 0.0, y0, p, tvals,
            opts._replace(save_steps=save_steps, checkpoint_thinning=False),
        )
        assert np.asarray(res.status == 0).all()
        adj = adjoint_backward_batched(
            aj_rhs, aj_jac, q_rhs, res.saved, 0.0, tvals, grads, p, 2,
            BDFOptions(rtol=1e-10, atol=1e-10),
        )
        return res.saved, adj

    saved_ref, adj_ref = run(4096)
    assert not np.asarray(saved_ref["overflow"]).any()
    lam_ref = np.asarray(adj_ref.lamda)
    n_steps_max = int(np.asarray(saved_ref["n_saved"]).max())

    # buffer sizes straddling each lane's step count so some lanes overflow
    # exactly at / just past the clamped slot
    for S in sorted({n_steps_max // 2, n_steps_max - 2, n_steps_max - 1,
                     n_steps_max, n_steps_max + 2}):
        if S < 4:
            continue
        saved, adj = run(S)
        overflow = np.asarray(saved["overflow"])
        n_saved = np.asarray(saved["n_saved"])
        ts = np.asarray(saved["t"])
        lam = np.asarray(adj.lamda)
        for b in range(B):
            if overflow[b]:
                assert np.isnan(lam[b]).all()
            else:
                # every accepted step must still own a finite row
                assert np.isfinite(ts[:, b]).sum() == n_saved[b], (S, b)
                np.testing.assert_allclose(
                    lam[b], lam_ref[b], rtol=1e-5, atol=1e-9
                )
