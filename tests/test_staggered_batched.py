"""Batch-native staggered sensitivities (VERDICT r2 weak 5): the batched
core now runs CV_STAGGERED sequencing directly (per-lane state-error gating
+ cond-skipped sens RHS) instead of routing through vmap(bdf_solve)."""

import numpy as np
import jax.numpy as jnp

from sunode_tpu.symode import SympyProblem
from sunode_tpu.solver import Solver


def test_batched_staggered_matches_single():
    prob = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lambda t, y, p: {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        },
        derivative_params=[("alpha",), ("beta",)],
    )
    params = {"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4}
    tvals = np.linspace(1.0, 10.0, 5)
    rng = np.random.default_rng(0)
    B = 5
    y0b = np.array([10.0, 2.0]) * (1 + 0.1 * rng.standard_normal((B, 2)))

    s = Solver(prob, reltol=1e-8, abstol=1e-8, sens_mode="staggered")
    s.set_params_dict(params)
    ys_b, sens_b = s.solve(0.0, tvals, y0b)
    # the batch-native core must actually be in use (not the vmap fallback):
    # its stats carry the shared attempt counter
    assert "n_attempts" in s.last_stats

    for b in range(B):
        ys_1, sens_1 = s.solve(0.0, tvals, y0b[b])
        np.testing.assert_allclose(ys_b[b], ys_1, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(sens_b[b], sens_1, rtol=5e-4, atol=1e-6)
