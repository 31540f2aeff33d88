"""Perf diagnostics for the north-star bench: forward/backward split,
attempt counts, and batch-size scaling (overhead-bound vs bandwidth-bound)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem
from sunode_tpu.ops.adams_batched import adams_solve_batched
from sunode_tpu.adjoint import adjoint_backward_batched


def lv(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


problem = SympyProblem(
    params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
    states={"hares": (), "lynx": ()},
    rhs_sympy=lv,
    derivative_params=[("alpha",), ("beta",)],
)

rhs = problem.make_rhs()
adjoint_rhs = problem.make_adjoint_rhs()
adjoint_jac = problem.make_adjoint_jac_dense()
quad_rhs = problem.make_adjoint_quad_rhs()

RTOL = 1e-8
CKPT = 384
TN = 21
tvals = jnp.linspace(1.0, 10.0, TN)
opts = BDFOptions(rtol=RTOL, atol=RTOL)
fwd_opts = opts._replace(save_steps=CKPT)
adj_opts = BDFOptions(rtol=RTOL, atol=RTOL)


def bench_one(B, reps=3):
    rng = np.random.default_rng(42)
    y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))))
    p_subs = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))))
    p_fix = jnp.array([1.0, 0.4])
    p = jnp.concatenate([p_subs, jnp.broadcast_to(p_fix, (B, 2))], axis=1)
    grads = jnp.ones((B, TN, 2))

    fwd = jax.jit(lambda y0, p: adams_solve_batched(rhs, 0.0, y0, p, tvals, fwd_opts))
    res = fwd(y0s, p)
    jax.block_until_ready(res.ys)
    t0 = time.perf_counter()
    for _ in range(reps):
        res = fwd(y0s, p)
        jax.block_until_ready(res.ys)
    t_fwd = (time.perf_counter() - t0) / reps

    saved = res.saved

    bwd = jax.jit(
        lambda saved, g, p: adjoint_backward_batched(
            adjoint_rhs, adjoint_jac, quad_rhs, saved, 0.0, tvals, g, p, 2,
            adj_opts, method="ADAMS",
        )
    )
    adj = bwd(saved, grads, p)
    jax.block_until_ready(adj.lamda)
    t0 = time.perf_counter()
    for _ in range(reps):
        adj = bwd(saved, grads, p)
        jax.block_until_ready(adj.lamda)
    t_bwd = (time.perf_counter() - t0) / reps

    n_fwd_steps = int(jnp.max(res.stats["n_steps"]))
    n_bwd_steps = int(jnp.max(adj.stats["n_backward_steps"]))
    # attempts: max 'it' isn't exposed for backward; report fwd attempts
    n_fwd_att = int(res.stats["n_attempts"])
    print(
        f"B={B:6d}  fwd {t_fwd*1e3:8.1f} ms ({n_fwd_att} attempts, "
        f"{t_fwd/n_fwd_att*1e6:6.0f} us/att, max {n_fwd_steps} steps)   "
        f"bwd {t_bwd*1e3:8.1f} ms (max {n_bwd_steps} steps)   "
        f"total {(t_fwd+t_bwd)*1e3:8.1f} ms -> {B/(t_fwd+t_bwd):8.0f} grads/s"
    )
    return t_fwd, t_bwd


for B in (2500, 10000, 20000):
    bench_one(B)
