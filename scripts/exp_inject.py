"""Measure inject_keep_order effect: backward steps, time, gradient accuracy."""
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
B = 10000
tvals = jnp.linspace(1.0, 10.0, TN)
fwd_opts = BDFOptions(rtol=RTOL, atol=RTOL, save_steps=CKPT)

rng = np.random.default_rng(42)
y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))))
p_subs = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))))
p_fix = jnp.array([1.0, 0.4])
p = jnp.concatenate([p_subs, jnp.broadcast_to(p_fix, (B, 2))], axis=1)
grads = jnp.ones((B, TN, 2))

fwd = jax.jit(lambda y0, p: adams_solve_batched(rhs, 0.0, y0, p, tvals, fwd_opts))
res = fwd(y0s, p)
jax.block_until_ready(res.ys)
saved = res.saved

results = {}
for keep in (1, 2, 3, 5, 8):
    adj_opts = BDFOptions(rtol=RTOL, atol=RTOL, inject_keep_order=keep)
    bwd = jax.jit(
        lambda saved, g, p, o=adj_opts: adjoint_backward_batched(
            adjoint_rhs, adjoint_jac, quad_rhs, saved, 0.0, tvals, g, p, 2,
            o, method="ADAMS",
        )
    )
    adj = bwd(saved, grads, p)
    jax.block_until_ready(adj.lamda)
    t0 = time.perf_counter()
    for _ in range(3):
        adj = bwd(saved, grads, p)
        jax.block_until_ready(adj.lamda)
    t_bwd = (time.perf_counter() - t0) / 3
    nst = int(jnp.max(adj.stats["n_backward_steps"]))
    nok = int(jnp.sum(adj.status == 0))
    results[keep] = (adj.lamda, adj.quad)
    if keep == 1:
        base_l, base_q = adj.lamda, adj.quad
        rel_l = rel_q = 0.0
    else:
        rel_l = float(jnp.max(jnp.abs(adj.lamda - base_l) / (jnp.abs(base_l) + 1e-3)))
        rel_q = float(jnp.max(jnp.abs(adj.quad - base_q) / (jnp.abs(base_q) + 1e-3)))
    print(
        f"keep={keep}  bwd {t_bwd*1e3:7.1f} ms  max_steps {nst:4d}  ok {nok}/{B}  "
        f"max rel diff vs keep=1: lam {rel_l:.2e} quad {rel_q:.2e}"
    )
