"""Split timing for the resolve-mode grad step at B=10k."""
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
TN = 21
B = 10000
tvals = jnp.linspace(1.0, 10.0, TN)
opts = BDFOptions(rtol=RTOL, atol=RTOL)

rng = np.random.default_rng(42)
y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))))
p_subs = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))))
p_fix = jnp.array([1.0, 0.4])
p = jnp.concatenate([p_subs, jnp.broadcast_to(p_fix, (B, 2))], axis=1)
grads = jnp.ones((B, TN, 2))

fwd = jax.jit(lambda y0, p: adams_solve_batched(rhs, 0.0, y0, p, tvals, opts))
res = fwd(y0s, p)
jax.block_until_ready(res.ys)
t0 = time.perf_counter()
for _ in range(3):
    res = fwd(y0s, p)
    jax.block_until_ready(res.ys)
t_fwd = (time.perf_counter() - t0) / 3

y_end = res.ys[:, -1, :]

print(
    f"fwd {t_fwd*1e3:7.1f} ms ({int(res.stats['n_attempts'])} attempts, "
    f"max {int(jnp.max(res.stats['n_steps']))} steps)"
)

for keep in (1, 2, 3, 5, 8):
    kopts = opts._replace(inject_keep_order=keep)
    bwd = jax.jit(
        lambda g, p, y_end, o=kopts: adjoint_backward_batched(
            adjoint_rhs, adjoint_jac, quad_rhs, None, 0.0, tvals, g, p, 2,
            o, method="ADAMS", interpolation="resolve", rhs=rhs, y_end=y_end,
        )
    )
    adj = bwd(grads, p, y_end)
    jax.block_until_ready(adj.lamda)
    t0 = time.perf_counter()
    for _ in range(3):
        adj = bwd(grads, p, y_end)
        jax.block_until_ready(adj.lamda)
    t_bwd = (time.perf_counter() - t0) / 3
    nok = int(jnp.sum(adj.status == 0))
    print(
        f"keep={keep} bwd {t_bwd*1e3:7.1f} ms "
        f"(max {int(jnp.max(adj.stats['n_backward_steps']))} steps, ok {nok}) "
        f"total {(t_fwd+t_bwd)*1e3:7.1f} ms -> {B/(t_fwd+t_bwd):7.0f} grads/s"
    )
