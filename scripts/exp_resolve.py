"""Measure the backsolve ('resolve') adjoint vs the Hermite-checkpoint one:
end-to-end grad step time, backward steps, and gradient agreement."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn


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

RTOL = 1e-8
TN = 21
B = 10000
tvals = jnp.linspace(1.0, 10.0, TN)
p_fix = jnp.array([1.0, 0.4])

rng = np.random.default_rng(42)
y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))))
p_subs = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))))

outs = {}
for mode, keep in (("hermite", 1), ("resolve", 1), ("resolve", 3)):
    solve = make_batched_solve_fn(
        problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=RTOL, atol=RTOL),
        adjoint_options=BDFOptions(rtol=RTOL, atol=RTOL, inject_keep_order=keep),
        checkpoint_n=384,
        method="ADAMS",
        adjoint_interpolation=mode,
    )

    def grad_step(y0s, p_subs, solve=solve):
        def loss(y0s, p_subs):
            ys = solve(0.0, y0s, p_subs, p_fix, tvals)
            return jnp.sum(ys**2)

        return jax.grad(loss, argnums=(0, 1))(y0s, p_subs)

    f = jax.jit(grad_step)
    gy, gp = f(y0s, p_subs)
    jax.block_until_ready(gy)
    t0 = time.perf_counter()
    for _ in range(3):
        gy, gp = f(y0s, p_subs)
        jax.block_until_ready(gy)
    dt = (time.perf_counter() - t0) / 3
    outs[(mode, keep)] = (gy, gp)
    nan_ct = int(jnp.sum(~jnp.isfinite(gy[:, 0])))
    if (mode, keep) == ("hermite", 1):
        base = (gy, gp)
        rel = 0.0
    else:
        rel = max(
            float(jnp.nanmax(jnp.abs(gy - base[0]) / (jnp.abs(base[0]) + 1e-2))),
            float(jnp.nanmax(jnp.abs(gp - base[1]) / (jnp.abs(base[1]) + 1e-2))),
        )
    print(
        f"{mode:8s} keep={keep}  grad step {dt*1e3:7.1f} ms -> {B/dt:7.0f} grads/s"
        f"  nan {nan_ct}  max rel vs hermite {rel:.2e}"
    )
