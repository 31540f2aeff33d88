"""Transition-matrix adjoint end-to-end timing at B=10k."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

problem = SympyProblem(
    params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
    states={"hares": (), "lynx": ()},
    rhs_sympy=lambda t, y, p: {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    },
    derivative_params=[("alpha",), ("beta",)],
)
RTOL, TN, B = 1e-8, 21, 10000
tvals = jnp.linspace(1.0, 10.0, TN)
p_fix = jnp.array([1.0, 0.4])
rng = np.random.default_rng(42)
y0s = jnp.asarray(np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2))))
p_subs = jnp.asarray(np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2))))

for mode in ("transition", "resolve"):
    solve = make_batched_solve_fn(
        problem, derivatives="adjoint",
        options=BDFOptions(rtol=RTOL, atol=RTOL),
        adjoint_options=BDFOptions(rtol=RTOL, atol=RTOL),
        method="ADAMS", adjoint_interpolation=mode,
    )
    def gs(y0s, p_subs, solve=solve):
        def loss(y0s, p_subs):
            return jnp.sum(solve(0.0, y0s, p_subs, p_fix, tvals) ** 2)
        return jax.grad(loss, argnums=(0, 1))(y0s, p_subs)
    f = jax.jit(gs)
    gy, gp = f(y0s, p_subs)
    jax.block_until_ready(gy)
    t0 = time.perf_counter()
    for _ in range(3):
        gy, gp = f(y0s, p_subs)
        jax.block_until_ready(gy)
    dt = (time.perf_counter() - t0) / 3
    nan_ct = int(jnp.sum(~jnp.isfinite(gy[:, 0])))
    print(f"{mode:10s} grad step {dt*1e3:7.1f} ms -> {B/dt:7.0f} grads/s  nan {nan_ct}")
