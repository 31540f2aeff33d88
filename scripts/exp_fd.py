"""Arbitrate hermite vs resolve adjoint accuracy with central finite
differences of a tight scipy LSODA solve on the worst-disagreement lanes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp as scipy_solve

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
B = 256
tvals_np = np.linspace(1.0, 10.0, TN)
tvals = jnp.asarray(tvals_np)
p_fix = jnp.array([1.0, 0.4])

rng = np.random.default_rng(42)
y0s_np = np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2)))
p_subs_np = np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((B, 2)))
y0s = jnp.asarray(y0s_np)
p_subs = jnp.asarray(p_subs_np)

grads = {}
for mode in ("hermite", "resolve"):
    solve = make_batched_solve_fn(
        problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=RTOL, atol=RTOL),
        adjoint_options=BDFOptions(rtol=RTOL, atol=RTOL),
        checkpoint_n=384,
        method="ADAMS",
        adjoint_interpolation=mode,
    )

    def loss(y0s, p_subs, solve=solve):
        ys = solve(0.0, y0s, p_subs, p_fix, tvals)
        return jnp.sum(ys**2)

    gy, gp = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0s, p_subs)
    grads[mode] = (np.asarray(gy), np.asarray(gp))

# worst-disagreement lanes
dy = np.abs(grads["hermite"][0] - grads["resolve"][0]) / (np.abs(grads["hermite"][0]) + 1e-2)
dp = np.abs(grads["hermite"][1] - grads["resolve"][1]) / (np.abs(grads["hermite"][1]) + 1e-2)
worst = np.argsort(-np.maximum(dy.max(1), dp.max(1)))[:4]
print("worst lanes:", worst, "rel diffs:", np.maximum(dy.max(1), dp.max(1))[worst])


def scipy_loss(y0, psub):
    p = dict(alpha=psub[0], beta=psub[1], gamma=1.0, delta=0.4)

    def f(t, y):
        return [
            p["alpha"] * y[0] - p["beta"] * y[1] * y[0],
            p["delta"] * y[0] * y[1] - p["gamma"] * y[1],
        ]

    sol = scipy_solve(
        f, (0.0, 10.0), y0, t_eval=tvals_np, rtol=1e-12, atol=1e-12, method="LSODA"
    )
    return float(np.sum(sol.y**2))


for lane in worst:
    y0 = y0s_np[lane].copy()
    ps = p_subs_np[lane].copy()
    fd_y = np.zeros(2)
    fd_p = np.zeros(2)
    for j in range(2):
        e = 1e-6 * max(1.0, abs(y0[j]))
        yp, ym = y0.copy(), y0.copy()
        yp[j] += e
        ym[j] -= e
        fd_y[j] = (scipy_loss(yp, ps) - scipy_loss(ym, ps)) / (2 * e)
        e = 1e-6 * max(1.0, abs(ps[j]))
        pp, pm = ps.copy(), ps.copy()
        pp[j] += e
        pm[j] -= e
        fd_p[j] = (scipy_loss(y0, pp) - scipy_loss(y0, pm)) / (2 * e)
    for mode in ("hermite", "resolve"):
        gy, gp = grads[mode]
        ry = np.max(np.abs(gy[lane] - fd_y) / (np.abs(fd_y) + 1e-2))
        rp = np.max(np.abs(gp[lane] - fd_p) / (np.abs(fd_p) + 1e-2))
        print(f"lane {lane} {mode:8s} rel err vs FD: dy0 {ry:.2e}  dp {rp:.2e}")
