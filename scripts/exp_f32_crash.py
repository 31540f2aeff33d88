"""Bisect the f32 NUTS TPU-worker crash.

f64 NUTS runs on the chip; f32 NUTS kills the TPU worker ("kernel fault")
at any chain count, while the plain jitted f32 grad (bench lv_adjoint_f32)
is fine.  This strips the sampler away piece by piece:

  stage 1: eager vjp of the f32 solve (no loop)           — sampler entry
  stage 2: leapfrog chain of 3 evals, eager               — tree body
  stage 3: lax.while_loop around the vjp (step-size search shape)
  stage 4: lax.scan around a while_loop around the vjp    — full nesting

Run: python scripts/exp_f32_crash.py [stage]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0

prob = SympyProblem(
    params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
    states={"hares": (), "lynx": ()},
    rhs_sympy=lambda t, y, p: {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    },
    derivative_params=[("alpha",), ("beta",)],
)
solve = make_batched_solve_fn(
    prob,
    derivatives="adjoint",
    options=BDFOptions(rtol=1e-6, atol=1e-6, adams_max_order=6, max_steps=2000),
    adjoint_options=BDFOptions(rtol=1e-5, atol=1e-5, adams_max_order=6, max_steps=4000),
    method="ADAMS",
    adjoint_interpolation="transition",
)
C = 8
tvals = jnp.linspace(1.0, 10.0, 12).astype(jnp.float32)
p_fix = jnp.asarray([1.0, 0.4], jnp.float32)
y0s = jnp.tile(jnp.asarray([10.0, 2.0], jnp.float32), (C, 1))
obs = jnp.zeros((12, 2), jnp.float32)


def logp(theta):
    ys = solve(0.0, y0s, jnp.exp(theta), p_fix, tvals)
    lp = -0.5 * jnp.sum((jnp.log(jnp.maximum(ys, 1e-10)) - obs[None]) ** 2, axis=(1, 2))
    return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)


def vg(q):
    lp, pb = jax.vjp(logp, q)
    (g,) = pb(jnp.ones_like(lp))
    return lp, g


theta0 = jnp.tile(jnp.log(jnp.asarray([1.0, 0.3], jnp.float32)), (C, 1))

if stage >= 1:
    lp, g = vg(theta0)
    jax.block_until_ready(g)
    print("stage 1 (eager vjp):", np.asarray(lp)[0], np.asarray(g)[0])

if stage >= 2:
    q = theta0
    for i in range(3):
        lp, g = vg(q)
        q = q + 0.01 * g
    jax.block_until_ready(q)
    print("stage 2 (leapfrog chain):", np.asarray(q)[0])

if stage >= 3:

    def cond(st):
        eps, it = st
        lp, g = vg(theta0 + eps * 0.0)
        return (jnp.mean(lp) < 1e9) & (it < 3)

    def body(st):
        eps, it = st
        return eps * 2.0, it + 1

    eps, it = lax.while_loop(cond, body, (jnp.asarray(0.1, jnp.float32), jnp.asarray(0)))
    jax.block_until_ready(eps)
    print("stage 3 (while_loop around vjp):", float(eps), int(it))

if stage >= 4:

    def step(carry, _i):
        q = carry

        def inner_cond(st):
            qq, k = st
            return k < 2

        def inner_body(st):
            qq, k = st
            lp, g = vg(qq)
            return qq + 0.01 * g, k + 1

        q, _ = lax.while_loop(inner_cond, inner_body, (q, jnp.asarray(0)))
        return q, jnp.mean(q)

    q, means = lax.scan(step, theta0, jnp.arange(3))
    jax.block_until_ready(q)
    print("stage 4 (scan/while/vjp):", np.asarray(means))

print("all requested stages passed")
