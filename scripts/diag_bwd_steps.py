"""Locate the backward step-count cost: injections? quad err con? dynamics?"""
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

problem = SympyProblem(
    params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
    states={"hares": (), "lynx": ()},
    rhs_sympy=lambda t, y, p: {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    },
    derivative_params=[("alpha",), ("beta",)],
)

rhs = problem.make_rhs()
adjoint_rhs = problem.make_adjoint_rhs()
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
y_end = res.ys[:, -1, :]

rhs_b = jax.vmap(rhs, in_axes=(0, 1, 1), out_axes=1)
aj_rhs_b = jax.vmap(adjoint_rhs, in_axes=(0, 1, 1, 1), out_axes=1)
q_rhs_b = jax.vmap(quad_rhs, in_axes=(0, 1, 1, 1), out_axes=1)
n = 2


def rhs_c(tau, z, pp):
    t = -tau
    y, lam = z[:n], z[n:]
    return jnp.concatenate([-rhs_b(t, y, pp), -aj_rhs_b(t, y, lam, pp)])


def quad_c(tau, z, pp):
    t = -tau
    return q_rhs_b(t, z[:n], z[n:], pp)


def run(label, with_inj, with_quad, qec):
    o = opts._replace(quad_err_con=qec)
    z0 = jnp.concatenate([y_end, grads[:, -1, :]], axis=1)
    q0 = jnp.zeros((B, 2))
    kw = {}
    if with_inj:
        ev_times = (-tvals[:-1])[::-1]
        ev_deltas = jnp.moveaxis(jnp.flip(grads[:, :-1, :], axis=1), 0, 2)
        ev_deltas = jnp.concatenate([jnp.zeros_like(ev_deltas), ev_deltas], axis=1)
        kw = dict(inject_times=ev_times, inject_deltas=ev_deltas)
    if with_quad:
        kw.update(quad_rhs=quad_c, quad0=q0)

    f = jax.jit(
        lambda z0, pp: adams_solve_batched(
            rhs_c, -tvals[-1], z0, pp, jnp.asarray([0.0]), o,
            batched_fns=True, **kw,
        )
    )
    r = f(z0, p)
    jax.block_until_ready(r.status)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(z0, p)
        jax.block_until_ready(r.status)
    dt = (time.perf_counter() - t0) / 3
    print(
        f"{label:40s} {dt*1e3:7.1f} ms  max_steps {int(jnp.max(r.stats['n_steps'])):4d}"
        f"  attempts {int(r.stats['n_attempts']):4d}"
        f"  mean_steps {float(jnp.mean(r.stats['n_steps'])):.0f}"
    )


run("inj + quad + quad_err_con", True, True, True)
run("inj + quad, NO quad err con", True, True, False)
run("NO inj, quad + qec", False, True, True)
run("NO inj, NO quad", False, False, False)


def run_zero_deltas(label):
    o = opts._replace(quad_err_con=True)
    z0 = jnp.concatenate([y_end, grads[:, -1, :]], axis=1)
    q0 = jnp.zeros((B, 2))
    ev_times = (-tvals[:-1])[::-1]
    ev_deltas = jnp.zeros((TN - 1, 2 * n, B))
    f = jax.jit(
        lambda z0, pp: adams_solve_batched(
            rhs_c, -tvals[-1], z0, pp, jnp.asarray([0.0]), o,
            batched_fns=True, quad_rhs=quad_c, quad0=q0,
            inject_times=ev_times, inject_deltas=ev_deltas,
        )
    )
    r = f(z0, p)
    jax.block_until_ready(r.status)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(z0, p)
        jax.block_until_ready(r.status)
    dt = (time.perf_counter() - t0) / 3
    print(
        f"{label:40s} {dt*1e3:7.1f} ms  max_steps {int(jnp.max(r.stats['n_steps'])):4d}"
        f"  attempts {int(r.stats['n_attempts']):4d}"
        f"  mean_steps {float(jnp.mean(r.stats['n_steps'])):.0f}"
    )


run_zero_deltas("inj mechanism, ZERO deltas")
