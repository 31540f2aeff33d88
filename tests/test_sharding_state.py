"""State-axis sharding (2-D chains x state mesh) for large-state families —
BASELINE config 5 (SIR many-regions): a sharded >=256-region adjoint gradient
on the virtual 8-device mesh must match the unsharded result (VERDICT round 1,
item 7)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.parallel.mesh import make_mesh_2d, shard_batch_state
from sunode_tpu.problem import JaxProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn

R = 256
B = 4


def _sir_problem():
    def rhs(t, y, p):
        I_eff = y.I + p.mix * (jnp.roll(y.I, 1) + jnp.roll(y.I, -1))
        inf = p.beta * y.S * I_eff
        rec = p.gamma * y.I
        return {"S": -inf, "I": inf - rec, "R": rec}

    return JaxProblem(
        params={"beta": (), "gamma": (), "mix": ()},
        states={"S": (R,), "I": (R,), "R": (R,)},
        rhs=rhs,
        derivative_params=[("beta",), ("gamma",)],
    )


@pytest.fixture(scope="module")
def setup():
    problem = _sir_problem()
    solve = make_batched_solve_fn(
        problem,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-8, atol=1e-10),
        adjoint_options=BDFOptions(rtol=1e-8, atol=1e-10),
        checkpoint_n=512,
        method="ADAMS",
    )
    rng = np.random.default_rng(3)
    S0 = 0.99 + 0.005 * rng.standard_normal((B, R))
    I0 = 0.01 * np.abs(1 + 0.1 * rng.standard_normal((B, R)))
    y0 = jnp.asarray(np.concatenate([S0, I0, np.zeros((B, R))], axis=1))
    psub = jnp.asarray(
        np.stack(
            [0.4 * (1 + 0.05 * rng.standard_normal(B)),
             0.15 * (1 + 0.05 * rng.standard_normal(B))],
            axis=1,
        )
    )
    p_fix = jnp.asarray([0.05])
    tvals = jnp.linspace(5.0, 40.0, 6)

    def loss(psub, y0):
        ys = solve(0.0, y0, psub, p_fix, tvals)
        return jnp.sum(ys[:, :, R : 2 * R] ** 2)

    gfn = jax.jit(jax.grad(loss))
    return gfn, psub, y0


def test_state_axis_sharded_gradient_matches(setup):
    gfn, psub, y0 = setup
    assert len(jax.devices()) >= 8, "conftest provisions the 8-device mesh"
    g_ref = np.asarray(gfn(psub, y0))
    assert np.isfinite(g_ref).all()

    mesh = make_mesh_2d(4, 2)
    y0_sh = shard_batch_state(mesh, y0)
    psub_sh = jax.device_put(psub, NamedSharding(mesh, P("chains")))
    g_sh = np.asarray(gfn(psub_sh, y0_sh))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-10, atol=1e-12)


def test_state_axis_sharded_forward_matches(setup):
    _, psub, y0 = setup
    problem = _sir_problem()
    solve = make_batched_solve_fn(
        problem, options=BDFOptions(rtol=1e-8, atol=1e-10), method="ADAMS"
    )
    tvals = jnp.linspace(5.0, 40.0, 6)
    p_fix = jnp.asarray([0.05])
    fn = jax.jit(lambda y0, ps: solve(0.0, y0, ps, p_fix, tvals))
    ys_ref = np.asarray(fn(y0, psub))

    mesh = make_mesh_2d(2, 4)  # stress a deeper state split too
    y0_sh = shard_batch_state(mesh, y0)
    psub_sh = jax.device_put(psub, NamedSharding(mesh, P("chains")))
    ys_sh = np.asarray(fn(y0_sh, psub_sh))
    np.testing.assert_allclose(ys_sh, ys_ref, rtol=1e-10, atol=1e-12)
