"""NUTS with the chains axis sharded over a device mesh.

BASELINE config 4 at multichip scale: the batch-lockstep sampler's chain
axis is just data — sharding it over the mesh shards every leapfrog's
batched forward+adjoint solve with no collectives in the hot loop (the
replacement for one-PyMC-process-per-chain-per-host).  Runs on the test
suite's virtual 8-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.parallel.mesh import make_mesh, shard_over_chains
from sunode_tpu.sample import nuts_sample, split_rhat
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn


def test_nuts_chains_shard_over_mesh():
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest provisions an 8-device CPU mesh"
    mesh = make_mesh(8)

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
        options=BDFOptions(rtol=1e-6, atol=1e-6),
        adjoint_options=BDFOptions(rtol=1e-6, atol=1e-6),
        method="ADAMS",
        adjoint_interpolation="transition",
    )
    p_fix = jnp.asarray([1.0, 0.4])
    tvals = jnp.linspace(1.0, 6.0, 5)
    C = 16  # 2 chains per device
    y0s = jnp.broadcast_to(jnp.asarray([10.0, 2.0]), (C, 2))
    mu0 = jnp.log(jnp.asarray([1.0, 0.3]))

    ys_ref = solve(
        0.0, y0s[:1], jnp.exp(mu0)[None], p_fix, tvals
    )[0]
    obs_log = jnp.log(jnp.maximum(ys_ref, 1e-10))

    def logp(theta):
        ys = solve(0.0, y0s, jnp.exp(theta), p_fix, tvals)
        ys_safe = jnp.maximum(ys, 1e-10)
        ll = -0.5 * jnp.sum(
            (jnp.log(ys_safe) - obs_log[None]) ** 2 / 0.1**2, axis=(1, 2)
        )
        lp = ll - 0.5 * jnp.sum((theta - mu0) ** 2, axis=1)
        return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

    key = jax.random.PRNGKey(0)
    init = mu0[None, :] + 0.1 * jax.random.normal(key, (C, 2))
    init = jax.device_put(init, NamedSharding(mesh, P("chains", None)))

    res = nuts_sample(
        logp, key, init, num_warmup=30, num_samples=40, max_treedepth=4
    )
    s = np.asarray(res.samples)  # (C, S, 2)
    assert np.isfinite(s).all()
    # every chain moved (the sharded sampler actually sampled)
    assert (s.std(axis=1) > 0).all()
    # posterior concentrates near the generating parameters
    post = np.exp(s.reshape(-1, 2)).mean(axis=0)
    np.testing.assert_allclose(post, [1.0, 0.3], rtol=0.2)
    # draws stay sharded over the chain axis
    shard_axes = {
        d.index for d in res.samples.addressable_shards.__iter__()
    }
    assert len(shard_axes) == 8
