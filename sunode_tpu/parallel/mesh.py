"""Multi-chip scaling: shard batches of ODE solves over a TPU mesh.

The reference's only parallelism is fork-per-chain multiprocessing
(README.md:233-238; quickstart_pymc.rst:154-163) — one CVODES instance per OS
process.  The TPU-native equivalent (SURVEY.md §2 "Parallelism") is:

  * ``vmap`` batches thousands of independent solves into one lockstep
    integrator on one chip;
  * ``jax.sharding`` + ``jit`` shards the batch ("chains") axis across chips
    over ICI — embarrassingly parallel, no collectives in the hot loop;
  * optionally, a second mesh axis shards large vector *states* (the SIR
    1k-region family) so the Newton linear algebra stays on-chip per shard.

Because chains are independent, XLA inserts no communication for the chain
axis — the only cross-chip traffic is the initial scatter and final gather,
riding ICI.  This file provides small helpers; they are plain JAX and work
identically on a virtual CPU mesh (tests) and a real TPU slice.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_over_chains", "sharded_solve_fn", "CHAINS_AXIS"]

CHAINS_AXIS = "chains"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = CHAINS_AXIS
) -> Mesh:
    """A 1-D device mesh over the chain/batch axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_over_chains(mesh: Mesh, tree: Any, axis_name: str = CHAINS_AXIS) -> Any:
    """Place every array in ``tree`` with its leading (chain) axis sharded
    over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def sharded_solve_fn(
    solve_one: Callable,
    mesh: Mesh,
    *,
    batched_argnums: Sequence[int],
    n_args: int,
    axis_name: str = CHAINS_AXIS,
) -> Callable:
    """jit a vmapped per-chain function with the chain axis sharded over the
    mesh.  ``batched_argnums``: which positional args carry a leading chain
    axis (the rest are broadcast)."""
    batched = set(batched_argnums)
    in_axes = tuple(0 if i in batched else None for i in range(n_args))
    vfn = jax.vmap(solve_one, in_axes=in_axes)

    chain_sharding = NamedSharding(mesh, P(axis_name))
    rep_sharding = NamedSharding(mesh, P())
    in_shardings = tuple(
        chain_sharding if i in batched else rep_sharding for i in range(n_args)
    )
    return jax.jit(vfn, in_shardings=in_shardings)
