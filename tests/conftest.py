"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that sharding/`shard_map` paths are
exercised without real multi-chip hardware (the driver separately dry-runs the
multi-chip path; see ``__graft_entry__.py``).

The axon sitecustomize registers the TPU backend at interpreter start, but JAX
backends are initialised lazily, so flipping ``jax_platforms`` to ``cpu`` here
(before any `jax.devices()` call) is sufficient.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
