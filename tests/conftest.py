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

# Persistent compilation cache: many tests build fresh Solver objects whose
# jitted programs have IDENTICAL HLO (e.g. finite-difference reference loops
# construct one Solver per sample).  Without this, each instance recompiles
# from scratch — tens of seconds per compile on a small CI host.
jax.config.update("jax_compilation_cache_dir", "/tmp/sunode_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
