"""Test config: run the suite on a virtual 8-device CPU mesh.

Real-TPU runs happen in bench.py; tests validate numerics and sharding on
host CPU where 8 virtual devices let multi-chip code paths execute.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize pre-registers a remote TPU platform and
# sets jax_platforms="axon,cpu"; force CPU for the test suite (bench.py uses
# the real chip).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: op-by-op dispatch on tiny factors compiles
# each unique shape once; cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/pgmpy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
