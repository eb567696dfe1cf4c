"""Test config: two lanes, same assertions (the reference's numpy/torch
backend-parity pattern, ``test_FactorTorch.py:28-31``, rebuilt as CPU-jax
vs TPU-jax).

Default lane: the suite runs on a virtual 8-device CPU mesh (multi-chip
code paths execute on host).

TPU lane (``make test-tpu`` / ``PGMPY_TPU_LANE=1 pytest -m tpu``): the
platform is left at its default (the real TPU), and only the numeric
golden modules marked ``tpu`` run — identical assertions, real hardware.
"""

import os

import pytest

TPU_LANE = bool(os.environ.get("PGMPY_TPU_LANE"))

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    # The environment's sitecustomize pre-registers a remote TPU platform
    # and sets jax_platforms="axon,cpu"; force CPU for the default lane
    # (bench.py and the tpu lane use the real chip).
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: op-by-op dispatch on tiny factors compiles
# each unique shape once; cache it across test runs.  The CPU lane gets its
# OWN cache dir: the forced-host (8 virtual device) CPU backend detects
# different machine features than plain processes, and cross-loading those
# AOT entries triggers "machine type mismatch ... could lead to execution
# errors" (observed as order-dependent wrong results in r3).
if TPU_LANE:
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgmpy_tpu_jax_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgmpy_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: numeric golden suites that also run against the real TPU "
        "backend (PGMPY_TPU_LANE=1 pytest -m tpu)",
    )
