# Test / bench gates for pgmpy_tpu.

.PHONY: test test-tpu bench dryrun sigsweep

# Full unit suite on forced-CPU jax (tests/conftest.py pins the platform
# and a virtual 8-device mesh for sharding tests). ~2 min.
test:
	python -m pytest tests/ -q

# The numeric suites re-run against the real TPU backend (parity lane).
# Requires exclusive access to the chip; see tests/conftest.py for the
# `tpu` marker plumbing.
test-tpu:
	PGMPY_TPU_LANE=1 python -m pytest tests/ -q -m tpu

# Headline benchmark (MUNIN calibration + secondaries); prints one JSON line.
bench:
	python bench.py

# Multi-chip sharding compile check on 8 virtual devices.  The env var
# alone is NOT enough: sitecustomize pins jax_platforms="axon,cpu", so
# the platform must be forced to cpu after importing jax.
dryrun:
	XLA_FLAGS="--xla_force_host_platform_device_count=8" python -c "\
	import jax; jax.config.update('jax_platforms', 'cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')"

# API-parity gate vs the live reference: exits non-zero on any missing
# class/method/param OR any namespace import failure (no vacuous success).
sigsweep:
	PYTHONPATH=/root/repo/tools/refshims:/root/reference:/root/repo \
		python tools/sig_sweep.py
