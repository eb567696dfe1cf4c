"""Worker for the REAL multi-process distributed test (not a test module).

Launched twice by ``test_parallel.py::TestDistributedMultiProcess`` as
separate interpreters joined through ``pgmpy_tpu.parallel.distributed.
initialize`` over a localhost coordinator.  Each process exposes 2
virtual CPU devices, so the pod-spanning mesh covers 4 devices across 2
processes, and the assertions exercise cross-process collectives (psum
over the chains axis) plus a sharded sampling kernel — the code path a
real TPU pod runs, minus the hardware.

argv: rank coordinator_port
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

from functools import partial

import numpy as np

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    from pgmpy_tpu.parallel import distributed as dist

    rank, port = int(sys.argv[1]), sys.argv[2]
    pidx, pcount = dist.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=rank,
    )
    assert (pidx, pcount) == (rank, 2)
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
    assert dist.is_initialized()

    mesh = dist.global_mesh()
    assert mesh.devices.size == 4
    procs = [d.process_index for d in mesh.devices.reshape(-1)]
    assert procs == sorted(procs), "host-major device order"
    hc = dist.host_chain_mesh()
    assert hc.devices.shape == (2, 2)

    # cross-process collective over the pod-spanning mesh
    @partial(shard_map, mesh=mesh, in_specs=P("chains"), out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x, keepdims=True), "chains")

    arr = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P("chains")))
    assert float(np.asarray(total(arr))[0]) == 28.0

    # per-host PRNG streams differ
    k0 = dist.host_fold_key(jax.random.PRNGKey(0), 0)
    k1 = dist.host_fold_key(jax.random.PRNGKey(0), 1)
    assert not np.array_equal(np.asarray(k0), np.asarray(k1))

    # a library kernel over the multi-process mesh: sharded likelihood-
    # weighted marginals with psum'd moments must match the exact answer
    from pgmpy_tpu.factors import TabularCPD
    from pgmpy_tpu.models import DiscreteBayesianNetwork
    from pgmpy_tpu.parallel import sharded_sample_marginals

    model = DiscreteBayesianNetwork([("rain", "wet")])
    model.add_cpds(
        TabularCPD("rain", 2, [[0.8], [0.2]]),
        TabularCPD("wet", 2, [[0.9, 0.2], [0.1, 0.8]],
                   evidence=["rain"], evidence_card=[2]),
    )
    marginals = sharded_sample_marginals(
        model, n_samples=40_000, mesh=mesh, evidence={"wet": 1}, seed=0
    )
    # P(rain | wet=1) = [1/3, 2/3]
    np.testing.assert_allclose(marginals["rain"], [1 / 3, 2 / 3], atol=0.02)

    print(f"WORKER {rank} OK", flush=True)


if __name__ == "__main__":
    main()
