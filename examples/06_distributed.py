"""Multi-host execution: the same script runs on one chip or a pod.

Single process (this machine): initialize() is a recorded no-op and the
pod-spanning mesh collapses to the local devices.  On a real pod, launch
one process per host with the coordinator address set, e.g.

    RANK=0..N-1 python examples/06_distributed.py  # with initialize(
    #     coordinator_address="10.0.0.1:8476",
    #     num_processes=N, process_id=int(os.environ["RANK"]))

and everything below is unchanged: the chains axis lies host-major, so
collectives ride ICI within a host slice and cross DCN once.

Run: python examples/06_distributed.py
"""

import jax
import numpy as np

from pgmpy_tpu.parallel import distributed as dist
from pgmpy_tpu.parallel import sharded_gibbs_marginals, sharded_query_batch
from pgmpy_tpu.utils import get_example_model

pidx, pcount = dist.initialize()  # no coordinator -> single-process mode
print(f"process {pidx}/{pcount}, {len(jax.devices())} device(s)")

mesh = dist.global_mesh()  # 1-D chains axis over every device in the pod
print("mesh:", mesh)

model = get_example_model("asia")

# per-host PRNG streams: fold the process index into the seed so chains
# never collide across the pod (kernels additionally fold in the device
# axis index)
key = dist.host_fold_key(jax.random.PRNGKey(0))

# batched exact posteriors, rows sharded over the mesh
values, names = sharded_query_batch(
    model, ["lung"], {"smoke": ["yes", "no"] * 8}, mesh=mesh
)
print("P(lung | smoke) rows:", np.round(values[:2], 3))

# pooled Gibbs marginals with psum moment reduction across the mesh.
# NOTE: not on asia — its deterministic "either = tub OR lung" CPD makes
# single-site Gibbs non-ergodic (chains stick at their inits); that is a
# property of the model, not the sampler.
cancer = get_example_model("cancer")
marginals = sharded_gibbs_marginals(
    cancer, n_chains=min(256, 32 * mesh.devices.size), n_sweeps=200,
    burn_in=100, mesh=mesh, seed=0,
)
print("Gibbs P(Cancer):", np.round(marginals["Cancer"], 3))
