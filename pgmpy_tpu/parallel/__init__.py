from pgmpy_tpu.parallel import distributed
from pgmpy_tpu.parallel.mesh import (
    get_mesh,
    sharded_sample_marginals,
    sharded_gibbs_marginals,
    sharded_nuts_moments,
    sharded_query_batch,
)

__all__ = [
    "distributed",
    "get_mesh",
    "sharded_sample_marginals",
    "sharded_gibbs_marginals",
    "sharded_nuts_moments",
    "sharded_query_batch",
]
