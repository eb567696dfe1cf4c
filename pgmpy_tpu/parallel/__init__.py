from pgmpy_tpu.parallel.mesh import (
    get_mesh,
    sharded_sample_marginals,
    sharded_gibbs_marginals,
    sharded_nuts_moments,
)

__all__ = [
    "get_mesh",
    "sharded_sample_marginals",
    "sharded_gibbs_marginals",
    "sharded_nuts_moments",
]
