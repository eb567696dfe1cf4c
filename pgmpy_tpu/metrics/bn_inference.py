"""BayesianModelProbability: per-row log P(x) under a discrete BN.

Reference: ``/root/reference/pgmpy/metrics/bn_inference.py:7-148`` indexes
CPTs row-by-row in Python; here it is one jitted gather over the stacked
log-CPT tables (the same tables the sampler uses), vmapped over rows.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import config
from pgmpy_tpu.sampling.core import CompiledAncestralSampler


class BayesianModelProbability:
    def __init__(self, model):
        self.model = model
        self.sampler = CompiledAncestralSampler(model)

        specs = self.sampler._node_specs

        @jax.jit
        def logp(codes):
            lp = jnp.zeros(codes.shape[0], dtype=config.DTYPE)
            for i, (parent_idx, strides, log_table) in enumerate(specs):
                flat = jnp.zeros(codes.shape[0], dtype=jnp.int32)
                for pi, st in zip(parent_idx, strides):
                    flat = flat + codes[:, pi] * st
                lp = lp + log_table[flat, codes[:, i]]
            return lp

        self._logp = logp

    def pre_compute_reduce(self, variable):
        """Reference BayesianModelInference surface (ref sampling/base.py:38)."""
        return self.sampler.pre_compute_reduce(variable)

    def pre_compute_reduce_maps(self, variable, evidence=None,
                                state_combinations=None):
        return self.sampler.pre_compute_reduce_maps(
            variable, evidence=evidence, state_combinations=state_combinations
        )

    def _encode(self, data):
        codes = np.empty((data.shape[0], len(self.sampler.variables)), dtype=np.int32)
        for j, var in enumerate(self.sampler.variables):
            mapping = {s: i for i, s in enumerate(self.sampler.state_names[var])}
            codes[:, j] = data[var].map(mapping).to_numpy(dtype=np.int32)
        return jnp.asarray(codes)

    def log_probability(self, data, ordering=None):
        """log P(row) for each row of ``data`` (columns = model variables)."""
        return np.asarray(self._logp(self._encode(data)), dtype=np.float64)

    def score(self, data, ordering=None):
        """Total log-likelihood of the data under the model."""
        return float(self.log_probability(data).sum())
