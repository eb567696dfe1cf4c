"""Sampling: compiled ancestral simulation, likelihood weighting, 10k-chain
Gibbs, and mesh-sharded marginals with psum collectives.

Run: python examples/02_sampling.py
"""

import numpy as np

from pgmpy_tpu.parallel import get_mesh, sharded_sample_marginals
from pgmpy_tpu.sampling import BayesianModelSampling, GibbsSampling
from pgmpy_tpu.utils import get_example_model

model = get_example_model("alarm")

# forward simulation: one jitted topological sweep, all rows at once
df = model.simulate(n_samples=100_000, seed=0, show_progress=False)
print("simulated:", df.shape)
print(df["HR"].value_counts(normalize=True))

# likelihood-weighted posterior sampling
sampler = BayesianModelSampling(model)
lw = sampler.likelihood_weighted_sample(
    evidence=[("CVP", "LOW")], size=50_000, seed=0
)
w = lw["_weight"].to_numpy()
p = (
    (lw["HISTORY"].cat.codes.to_numpy()[:, None] == np.arange(2)) * w[:, None]
).sum(0)
print("P(HISTORY | CVP=LOW) ~", p / p.sum())

# 10k Gibbs chains in one compiled scan (vmapped Markov-blanket updates)
gibbs = GibbsSampling(model)
traj = gibbs.sample_chains(n_chains=10_000, size=30, seed=0)
print("gibbs trajectory:", traj.shape)  # (sweeps, chains, variables)

# shard sampling over a device mesh; psum reduces the moment sums
mesh = get_mesh()  # all local devices on a 1-D "chains" axis
marginals = sharded_sample_marginals(model, 40_000, mesh=mesh, seed=0)
print("sharded marginal of HR:", marginals["HR"])
