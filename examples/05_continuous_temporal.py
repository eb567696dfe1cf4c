"""Continuous + temporal models: Gaussian BNs with HMC, DBN filtering, SMC.

Run: python examples/05_continuous_temporal.py
"""

import numpy as np

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.inference import DBNInference
from pgmpy_tpu.models import DynamicBayesianNetwork
from pgmpy_tpu.sampling import HamiltonianMCDA
from pgmpy_tpu.sampling.smc import ParticleFilter
from pgmpy_tpu.utils import get_example_model

# --- Gaussian BN: closed-form joint + HMC posterior -------------------- #
ecoli = get_example_model("ecoli70")  # 46-node Gaussian network
variables, mean, cov = ecoli.to_joint_gaussian()
print("ecoli70 joint over", len(variables), "variables")

hmc = HamiltonianMCDA(ecoli)
samples = hmc.sample(
    mean.copy(), num_adapt=50, num_samples=500, trajectory_length=10,
    n_chains=8, seed=0, return_type="array",
)
pooled = samples[100:].reshape(-1, len(variables))
print("HMC acc:", round(hmc.acceptance_rate, 2),
      "| max |mean err| =", float(np.abs(pooled.mean(0) - mean).max()))

# --- 2-TBN: compiled interface filtering + particle filter ------------- #
dbn = DynamicBayesianNetwork()
dbn.add_edges_from([(("rain", 0), ("umbrella", 0)), (("rain", 0), ("rain", 1))])
dbn.add_cpds(
    TabularCPD(("rain", 0), 2, [[0.5], [0.5]]),
    TabularCPD(("umbrella", 0), 2, [[0.8, 0.1], [0.2, 0.9]],
               evidence=[("rain", 0)], evidence_card=[2]),
    TabularCPD(("rain", 1), 2, [[0.7, 0.3], [0.3, 0.7]],
               evidence=[("rain", 0)], evidence_card=[2]),
    TabularCPD(("umbrella", 1), 2, [[0.8, 0.1], [0.2, 0.9]],
               evidence=[("rain", 1)], evidence_card=[2]),
)
infer = DBNInference(dbn)
evidence = {("umbrella", 1): 1, ("umbrella", 2): 1, ("umbrella", 3): 0}

# exact filtering: one lax.scan over the horizon
scan_out = infer.forward_scan(["rain"], evidence=evidence, n_time_slices=4)
print("P(rain_3 | evidence):", scan_out[("rain", 3)])

# SMC particle filter (useful when slices get too big for exact filtering)
pf = ParticleFilter(dbn, n_particles=4096)
marginals, particles, ess = pf.filter(evidence=evidence, n_time_slices=4, seed=0)
print("SMC estimate     :", marginals[("rain", 3)], "| min ESS:", int(ess.min()))
