"""Learning: batched-device MLE, EM with latents, structure search.

Run: python examples/03_learning.py
"""

import numpy as np
import pandas as pd

from pgmpy_tpu.estimators import (
    PC,
    ExpectationMaximization,
    HillClimbSearch,
    MaximumLikelihoodEstimator,
    TreeSearch,
)
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.utils import get_example_model

alarm = get_example_model("alarm")
df = alarm.simulate(n_samples=30_000, seed=0, show_progress=False)

# parameter learning: every node's count table in ONE device scatter-add
learned = DiscreteBayesianNetwork(alarm.edges())
learned.fit(df, estimator=MaximumLikelihoodEstimator)
print("learned P(HYPOVOLEMIA):", learned.get_cpds("HYPOVOLEMIA").get_values().ravel())

# structure learning on a subset of columns
sub = df[["LVFAILURE", "HISTORY", "LVEDVOLUME", "HYPOVOLEMIA"]]
dag_hc = HillClimbSearch(sub).estimate(scoring_method="bic-d", show_progress=False)
print("hill-climb edges:", sorted(dag_hc.edges()))

skeleton, sepsets = PC(sub).build_skeleton(show_progress=False)
print("PC skeleton:", sorted(map(sorted, skeleton.edges())))

chow_liu = TreeSearch(sub).estimate(estimator_type="chow-liu", show_progress=False)
print("chow-liu edges:", sorted(chow_liu.edges()))

# EM with a latent variable
rng = np.random.default_rng(0)
n = 4000
z = rng.random(n) < 0.4
data = pd.DataFrame(
    {
        "x": np.where(z, rng.random(n) < 0.9, rng.random(n) < 0.1).astype(int),
        "y": np.where(z, rng.random(n) < 0.85, rng.random(n) < 0.15).astype(int),
    }
)
latent_model = DiscreteBayesianNetwork([("z", "x"), ("z", "y")], latents=["z"])
cpds = ExpectationMaximization(latent_model, data).get_parameters(
    seed=42, max_iter=50, atol=1e-4, show_progress=False
)
print("EM-recovered P(x|z):\n", [c for c in cpds if c.variable == "x"][0].get_values())
