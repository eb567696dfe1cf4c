"""Causal inference: identification, do-queries, ATE estimation.

Run: python examples/04_causal.py
"""

import numpy as np
import pandas as pd

from pgmpy_tpu.base import DAG
from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.inference import CausalInference
from pgmpy_tpu.models import DiscreteBayesianNetwork

# confounded model: z -> x, z -> y, x -> y
model = DiscreteBayesianNetwork([("z", "x"), ("z", "y"), ("x", "y")])
model.add_cpds(
    TabularCPD("z", 2, [[0.4], [0.6]]),
    TabularCPD("x", 2, [[0.8, 0.3], [0.2, 0.7]], evidence=["z"], evidence_card=[2]),
    TabularCPD(
        "y", 2,
        [[0.9, 0.5, 0.6, 0.1], [0.1, 0.5, 0.4, 0.9]],
        evidence=["x", "z"], evidence_card=[2, 2],
    ),
)
ci = CausalInference(model)

print("backdoor sets for x -> y:", ci.get_all_backdoor_adjustment_sets("x", "y"))
print("minimal adjustment set:", ci.get_minimal_adjustment_set("x", "y"))
print("P(y | do(x=1)):", np.asarray(ci.query(["y"], do={"x": 1}, show_progress=False).values))
print("P(y | x=1)    :", np.asarray(ci.query(["y"], evidence={"x": 1}, show_progress=False).values))

# frontdoor identification with a latent confounder
fd = CausalInference(
    DAG(
        [("u", "smoking"), ("u", "cancer"), ("smoking", "tar"), ("tar", "cancer")],
        latents=["u"],
    )
)
print("frontdoor sets:", fd.get_all_frontdoor_adjustment_sets("smoking", "cancer"))

# linear ATE from observational data
rng = np.random.default_rng(0)
n = 20_000
z = rng.normal(size=n)
x = 0.8 * z + rng.normal(size=n) * 0.5
y = 2.0 * x + 1.5 * z + rng.normal(size=n) * 0.5
data = pd.DataFrame({"x": x, "y": y, "z": z})
dag = DAG([("z", "x"), ("z", "y"), ("x", "y")])
print("ATE(x -> y) =", CausalInference(dag).estimate_ate("x", "y", data), "(true 2.0)")
