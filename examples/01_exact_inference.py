"""Exact inference on the ALARM network: fused-einsum VE and compiled
junction-tree BP.

Run: python examples/01_exact_inference.py        (uses the TPU if present)
"""

import time

from pgmpy_tpu.inference import BeliefPropagation, VariableElimination
from pgmpy_tpu.utils import get_example_model

model = get_example_model("alarm")  # 37 variables, bundled bnlearn zoo

# --- Variable elimination: one fused contraction per query ------------- #
infer = VariableElimination(model)
posterior = infer.query(
    ["HISTORY"], evidence={"CVP": "LOW", "HR": "HIGH"}, show_progress=False
)
print("P(HISTORY | CVP=LOW, HR=HIGH):")
print(posterior)

# MAP assignment over several variables at once
print("MAP:", infer.map_query(["LVFAILURE", "HYPOVOLEMIA"], evidence={"CVP": "LOW"}))

# Batched queries: posteriors for many evidence rows in ONE device call
values, states = infer.query_batch(
    ["HISTORY"], evidence={"CVP": ["LOW", "NORMAL", "HIGH"], "HR": ["HIGH"] * 3}
)
print("batched posteriors:\n", values)

# --- Junction-tree BP: whole calibration compiled to one XLA program --- #
bp = BeliefPropagation(model)
t0 = time.time()
bp.calibrate()
print(f"calibrated {len(bp.get_cliques())} cliques in {time.time() - t0:.3f}s")
print(bp.query(["PRESS"], evidence={"INTUBATION": "NORMAL"}, show_progress=False))
