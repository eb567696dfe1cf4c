"""NoisyORCPD: noisy-OR parameterized binary CPD.

Parity: ``/root/reference/pgmpy/factors/discrete/NoisyOR.py:8-75``.
P(variable=True | parents) = 1 - prod_{active parents} (1 - p_i).

Examples
--------
>>> import numpy as np
>>> from pgmpy_tpu.factors import NoisyORCPD
>>> cpd = NoisyORCPD("fever", [0.8, 0.6], evidence=["flu", "cold"])
>>> vals = np.asarray(cpd.get_values(), dtype=float).round(2)
>>> vals[0].tolist()  # P(fever=True | flu,cold in TT/TF/FT/FF order)
[0.92, 0.8, 0.6, 0.0]
"""

import itertools

import numpy as np

from pgmpy_tpu.factors.cpd import TabularCPD


class NoisyORCPD(TabularCPD):
    def __init__(self, variable, prob_values, evidence):
        if len(prob_values) != len(evidence):
            raise ValueError("Number of prob_values should be same as evidence")
        if any((p < 0) or (p > 1) for p in prob_values):
            raise ValueError("All probability values should be between 0 and 1")
        prob_values = np.asarray(prob_values, dtype=np.float64)
        n = len(evidence)
        n_cols = 2**n
        values = np.zeros((2, n_cols))
        # closed-form noisy-OR table: parents binary with state 0 = True
        # (matching the reference's state_names [True, False])
        for col, config in enumerate(itertools.product([0, 1], repeat=n)):
            active = [prob_values[i] for i, s in enumerate(config) if s == 0]
            p_true = 1.0 - np.prod([1.0 - p for p in active]) if active else 0.0
            values[0, col] = p_true
            values[1, col] = 1.0 - p_true
        state_names = {variable: ["True", "False"]}
        for e in evidence:
            state_names[e] = ["True", "False"]
        super().__init__(
            variable,
            2,
            values,
            evidence=list(evidence),
            evidence_card=[2] * n,
            state_names=state_names,
        )
        self.prob_values = prob_values
