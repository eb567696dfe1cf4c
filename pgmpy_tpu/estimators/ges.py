"""GES: greedy equivalence search (forward add / backward delete).

Parity: ``/root/reference/pgmpy/estimators/GES.py:19-244``.
"""

import itertools

import networkx as nx

from pgmpy_tpu.base.dag import DAG
from pgmpy_tpu.estimators.base import StructureEstimator
from pgmpy_tpu.estimators.scores import get_scoring_method


class GES(StructureEstimator):
    def __init__(self, data, use_cache=True, **kwargs):
        self.use_cache = use_cache
        super().__init__(data, **kwargs)

    def estimate(self, scoring_method="bic-d", debug=False, **kwargs):
        scorer, score_cache = get_scoring_method(
            scoring_method, self.data, self.use_cache
        )
        score_fn = score_cache.local_score

        model = DAG()
        model.add_nodes_from(self.variables)

        # forward: greedily add the best edge until no improvement
        improved = True
        while improved:
            improved = False
            best_delta, best_edge = 0, None
            for X, Y in itertools.permutations(self.variables, 2):
                if model.has_edge(X, Y) or model.has_edge(Y, X):
                    continue
                if nx.has_path(model, Y, X):
                    continue
                old_parents = list(model.predecessors(Y))
                delta = score_fn(Y, old_parents + [X]) - score_fn(Y, old_parents)
                if delta > best_delta:
                    best_delta, best_edge = delta, (X, Y)
            if best_edge is not None:
                model.add_edge(*best_edge)
                improved = True

        # backward: greedily delete while improving
        improved = True
        while improved:
            improved = False
            best_delta, best_edge = 0, None
            for X, Y in list(model.edges()):
                old_parents = list(model.predecessors(Y))
                new_parents = [p for p in old_parents if p != X]
                delta = score_fn(Y, new_parents) - score_fn(Y, old_parents)
                if delta > best_delta:
                    best_delta, best_edge = delta, (X, Y)
            if best_edge is not None:
                model.remove_edge(*best_edge)
                improved = True
        return model
