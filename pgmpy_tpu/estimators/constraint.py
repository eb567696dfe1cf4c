"""Constraint-based skeleton discovery (PC-style).

Parity: ``/root/reference/pgmpy/estimators/BaseConstraintEstimator.py:24-356``.
The per-edge CI tests at each conditioning-set size run against the shared
device count kernel; no joblib workers are needed — the contingency
reductions are the hot path and they batch on device.
"""

import itertools
from itertools import combinations

import networkx as nx

from pgmpy_tpu.config import logger, config
from pgmpy_tpu.estimators.base import StructureEstimator
from pgmpy_tpu.estimators.citests import get_callable_ci_test


class BaseConstraintEstimator(StructureEstimator):
    def __init__(self, data=None, independencies=None, **kwargs):
        super().__init__(data=data, independencies=independencies, **kwargs)

    def build_skeleton(
        self,
        ci_test="chi_square",
        max_cond_vars=5,
        significance_level=0.01,
        variant="stable",
        n_jobs=1,
        show_progress=True,
        expert_knowledge=None,
        **kwargs,
    ):
        """Returns (skeleton: nx.Graph, separating_sets: dict)."""
        test_fn = get_callable_ci_test(ci_test)
        if self.data is not None:
            variables = list(self.variables)
            test_kwargs = dict(
                data=self.data, boolean=True,
                significance_level=significance_level, **kwargs,
            )
        elif self.independencies is not None:
            variables = sorted(self.independencies.get_all_variables(), key=str)
            test_fn = get_callable_ci_test("independence_match")
            test_kwargs = dict(independencies=self.independencies)
        else:
            raise ValueError("Either data or independencies must be specified")

        graph = nx.complete_graph(variables)
        if expert_knowledge is not None:
            for u, v in expert_knowledge.forbidden_edges:
                if graph.has_edge(u, v) and (v, u) in expert_knowledge.forbidden_edges:
                    graph.remove_edge(u, v)

        separating_sets = {}
        lim_neighbors = 0
        while not all(
            len(list(graph.neighbors(var))) < lim_neighbors for var in variables
        ):
            if variant == "orig":
                edges = list(graph.edges())
                for u, v in edges:
                    if not graph.has_edge(u, v):
                        continue
                    for sep_set in itertools.chain(
                        combinations(set(graph.neighbors(u)) - {v}, lim_neighbors),
                        combinations(set(graph.neighbors(v)) - {u}, lim_neighbors),
                    ):
                        if test_fn(u, v, list(sep_set), **test_kwargs):
                            separating_sets[frozenset((u, v))] = sep_set
                            graph.remove_edge(u, v)
                            break
            else:  # "stable" / "parallel": neighbors frozen per level
                neighbors = {node: set(graph[node]) for node in graph.nodes()}
                for u, v in list(graph.edges()):
                    for sep_set in itertools.chain(
                        combinations(neighbors[u] - {v}, lim_neighbors),
                        combinations(neighbors[v] - {u}, lim_neighbors),
                    ):
                        if test_fn(u, v, list(sep_set), **test_kwargs):
                            separating_sets[frozenset((u, v))] = sep_set
                            if graph.has_edge(u, v):
                                graph.remove_edge(u, v)
                            break
            lim_neighbors += 1
            if lim_neighbors > max_cond_vars:
                logger.warning(
                    "Reached maximum number of allowed conditional variables. Exiting"
                )
                break
        return graph, separating_sets
