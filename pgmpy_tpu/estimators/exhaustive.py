"""ExhaustiveSearch: score every DAG (practical to ~6 nodes).

Parity: ``/root/reference/pgmpy/estimators/ExhaustiveSearch.py:14-195``.
"""

import itertools

import networkx as nx

from pgmpy_tpu.base.dag import DAG
from pgmpy_tpu.config import logger
from pgmpy_tpu.estimators.base import StructureEstimator
from pgmpy_tpu.estimators.scores import get_scoring_method


class ExhaustiveSearch(StructureEstimator):
    def __init__(self, data, scoring_method=None, use_cache=True, **kwargs):
        super().__init__(data, **kwargs)
        if scoring_method is None:
            scoring_method = "k2"
        _, self.scoring_method = get_scoring_method(scoring_method, data, use_cache)

    def all_dags(self, nodes=None):
        """Generate every DAG over ``nodes`` (super-exponential!)."""
        if nodes is None:
            nodes = sorted(self.variables, key=str)
        if len(nodes) > 6:
            logger.warning(
                f"Generating all DAGs of n nodes likely not feasible for n>6! "
                f"Attempting to search through {2 ** (len(nodes) * (len(nodes) - 1))} graphs"
            )
        edges = list(itertools.permutations(nodes, 2))
        for subset_size in range(len(edges) + 1):
            for edge_subset in itertools.combinations(edges, subset_size):
                graph = nx.DiGraph(edge_subset)
                graph.add_nodes_from(nodes)
                if nx.is_directed_acyclic_graph(graph):
                    yield graph

    def all_scores(self):
        """[(score, dag)] for every DAG, sorted ascending."""
        scored = []
        for dag in self.all_dags():
            score = sum(
                self.scoring_method.local_score(node, list(dag.predecessors(node)))
                for node in dag.nodes()
            )
            scored.append((score, dag))
        scored.sort(key=lambda t: t[0])
        return scored

    def estimate(self):
        best_score, best_dag = max(self.all_scores(), key=lambda t: t[0])
        out = DAG()
        out.add_nodes_from(best_dag.nodes())
        out.add_edges_from(best_dag.edges())
        return out
