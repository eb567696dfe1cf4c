"""TreeSearch: Chow-Liu and TAN tree structure learning.

Parity: ``/root/reference/pgmpy/estimators/TreeSearch.py:21-402``.  The
pairwise mutual-information matrix is computed from device count tables
(one bincount per pair) instead of the reference's joblib-parallel sklearn
calls.
"""

import itertools

import networkx as nx
import numpy as np

from pgmpy_tpu.base.dag import DAG
from pgmpy_tpu.estimators.base import StructureEstimator


def _mutual_info(counts):
    """MI in nats from a 2-D contingency table."""
    n = counts.sum()
    if n == 0:
        return 0.0
    pxy = counts / n
    px = pxy.sum(axis=1, keepdims=True)
    py = pxy.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(pxy > 0, pxy * (np.log(pxy) - np.log(px) - np.log(py)), 0.0)
    return float(terms.sum())


class TreeSearch(StructureEstimator):
    """Chow-Liu / TAN tree learning; the pairwise mutual-information
    matrix is computed from one batched device count dispatch.

    Examples
    --------
    >>> import numpy as np
    >>> import pandas as pd
    >>> from pgmpy_tpu.estimators import TreeSearch
    >>> rng = np.random.default_rng(1)
    >>> a = rng.integers(0, 2, 500)
    >>> b = np.where(rng.random(500) < 0.9, a, 1 - a)
    >>> c = np.where(rng.random(500) < 0.9, b, 1 - b)  # chain a-b-c
    >>> df = pd.DataFrame({"a": a, "b": b, "c": c})
    >>> dag = TreeSearch(df, root_node="a").estimate(
    ...     estimator_type="chow-liu", show_progress=False)
    >>> sorted(dag.edges())
    [('a', 'b'), ('b', 'c')]
    """

    def __init__(self, data, root_node=None, n_jobs=-1, **kwargs):
        super().__init__(data, **kwargs)
        if root_node is not None and root_node not in self.variables:
            raise ValueError(f"Root node: {root_node} not found in data")
        self.root_node = root_node

    def _mi_matrix(self, variables, condition=None):
        # ALL pairwise count tables in O(1) device dispatches — a per-pair
        # loop is O(d^2) launches, minutes of pure tunnel latency at
        # ALARM scale (the reference instead joblib-fans sklearn MI calls,
        # TreeSearch.py:21-402)
        d = len(variables)
        pairs = list(itertools.combinations(range(d), 2))
        if condition is None:
            specs = [(variables[i], (variables[j],)) for i, j in pairs]
        else:
            specs = [(variables[i], (variables[j], condition)) for i, j in pairs]
        tables = self._coded.multi_counts_padded(specs)
        mi = np.zeros((d, d))
        for (i, j), counts in zip(pairs, tables):
            counts = np.asarray(counts, dtype=np.float64)
            if condition is None:
                mi[i, j] = mi[j, i] = _mutual_info(counts)
            else:
                # conditional MI given the class variable
                cx = counts.shape[0]
                cy = len(self.state_names[variables[j]])
                cz = len(self.state_names[condition])
                t = counts.reshape(cx, cy, cz)
                total = t.sum()
                val = 0.0
                for k in range(cz):
                    sub = t[:, :, k]
                    nz = sub.sum()
                    if nz > 0 and total > 0:
                        val += (nz / total) * _mutual_info(sub)
                mi[i, j] = mi[j, i] = val
        return mi

    def estimate(
        self, estimator_type="chow-liu", class_node=None, edge_weights_fn="mutual_info",
        n_jobs=-1, weight_fn=None, show_progress=True,
    ):
        if estimator_type not in ("chow-liu", "tan"):
            raise ValueError(f"estimator_type must be chow-liu or tan. Got: {estimator_type}")

        if estimator_type == "chow-liu":
            variables = list(self.variables)
            mi = self._mi_matrix(variables)
            graph = nx.Graph()
            graph.add_nodes_from(variables)
            for i, j in itertools.combinations(range(len(variables)), 2):
                graph.add_edge(variables[i], variables[j], weight=-mi[i, j])
            tree = nx.minimum_spanning_tree(graph)
            root = self.root_node or variables[0]
            dag = DAG()
            dag.add_nodes_from(variables)
            dag.add_edges_from(nx.bfs_edges(tree, root))
            return dag

        # TAN: class node + Chow-Liu tree over features with conditional MI
        if class_node is None:
            raise ValueError("class_node must be specified for estimator_type='tan'")
        if class_node not in self.variables:
            raise ValueError(f"Class node: {class_node} not found in data")
        features = [v for v in self.variables if v != class_node]
        if self.root_node is not None and self.root_node == class_node:
            raise ValueError("Root node must be different from class node")
        mi = self._mi_matrix(features, condition=class_node)
        graph = nx.Graph()
        graph.add_nodes_from(features)
        for i, j in itertools.combinations(range(len(features)), 2):
            graph.add_edge(features[i], features[j], weight=-mi[i, j])
        tree = nx.minimum_spanning_tree(graph)
        root = self.root_node or features[0]
        dag = DAG()
        dag.add_nodes_from(features + [class_node])
        dag.add_edges_from(nx.bfs_edges(tree, root))
        dag.add_edges_from((class_node, f) for f in features)
        return dag
