"""ClusterGraph: nodes are variable-set cliques with attached potentials.

Parity: ``/root/reference/pgmpy/models/ClusterGraph.py:12-397``.
"""

import itertools
from collections import defaultdict

import numpy as np

from pgmpy_tpu.base.undirected import UndirectedGraph
from pgmpy_tpu.factors.factor_dict import FactorDict
from pgmpy_tpu.factors.factor_ops import factor_product


class ClusterGraph(UndirectedGraph):
    def __init__(self, ebunch=None):
        super().__init__()
        if ebunch:
            self.add_edges_from(ebunch)
        self.factors = []

    def add_node(self, node_for_adding, **kwargs):
        node = node_for_adding
        if not isinstance(node, (list, set, tuple)):
            raise TypeError(
                "Node can only be a list, set or tuple of nodes forming a clique"
            )
        node = tuple(node)
        super().add_node(node, **kwargs)

    def add_nodes_from(self, nodes_for_adding, **kwargs):
        nodes = nodes_for_adding
        for node in nodes:
            self.add_node(node, **kwargs)

    def add_edge(self, u, v, **kwargs):
        set_u, set_v = set(u), set(v)
        if set_u.isdisjoint(set_v):
            raise ValueError("No sepset found between these two edges.")
        super().add_edge(tuple(u), tuple(v), **kwargs)

    def add_factors(self, *factors):
        for factor in factors:
            factor_scope = set(factor.scope())
            node = [n for n in self.nodes() if set(n) == factor_scope]
            if not node:
                raise ValueError(
                    "Factors defined on clique of variable not present in model"
                )
            self.factors.append(factor)

    def get_factors(self, node=None):
        if node is None:
            return self.factors
        node = tuple(node)
        if node not in self.nodes():
            raise ValueError("Node not present in Cluster Graph")
        factors = [f for f in self.factors if set(f.scope()) == set(node)]
        if not factors:
            raise ValueError("Factors are not associated with the corresponding node.")
        return factors[0]

    def remove_factors(self, *factors):
        for factor in factors:
            self.factors.remove(factor)

    @property
    def clique_beliefs(self):
        return FactorDict({tuple(f.scope()): f for f in self.factors})

    @clique_beliefs.setter
    def clique_beliefs(self, clique_beliefs):
        if not isinstance(clique_beliefs, (dict, FactorDict)):
            raise TypeError("clique_beliefs must be a FactorDict or dict")
        self.factors = list(clique_beliefs.values())

    def get_cardinality(self, node=None):
        cardinalities = defaultdict(int)
        for factor in self.factors:
            for variable, cardinality in zip(factor.scope(), factor.cardinality):
                cardinalities[variable] = int(cardinality)
        if node is not None:
            return cardinalities[node]
        return cardinalities

    def get_partition_function(self):
        if self.factors:
            factor = self.factors[0]
            all_factors = factor_product(factor, *self.factors[1:])
            ret = all_factors.marginalize(list(all_factors.scope()), inplace=False)
            return float(np.asarray(ret.values))

    def check_model(self):
        for clique in self.nodes():
            factors = [f for f in self.factors if set(f.scope()) == set(clique)]
            if not factors:
                raise ValueError("Factors for all the cliques or clusters not defined.")
        cardinalities = self.get_cardinality()
        for factor in self.factors:
            for variable, cardinality in zip(factor.scope(), factor.cardinality):
                if cardinalities[variable] != int(cardinality):
                    raise ValueError(
                        "Cardinality of variable in different factors doesn't match"
                    )
        return True

    def copy(self):
        copy = ClusterGraph(self.edges())
        copy.add_nodes_from(self.nodes())
        if self.factors:
            copy.add_factors(*[factor.copy() for factor in self.factors])
        return copy
