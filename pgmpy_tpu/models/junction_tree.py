"""JunctionTree: a clique tree satisfying the running-intersection property.

Parity: ``/root/reference/pgmpy/models/JunctionTree.py:8-152``.  This is the
host-side compile artifact for belief-propagation calibration — the device
kernel consumes its static message schedule and stacked clique tensors
(see ``pgmpy_tpu/inference/bp.py``).
"""

import networkx as nx

from pgmpy_tpu.models.cluster_graph import ClusterGraph


class JunctionTree(ClusterGraph):
    def __init__(self, ebunch=None):
        super().__init__(ebunch)

    def add_edge(self, u, v, **kwargs):
        if u in self.nodes() and v in self.nodes() and nx.has_path(self, u, v):
            raise ValueError(
                f"Addition of edge between {u} and {v} forms a cycle breaking the "
                "properties of Junction Tree"
            )
        super().add_edge(u, v, **kwargs)

    @property
    def states(self):
        state_names = {}
        for factor in self.factors:
            state_names.update(factor.state_names)
        return state_names

    def check_model(self):
        if not nx.is_connected(self):
            raise ValueError("The Junction Tree defined is not fully connected.")
        return super().check_model()

    def copy(self):
        copy = JunctionTree(self.edges())
        copy.add_nodes_from(self.nodes())
        if self.factors:
            copy.add_factors(*[factor.copy() for factor in self.factors])
        return copy
