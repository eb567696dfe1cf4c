"""Undirected graph base class (host side).

Parity with ``/root/reference/pgmpy/base/UndirectedGraph.py:8-231``.
"""

import itertools

import networkx as nx


class UndirectedGraph(nx.Graph):
    def __init__(self, ebunch=None, latents=[]):
        super().__init__(ebunch)
        self.latents = set(latents)

    def add_node(self, node_for_adding, weight=None, latent=False, **attr):
        node = node_for_adding
        if isinstance(node, tuple) and len(node) == 2 and isinstance(node[1], dict):
            node, attrs = node
            if weight is not None:
                attrs["weight"] = weight
        else:
            attrs = {"weight": weight}
        attrs.update(attr)
        if latent:
            self.latents.add(node)
        super().add_node(node, **attrs)

    def add_nodes_from(self, nodes_for_adding, weights=None, latent=False, **attr):
        nodes = nodes_for_adding
        nodes = list(nodes)
        if isinstance(latent, bool):
            latent = [latent] * len(nodes)
        if weights:
            if len(nodes) != len(weights):
                raise ValueError(
                    "The number of elements in nodes and weights should be equal."
                )
            for node, weight, lat in zip(nodes, weights, latent):
                self.add_node(node, weight=weight, latent=lat, **attr)
        else:
            for node, lat in zip(nodes, latent):
                self.add_node(node, latent=lat, **attr)

    def add_edge(self, u, v, weight=None):
        super().add_edge(u, v, weight=weight)

    def add_edges_from(self, ebunch, weights=None):
        ebunch = list(ebunch)
        if weights:
            if len(ebunch) != len(weights):
                raise ValueError(
                    "The number of elements in ebunch and weights should be equal"
                )
            for edge, weight in zip(ebunch, weights):
                self.add_edge(edge[0], edge[1], weight=weight)
        else:
            for edge in ebunch:
                self.add_edge(edge[0], edge[1])

    def is_clique(self, nodes):
        """True if ``nodes`` are pairwise adjacent."""
        return all(self.has_edge(u, v) for u, v in itertools.combinations(nodes, 2))

    def is_triangulated(self):
        """True if the graph is chordal."""
        return nx.is_chordal(self)

    def copy(self, as_view=False):
        if as_view:
            # networkx read-only view semantics (nx.Graph.copy(as_view=True))
            return super().copy(as_view=True)
        graph = UndirectedGraph()
        graph.add_nodes_from(self.nodes(data=True))
        graph.add_edges_from(self.edges(data=True))
        graph.latents = set(self.latents)
        return graph
