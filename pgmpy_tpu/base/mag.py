"""MAG: maximal ancestral graph (directed / bidirected / undirected edges).

Parity target: ``/root/reference/pgmpy/base/MAG.py:8-387`` and
``AncestralBase.py``.  m-separation is decided on the canonical DAG
(bidirected -> latent confounder, undirected -> selection child
conditioned on).
"""

import itertools

import networkx as nx

from pgmpy_tpu.base.roles import GraphRolesMixin


class MAG(GraphRolesMixin, nx.DiGraph):
    def __init__(
        self, directed_ebunch=[], bidirected_ebunch=[], undirected_ebunch=[], latents=[]
    ):
        super().__init__()
        self.bidirected_edges = set()
        self.undirected_edges = set()
        self.add_edges_from(directed_ebunch)
        for u, v in bidirected_ebunch:
            self.add_node(u)
            self.add_node(v)
            self.bidirected_edges.add(frozenset((u, v)))
        for u, v in undirected_ebunch:
            self.add_node(u)
            self.add_node(v)
            self.undirected_edges.add(frozenset((u, v)))
        self.latents = set(latents)
        try:
            cycle = list(nx.find_cycle(self))
        except nx.NetworkXNoCycle:
            cycle = None
        if cycle:
            raise ValueError("The directed part of a MAG must be acyclic.")

    def to_canonical_dag(self):
        """Latent confounders for <->, selection children for — edges."""
        from pgmpy_tpu.base.dag import DAG

        dag = DAG()
        dag.add_nodes_from(self.nodes())
        dag.add_edges_from(self.edges())
        latents = set(self.latents)
        selection = []
        for edge in self.bidirected_edges:
            u, v = tuple(sorted(edge, key=str))
            confounder = f"__u_{u}_{v}"
            dag.add_edge(confounder, u)
            dag.add_edge(confounder, v)
            latents.add(confounder)
        for edge in self.undirected_edges:
            u, v = tuple(sorted(edge, key=str))
            sel = f"__s_{u}_{v}"
            dag.add_edge(u, sel)
            dag.add_edge(v, sel)
            selection.append(sel)
        dag.latents = latents
        return dag, selection

    def is_mseparated(self, x, y, z=None):
        dag, selection = self.to_canonical_dag()
        observed = list(z or []) + selection
        return not dag.is_dconnected(x, y, observed=observed)

    def is_ancestral(self):
        """No directed cycles; no node is an ancestor of a bidirected
        spouse."""
        for edge in self.bidirected_edges:
            u, v = tuple(edge)
            if nx.has_path(self, u, v) or nx.has_path(self, v, u):
                return False
        return True

    def is_maximal(self):
        """Every non-adjacent pair is m-separable by some subset."""
        nodes = sorted(self.nodes(), key=str)
        for x, y in itertools.combinations(nodes, 2):
            adjacent = (
                self.has_edge(x, y)
                or self.has_edge(y, x)
                or frozenset((x, y)) in self.bidirected_edges
                or frozenset((x, y)) in self.undirected_edges
            )
            if adjacent:
                continue
            others = [n for n in nodes if n not in (x, y)]
            separable = False
            for r in range(len(others) + 1):
                for sub in itertools.combinations(others, r):
                    if self.is_mseparated(x, y, list(sub)):
                        separable = True
                        break
                if separable:
                    break
            if not separable:
                return False
        return True

    def copy(self):
        return MAG(
            directed_ebunch=list(self.edges()),
            bidirected_ebunch=[tuple(e) for e in self.bidirected_edges],
            undirected_ebunch=[tuple(e) for e in self.undirected_edges],
            latents=set(self.latents),
        )
