"""ExpertKnowledge: required/forbidden edges and temporal tiers.

Parity: ``/root/reference/pgmpy/estimators/ExpertKnowledge.py:6-292``.
"""

import itertools


class ExpertKnowledge:
    def __init__(
        self,
        forbidden_edges=None,
        required_edges=None,
        temporal_order=None,
        search_space=None,
    ):
        self.forbidden_edges = set(map(tuple, forbidden_edges or []))
        self.required_edges = set(map(tuple, required_edges or []))
        self.temporal_order = [list(t) for t in (temporal_order or [])]
        self.search_space = search_space
        if self.forbidden_edges & self.required_edges:
            raise ValueError(
                f"Edges cannot be both required and forbidden: "
                f"{self.forbidden_edges & self.required_edges}"
            )
        # temporal tiers forbid edges from later tiers to earlier tiers
        if self.temporal_order:
            tier_of = {}
            for tier, vars_ in enumerate(self.temporal_order):
                for v in vars_:
                    tier_of[v] = tier
            for u in tier_of:
                for v in tier_of:
                    if u != v and tier_of[u] > tier_of[v]:
                        self.forbidden_edges.add((u, v))

    def apply_expert_knowledge(self, pdag):
        """Orient/restrict a PDAG according to required/forbidden edges."""
        pdag = pdag.copy()
        for u, v in self.required_edges:
            if pdag.has_undirected_edge(u, v):
                pdag.orient_undirected_edge(u, v, inplace=True)
            elif not pdag.has_directed_edge(u, v):
                raise ValueError(
                    f"Required edge ({u}, {v}) conflicts with the learned skeleton"
                )
        for u, v in self.forbidden_edges:
            if pdag.has_undirected_edge(u, v):
                pdag.orient_undirected_edge(v, u, inplace=True)
            elif pdag.has_directed_edge(u, v):
                raise ValueError(
                    f"Forbidden edge ({u}, {v}) is directed in the learned skeleton"
                )
        return pdag

    def limit_search_space(self, variables):
        """(black_list, white_list) for score-based searches."""
        all_edges = set(itertools.permutations(variables, 2))
        white_list = (
            set(map(tuple, self.search_space)) if self.search_space else set(all_edges)
        )
        white_list -= self.forbidden_edges
        white_list |= self.required_edges
        black_list = all_edges - white_list
        return black_list, white_list
