"""MmhcEstimator: MMPC skeleton restriction + hill-climb search.

Parity: ``/root/reference/pgmpy/estimators/MmhcEstimator.py:12-232``.
"""

import itertools

import networkx as nx
import numpy as np

from pgmpy_tpu.base.undirected import UndirectedGraph
from pgmpy_tpu.estimators.base import StructureEstimator
from pgmpy_tpu.estimators.citests import _power_divergence
from pgmpy_tpu.estimators.hill_climb import HillClimbSearch


class MmhcEstimator(StructureEstimator):
    def __init__(self, data, **kwargs):
        super().__init__(data, **kwargs)

    def _assoc(self, X, Y, Zs, significance_level):
        """Association strength: the chi^2 statistic of X,Y | Zs (0 when
        independent at the significance level)."""
        chi2, p_value, dof = _power_divergence(
            X, Y, list(Zs), self.data, boolean=False,
            significance_level=significance_level, lambda_="pearson",
        )
        return 0.0 if p_value >= significance_level else chi2

    def _min_assoc(self, X, Y, Zs, significance_level):
        """min over subsets of Zs of assoc(X, Y | subset)."""
        return min(
            self._assoc(X, Y, list(subset), significance_level)
            for size in range(len(Zs) + 1)
            for subset in itertools.combinations(Zs, size)
        )

    def mmpc(self, significance_level=0.01):
        """Max-min parents-and-children skeleton."""
        nodes = list(self.variables)
        neighbors = {}
        for node in nodes:
            candidates = [n for n in nodes if n != node]
            cpc = []
            # forward: add the candidate with max min-assoc while significant
            changed = True
            while changed and candidates:
                changed = False
                assocs = {
                    cand: self._min_assoc(node, cand, cpc, significance_level)
                    for cand in candidates
                }
                best = max(assocs, key=assocs.get)
                if assocs[best] > 0:
                    cpc.append(best)
                    candidates.remove(best)
                    changed = True
            # backward: drop members that became independent
            for cand in list(cpc):
                rest = [c for c in cpc if c != cand]
                if self._min_assoc(node, cand, rest, significance_level) == 0:
                    cpc.remove(cand)
            neighbors[node] = cpc

        # symmetry correction: keep edge only if both directions agree
        skeleton = UndirectedGraph()
        skeleton.add_nodes_from(nodes)
        for node in nodes:
            for nb in neighbors[node]:
                if node in neighbors[nb]:
                    skeleton.add_edge(node, nb)
        return skeleton

    def estimate(self, scoring_method=None, tabu_length=10, significance_level=0.01):
        if scoring_method is None:
            scoring_method = "bdeu"
        skel = self.mmpc(significance_level)
        hc = HillClimbSearch(self.data)
        white_list = [
            (u, v)
            for u, v in itertools.permutations(skel.nodes(), 2)
            if skel.has_edge(u, v)
        ]
        return hc.estimate(
            scoring_method=scoring_method,
            white_list=white_list,
            tabu_length=tabu_length,
            show_progress=False,
        )
