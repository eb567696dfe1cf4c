"""Frontdoor identification.

Parity: ``/root/reference/pgmpy/identification/frontdoor.py:8-122``.
"""

from pgmpy_tpu.identification.base import BaseIdentification


class Frontdoor(BaseIdentification):
    def __init__(self, variant=None):
        self.variant = variant

    def _identify(self, causal_graph):
        from pgmpy_tpu.inference.causal import CausalInference

        ci = CausalInference(causal_graph)
        exposures = causal_graph.get_role("exposure")
        outcomes = causal_graph.get_role("outcome")
        sets = set()
        for x in exposures:
            for y in outcomes:
                sets |= set(ci.get_all_frontdoor_adjustment_sets(x, y))
        return {"frontdoor_sets": sorted(sets, key=lambda s: (len(s), sorted(map(str, s))))}

    @staticmethod
    def _is_valid_adjustment_set(causal_graph, X, Y, Z):
        from pgmpy_tpu.inference.causal import CausalInference

        return CausalInference(causal_graph).is_valid_frontdoor_adjustment_set(X, Y, Z)

    def _validate(self, causal_graph):
        return bool(self._identify(causal_graph)["frontdoor_sets"])
