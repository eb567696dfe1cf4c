"""Generalized adjustment-set identification.

Parity: ``/root/reference/pgmpy/identification/adjustment.py:10-232``.
"""

from pgmpy_tpu.identification.base import BaseIdentification


class Adjustment(BaseIdentification):
    def __init__(self, variant="minimal"):
        if variant not in ("minimal", "all"):
            raise ValueError(f"variant must be 'minimal' or 'all'. Got: {variant}")
        self.variant = variant

    def _get_causal_inference(self, causal_graph):
        from pgmpy_tpu.inference.causal import CausalInference

        return CausalInference(causal_graph)

    def _exposures_outcomes(self, causal_graph):
        return (
            causal_graph.get_role("exposure"),
            causal_graph.get_role("outcome"),
        )

    def _identify(self, causal_graph):
        """Adjustment sets for the (exposure, outcome) pair(s)."""
        ci = self._get_causal_inference(causal_graph)
        exposures, outcomes = self._exposures_outcomes(causal_graph)
        if self.variant == "minimal":
            adj = ci.get_minimal_adjustment_set(list(exposures), list(outcomes))
            return {"adjustment_sets": [adj] if adj is not None else []}
        sets = set()
        for x in exposures:
            for y in outcomes:
                sets |= set(ci.get_all_backdoor_adjustment_sets(x, y))
        return {"adjustment_sets": sorted(sets, key=lambda s: (len(s), sorted(map(str, s))))}

    def _validate(self, causal_graph):
        ci = self._get_causal_inference(causal_graph)
        exposures, outcomes = self._exposures_outcomes(causal_graph)
        adj = ci.get_minimal_adjustment_set(list(exposures), list(outcomes))
        return adj is not None
