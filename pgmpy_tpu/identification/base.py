"""Identification strategy template.

Parity: ``/root/reference/pgmpy/identification/base.py:1-88``.  A strategy
implements ``_identify(causal_graph) -> estimands`` and
``_validate(causal_graph) -> bool``; graphs carry exposure/outcome roles.
"""


class BaseIdentification:
    def _validate_causal_graph(self, causal_graph):
        if not causal_graph.has_role("exposure") or not causal_graph.has_role("outcome"):
            raise ValueError(
                "The causal graph must have both 'exposure' and 'outcome' roles set."
            )

    def _identify(self, causal_graph):
        raise NotImplementedError

    def _validate(self, causal_graph):
        raise NotImplementedError

    def identify(self, causal_graph):
        """Return the estimands this strategy finds for the graph."""
        self._validate_causal_graph(causal_graph)
        return self._identify(causal_graph)

    def validate(self, causal_graph):
        """True when the strategy is applicable to the graph."""
        self._validate_causal_graph(causal_graph)
        return self._validate(causal_graph)

    def __call__(self, causal_graph):
        return self.identify(causal_graph)
