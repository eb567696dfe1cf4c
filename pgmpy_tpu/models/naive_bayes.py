"""NaiveBayes: star-topology Bayesian network.

Parity: ``/root/reference/pgmpy/models/NaiveBayes.py:5-222``.
"""

from pgmpy_tpu.independencies import Independencies
from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork


class NaiveBayes(DiscreteBayesianNetwork):
    def __init__(self, feature_vars=None, dependent_var=None):
        self.dependent = dependent_var
        self.features = set(feature_vars) if feature_vars else set()
        edges = (
            [(dependent_var, feature) for feature in self.features]
            if dependent_var and feature_vars
            else None
        )
        super().__init__(edges)
        if dependent_var:
            self.add_node(dependent_var)

    def add_edge(self, u, v, *args, **kwargs):
        if self.dependent and u != self.dependent:
            raise ValueError(
                f"Model can have only one parent node: {self.dependent}. "
                f"Got parent: {u}"
            )
        self.dependent = u
        self.features.add(v)
        super().add_edge(u, v, *args, **kwargs)

    def active_trail_nodes(
        self, start=None, observed=None, include_latents=False, variables=None
    ):
        """Nodes reachable from ``start`` via an active trail.  In a star
        topology this has the reference's closed form
        (``NaiveBayes.py:114-142``): observing the class node blocks
        everything; otherwise every unobserved node is reachable.  The
        closed form returns a plain set like the reference; the inference
        layer's ``variables=`` calling convention delegates to the DAG
        algorithm (which returns the {var: set} dict it expects)."""
        if variables is not None or start is None:
            return super().active_trail_nodes(
                variables=variables,
                observed=observed,
                include_latents=include_latents,
            )
        observed = (
            [observed]
            if isinstance(observed, str)
            else list(observed) if observed is not None else []
        )
        if self.dependent in observed:
            # reference does set(start), which splits a multi-character
            # node NAME into characters (NaiveBayes.py:139-140 only ever
            # sees 1-char names in its doctests) — return {start} instead
            return {start} if isinstance(start, str) else set(start)
        return set(self.nodes()) - set(observed)

    def is_dconnected(self, start, end, observed=None, include_latents=False):
        # the closed-form active_trail_nodes above returns a plain SET for
        # positional calls (reference contract), so the DAG implementation's
        # `[start]` subscript doesn't apply here
        return end in self.active_trail_nodes(start, observed=observed)

    def local_independencies(self, variables):
        independencies = Independencies()
        for variable in (
            variables if isinstance(variables, (list, tuple)) else [variables]
        ):
            if variable != self.dependent:
                others = self.features - {variable}
                if others:
                    independencies.add_assertions(
                        [variable, list(others), [self.dependent]]
                    )
        return independencies

    def fit(self, data, parent_node=None, estimator=None, **kwargs):
        if parent_node is None:
            if not self.dependent:
                raise ValueError("parent node must be specified for the model")
            parent_node = self.dependent
        if parent_node not in data.columns:
            raise ValueError(f"Dependent variable: {parent_node} is not present in the data")
        for child_node in data.columns:
            if child_node != parent_node:
                self.add_edge(parent_node, child_node)
        return super().fit(data, estimator=estimator, **kwargs)
