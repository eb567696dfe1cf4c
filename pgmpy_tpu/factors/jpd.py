"""JointProbabilityDistribution: a normalized factor over all variables.

Parity: ``/root/reference/pgmpy/factors/discrete/JointProbabilityDistribution.py:11-492``.
"""

import itertools

import numpy as np

from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.independencies import Independencies


class JointProbabilityDistribution(DiscreteFactor):
    def __init__(self, variables, cardinality, values):
        values = np.asarray(values, dtype=np.float64)
        if not np.isclose(values.sum(), 1.0, atol=0.01):
            raise ValueError("The probability values doesn't sum to 1.")
        super().__init__(variables, cardinality, values)

    def __repr__(self):
        var_card = ", ".join(
            f"{var}:{int(card)}" for var, card in zip(self.variables, self.cardinality)
        )
        return f"<Joint Distribution representing P({var_card}) at {hex(id(self))}>"

    def __str__(self):
        return self._str(phi_or_p="P")

    def marginal_distribution(self, variables, inplace=True):
        """Marginal P(variables)."""
        variables = (
            [variables] if isinstance(variables, (str, int)) else list(variables)
        )
        return self.marginalize(
            [var for var in self.variables if var not in variables],
            inplace=inplace,
        )

    def check_independence(
        self, event1, event2, event3=None, condition_random_variable=False
    ):
        """Test (event1 ⟂ event2 | event3) in this JPD numerically."""
        jpd = self.copy()
        if isinstance(event1, str) or isinstance(event2, str):
            raise TypeError("Event 1 and event 2 should be list or array-like structures")
        if event3:
            if isinstance(event3, str):
                raise TypeError("Event 3 cannot be a string")
            if condition_random_variable:
                # condition on every state of event3 variables
                for variable_states in itertools.product(
                    *[range(int(self.get_cardinality([var])[var])) for var in event3]
                ):
                    conditioned = jpd.conditional_distribution(
                        list(zip(event3, variable_states)), inplace=False
                    )
                    for var1, var2 in itertools.product(event1, event2):
                        marg = conditioned.marginal_distribution([var1, var2], inplace=False)
                        m1 = conditioned.marginal_distribution([var1], inplace=False)
                        m2 = conditioned.marginal_distribution([var2], inplace=False)
                        if (m1 * m2) != marg:
                            return False
                return True
            else:
                jpd.conditional_distribution(event3)
        for var1, var2 in itertools.product(event1, event2):
            marg = jpd.marginal_distribution([var1, var2], inplace=False)
            m1 = jpd.marginal_distribution([var1], inplace=False)
            m2 = jpd.marginal_distribution([var2], inplace=False)
            if (m1 * m2) != marg:
                return False
        return True

    def get_independencies(self, condition=None):
        """All pairwise marginal independencies that hold."""
        jpd = self.copy()
        if condition:
            jpd.conditional_distribution(condition)
        independencies = Independencies()
        for var1, var2 in itertools.combinations(jpd.variables, 2):
            marg = jpd.marginal_distribution([var1, var2], inplace=False)
            m1 = jpd.marginal_distribution([var1], inplace=False)
            m2 = jpd.marginal_distribution([var2], inplace=False)
            if (m1 * m2) == marg:
                independencies.add_assertions([var1, var2])
        return independencies

    def conditional_distribution(self, values, inplace=True):
        """Condition on [(variable, state-index)] and renormalize."""
        jpd = self if inplace else self.copy()
        jpd.reduce(values, show_warnings=False)
        jpd.normalize()
        if not inplace:
            return jpd

    def copy(self):
        return JointProbabilityDistribution(
            list(self.variables), self.cardinality.copy(), np.asarray(self.values)
        )

    def minimal_imap(self, order):
        """I-map DAG for the given variable order, with the reference's
        LITERAL semantics (``JointProbabilityDistribution.py:358-401``,
        goldens v7): an edge ``s -> v`` is added for every PROPER
        predecessor subset ``s`` that renders ``v`` independent of the
        remaining predecessors.  Quirks faithfully preserved: a fully
        dependent variable gets NO parents (no subset certifies), and a
        fully independent one gets an edge from every singleton subset —
        so the output is minimal only in the reference's sense, not the
        textbook one."""
        from pgmpy_tpu.base.dag import DAG

        def get_subsets(u):
            for r in range(len(u) + 1):
                yield from itertools.combinations(u, r)

        graph = DAG()
        for variable_index in range(len(order)):
            u = order[:variable_index]
            for subset in get_subsets(u):
                if len(subset) < len(u) and self.check_independence(
                    [order[variable_index]], set(u) - set(subset), subset, True
                ):
                    graph.add_edges_from(
                        [(variable, order[variable_index]) for variable in subset]
                    )
        return graph

    def is_imap(self, model):
        """Check whether ``model``'s factorization equals this JPD."""
        from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork

        if not isinstance(model, DiscreteBayesianNetwork):
            raise TypeError("model must be an instance of DiscreteBayesianNetwork")
        factors = [cpd.to_factor() for cpd in model.get_cpds()]
        factor_prod = factors[0]
        for factor in factors[1:]:
            factor_prod = factor_prod * factor
        jpd_fact = DiscreteFactor(self.variables, self.cardinality, self.values)
        return jpd_fact == factor_prod

    def to_factor(self):
        return DiscreteFactor(
            list(self.variables), self.cardinality.copy(), self.values
        )

    def pmap(self):
        raise NotImplementedError
