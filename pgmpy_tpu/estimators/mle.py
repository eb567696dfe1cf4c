"""MaximumLikelihoodEstimator.

Parity: ``/root/reference/pgmpy/estimators/MLE.py:17-318``.  Per-node count
tables come from the device bincount kernel; no joblib pools — the loop is
host-light.
"""

import numpy as np

from pgmpy_tpu.factors.cpd import TabularCPD
from pgmpy_tpu.estimators.base import ParameterEstimator


class MaximumLikelihoodEstimator(ParameterEstimator):
    """MLE of all CPDs: one batched device count kernel for the whole
    network (the reference fits per-node in a joblib pool,
    ``MLE.py:86-137``).

    Examples
    --------
    >>> import numpy as np
    >>> import pandas as pd
    >>> from pgmpy_tpu.estimators import MaximumLikelihoodEstimator
    >>> from pgmpy_tpu.models import DiscreteBayesianNetwork
    >>> df = pd.DataFrame({"a": [0, 0, 1, 1], "b": [0, 1, 1, 1]})
    >>> model = DiscreteBayesianNetwork([("a", "b")])
    >>> cpds = MaximumLikelihoodEstimator(model, df).get_parameters()
    >>> sorted(c.variable for c in cpds)
    ['a', 'b']
    >>> cpd_b = next(c for c in cpds if c.variable == "b")
    >>> np.asarray(cpd_b.get_values(), dtype=float).round(2).tolist()
    [[0.5, 0.0], [0.5, 1.0]]
    """

    def __init__(self, model, data, **kwargs):
        from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork
        from pgmpy_tpu.models.junction_tree import JunctionTree

        if not isinstance(model, (DiscreteBayesianNetwork, JunctionTree)):
            raise NotImplementedError(
                "Maximum Likelihood Estimate is only implemented for "
                "DiscreteBayesianNetwork and JunctionTree"
            )
        super().__init__(model, data, **kwargs)

    def get_parameters(self, n_jobs=1, weighted=False):
        """A TabularCPD per node; ALL count tables batched into one device
        scatter-add call."""
        nodes = sorted(self.model.nodes(), key=str)
        specs = [
            (node, sorted(self.model.get_parents(node), key=str)) for node in nodes
        ]
        tables = self._coded.multi_counts(
            specs, weights=self._coded.weights if weighted else None
        )
        cpds = []
        for (node, parents), counts in zip(specs, tables):
            counts = counts.astype(np.float64)
            zero_cols = counts.sum(axis=0) == 0
            counts[:, zero_cols] = 1.0
            # normalize in host numpy (f64) BEFORE constructing the CPD: a
            # device-side cpd.normalize() per node is one tunnel dispatch
            # each — 37 extra round-trips per ALARM fit
            counts = counts / counts.sum(axis=0, keepdims=True)
            cpds.append(
                TabularCPD(
                    node,
                    len(self.state_names[node]),
                    counts,
                    evidence=parents if parents else None,
                    evidence_card=[len(self.state_names[p]) for p in parents] or None,
                    state_names={v: self.state_names[v] for v in [node] + parents},
                )
            )
        return cpds

    def estimate_cpd(self, node, weighted=False):
        """Counts -> uniform-fill all-zero columns -> column normalize."""
        parents = sorted(self.model.get_parents(node), key=str)
        counts = self._coded.counts(
            node, parents,
            weights=self._coded.weights if weighted else None,
        ).astype(np.float64)
        # unobserved parent configurations get a uniform distribution
        zero_cols = counts.sum(axis=0) == 0
        counts[:, zero_cols] = 1.0

        node_card = len(self.state_names[node])
        cpd = TabularCPD(
            node,
            node_card,
            counts,
            evidence=parents if parents else None,
            evidence_card=[len(self.state_names[p]) for p in parents] or None,
            state_names={v: self.state_names[v] for v in [node] + parents},
        )
        cpd.normalize()
        return cpd

    def estimate_potentials(self):
        """Clique potentials for a JunctionTree target via empirical
        marginals along a rooted order (conditional tables)."""
        from pgmpy_tpu.factors.discrete import DiscreteFactor
        import networkx as nx

        jt = self.model
        potentials = []
        visited_vars = set()
        root = list(jt.nodes())[0]
        order = [root] + [child for _, child in nx.bfs_edges(jt, root)]
        for clique in order:
            clique_vars = list(clique)
            new_vars = [v for v in clique_vars if v not in visited_vars]
            old_vars = [v for v in clique_vars if v in visited_vars]
            counts = self._coded.counts(clique_vars[0], clique_vars[1:]).astype(
                np.float64
            )
            factor = DiscreteFactor(
                clique_vars,
                [len(self.state_names[v]) for v in clique_vars],
                counts.ravel(),
                state_names={v: self.state_names[v] for v in clique_vars},
            )
            if old_vars:
                # divide by marginal over the already-covered separator
                sep = factor.marginalize(new_vars, inplace=False)
                factor = factor.divide(sep, inplace=False)
            else:
                factor.normalize()
            potentials.append(factor)
            visited_vars.update(clique_vars)
        return potentials
