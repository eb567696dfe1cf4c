"""BayesianEstimator: Dirichlet / BDeu / K2 priors.

Parity: ``/root/reference/pgmpy/estimators/BayesianEstimator.py:18-264``.
"""

import numbers

import numpy as np

from pgmpy_tpu.estimators.base import ParameterEstimator
from pgmpy_tpu.factors.cpd import TabularCPD


class BayesianEstimator(ParameterEstimator):
    """CPD estimation with Dirichlet priors (K2 / BDeu / dirichlet),
    computed from the same batched device count kernel as MLE.

    Examples
    --------
    >>> import numpy as np
    >>> import pandas as pd
    >>> from pgmpy_tpu.estimators import BayesianEstimator
    >>> from pgmpy_tpu.models import DiscreteBayesianNetwork
    >>> df = pd.DataFrame({"a": [0, 0, 1, 1], "b": [0, 1, 1, 1]})
    >>> model = DiscreteBayesianNetwork([("a", "b")])
    >>> est = BayesianEstimator(model, df)
    >>> cpd_a = est.estimate_cpd("a", prior_type="K2")  # +1 pseudo-counts
    >>> np.asarray(cpd_a.get_values(), dtype=float).round(2).tolist()
    [[0.5], [0.5]]
    >>> cpd_b = est.estimate_cpd("b", prior_type="BDeu",
    ...                          equivalent_sample_size=4)
    >>> np.asarray(cpd_b.get_values(), dtype=float).round(2).tolist()
    [[0.5, 0.25], [0.5, 0.75]]
    """

    def __init__(self, model, data, **kwargs):
        from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork

        if not isinstance(model, DiscreteBayesianNetwork):
            raise NotImplementedError(
                "Bayesian Parameter Estimation is only implemented for DiscreteBayesianNetwork"
            )
        super().__init__(model, data, **kwargs)

    def get_parameters(
        self, prior_type="BDeu", equivalent_sample_size=5, pseudo_counts=[], n_jobs=1, weighted=False
    ):
        parameters = []
        for node in sorted(self.model.nodes(), key=str):
            if isinstance(equivalent_sample_size, dict):
                node_ess = equivalent_sample_size[node]
            else:
                node_ess = equivalent_sample_size
            if isinstance(pseudo_counts, dict):
                node_pc = pseudo_counts[node]
            else:
                node_pc = pseudo_counts
            parameters.append(
                self.estimate_cpd(
                    node,
                    prior_type=prior_type,
                    equivalent_sample_size=node_ess,
                    pseudo_counts=node_pc,
                    weighted=weighted,
                )
            )
        return parameters

    def estimate_cpd(
        self, node, prior_type="BDeu", pseudo_counts=[], equivalent_sample_size=5, weighted=False
    ):
        node_cardinality = len(self.state_names[node])
        parents = sorted(self.model.get_parents(node), key=str)
        parents_cardinalities = [len(self.state_names[p]) for p in parents]
        cpd_shape = (node_cardinality, int(np.prod(parents_cardinalities)) if parents else 1)

        prior_type = prior_type.lower()
        if prior_type == "k2":
            pseudo_counts = np.ones(cpd_shape, dtype=float)
        elif prior_type == "bdeu":
            alpha = float(equivalent_sample_size) / (
                node_cardinality * np.prod(parents_cardinalities)
            )
            pseudo_counts = np.ones(cpd_shape, dtype=float) * alpha
        elif prior_type == "dirichlet":
            pseudo_counts = np.asarray(pseudo_counts, dtype=float)
            if pseudo_counts.size == 1:
                pseudo_counts = np.ones(cpd_shape, dtype=float) * float(pseudo_counts)
            else:
                if pseudo_counts.shape != cpd_shape:
                    raise ValueError(
                        f"The shape of pseudo_counts for the node: {node} must be of shape: {str(cpd_shape)}"
                    )
        else:
            raise ValueError("'prior_type' not specified")

        counts = self._coded.counts(
            node, parents,
            weights=self._coded.weights if weighted else None,
        ).astype(np.float64)
        bayesian_counts = counts + pseudo_counts

        cpd = TabularCPD(
            node,
            node_cardinality,
            bayesian_counts,
            evidence=parents if parents else None,
            evidence_card=parents_cardinalities or None,
            state_names={v: self.state_names[v] for v in [node] + parents},
        )
        cpd.normalize()
        return cpd
