"""NaiveAdjustmentRegressor: sklearn-compatible causal-effect regressor.

Parity: ``/root/reference/pgmpy/prediction/NaiveAdjustmentRegressor.py``.
Fits outcome ~ [exposure, adjustment set] where the adjustment set comes
from the causal graph's minimal backdoor identification.
"""

import numpy as np

import jax.numpy as jnp


class NaiveAdjustmentRegressor:
    def __init__(self, graph=None, exposure=None, outcome=None):
        self.graph = graph
        self.exposure = exposure
        self.outcome = outcome
        self.adjustment_set_ = None
        self.coef_ = None
        self.intercept_ = None

    def get_params(self, deep=True):
        return {
            "graph": self.graph,
            "exposure": self.exposure,
            "outcome": self.outcome,
        }

    def set_params(self, **params):
        for k, v in params.items():
            setattr(self, k, v)
        return self

    def _resolve_roles(self):
        exposure = self.exposure
        outcome = self.outcome
        if exposure is None and self.graph is not None and hasattr(self.graph, "get_role"):
            roles = self.graph.get_role("exposure")
            exposure = roles[0] if roles else None
        if outcome is None and self.graph is not None and hasattr(self.graph, "get_role"):
            roles = self.graph.get_role("outcome")
            outcome = roles[0] if roles else None
        if exposure is None or outcome is None:
            raise ValueError("exposure and outcome must be specified (directly or via graph roles)")
        return exposure, outcome

    def fit(self, X, y=None):
        """X: DataFrame containing exposure + covariates (and outcome when
        y is None)."""
        exposure, outcome = self._resolve_roles()
        if y is None:
            if outcome not in X.columns:
                raise ValueError(f"Outcome column {outcome} not in X")
            y = X[outcome]
            X = X.drop(columns=[outcome])
        from pgmpy_tpu.inference.causal import CausalInference

        if self.graph is not None:
            adj = CausalInference(self.graph).get_minimal_adjustment_set(
                exposure, outcome
            )
            adjustment = sorted(adj or [], key=str)
        else:
            adjustment = [c for c in X.columns if c != exposure]
        adjustment = [a for a in adjustment if a in X.columns]
        self.adjustment_set_ = adjustment

        cols = [exposure] + adjustment
        mat = np.column_stack(
            [np.ones(X.shape[0])] + [X[c].to_numpy(dtype=np.float64) for c in cols]
        )
        beta, _, _, _ = jnp.linalg.lstsq(
            jnp.asarray(mat), jnp.asarray(y.to_numpy(dtype=np.float64))
        )
        beta = np.asarray(beta)
        self.intercept_ = float(beta[0])
        self.coef_ = beta[1:]
        self._cols = cols
        return self

    def predict(self, X):
        mat = np.column_stack(
            [np.ones(X.shape[0])]
            + [X[c].to_numpy(dtype=np.float64) for c in self._cols]
        )
        return mat @ np.concatenate([[self.intercept_], self.coef_])

    def causal_effect(self):
        """The exposure coefficient (average treatment effect under
        linearity)."""
        return float(self.coef_[0])

    def score(self, X, y):
        pred = self.predict(X)
        y = y.to_numpy(dtype=np.float64) if hasattr(y, "to_numpy") else np.asarray(y)
        ss_res = float(np.sum((y - pred) ** 2))
        ss_tot = float(np.sum((y - y.mean()) ** 2))
        return 1.0 - ss_res / ss_tot if ss_tot else 0.0
