"""LinearEstimator: minimal OLS effect estimator.

Parity: ``/root/reference/pgmpy/inference/LinearModel.py:5-33`` (statsmodels
OLS there; jnp least squares here).
"""

import numpy as np

import jax.numpy as jnp


class LinearEstimator:
    def __init__(self, model):
        self.model = model

    def fit(self, X, Y, Z=None, data=None, **kwargs):
        """Regress Y on [1, X, Z]; the X coefficient estimates the effect."""
        Z = list(Z or [])
        mat = np.column_stack(
            [np.ones(data.shape[0])]
            + [data[c].to_numpy(dtype=np.float64) for c in [X] + Z]
        )
        y = data[Y].to_numpy(dtype=np.float64)
        beta, _, _, _ = jnp.linalg.lstsq(jnp.asarray(mat), jnp.asarray(y))
        beta = np.asarray(beta)
        self.coef_ = beta
        self.ate = float(beta[1])
        resid = y - mat @ beta
        self.resid_std = float(np.std(resid))
        return self

    def summary(self):
        return {"ate": self.ate, "coef": self.coef_, "resid_std": self.resid_std}
