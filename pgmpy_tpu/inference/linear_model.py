"""LinearEstimator: minimal OLS effect estimator.

Parity: ``/root/reference/pgmpy/inference/LinearModel.py:5-33`` (statsmodels
OLS there; jnp least squares here).
"""

import numpy as np

import jax.numpy as jnp


class LinearEstimator:
    def __init__(self, model):
        self.model = model

    def fit(self, X, Y, Z=None, data=None, missing="none", **kwargs):
        """Regress Y on [1, X, Z]; the X coefficient estimates the effect.
        ``missing``: "none" (use all rows), "drop" (drop NaN rows), or
        "raise" (error on NaNs) — reference statsmodels semantics."""
        Z = sorted(Z, key=str) if Z else []
        cols = [Y, X] + Z
        sub = data[cols]
        if missing == "drop":
            sub = sub.dropna()
        elif missing == "raise" and sub.isna().any().any():
            raise ValueError("data contains missing values")
        mat = np.column_stack(
            [np.ones(sub.shape[0])]
            + [sub[c].to_numpy(dtype=np.float64) for c in [X] + Z]
        )
        y = sub[Y].to_numpy(dtype=np.float64)
        # tiny host regression in float64 (device f32 costs ~7 digits of
        # effect-estimate parity; dispatch would dominate anyway)
        beta, _, _, _ = np.linalg.lstsq(mat, y, rcond=None)
        self.coef_ = beta
        self.ate = float(beta[1])
        resid = y - mat @ beta
        self.resid_std = float(np.std(resid))
        return self

    def _get_ate(self):
        return self.ate

    def summary(self):
        return {"ate": self.ate, "coef": self.coef_, "resid_std": self.resid_std}
