"""SEMEstimator: ML/ULS/GLS fitting of SEM covariance structure + 2SLS IV.

Parity: ``/root/reference/pgmpy/estimators/SEMEstimator.py:11-466``, with
the torch optimizer loop replaced by optax + jax.grad on the same losses
over the RAM implied covariance.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.models.sem import SEM, SEMAlg, SEMGraph
from pgmpy_tpu.utils.optimizer import optimize


class SEMEstimator:
    def __init__(self, model):
        if isinstance(model, (SEM, SEMGraph)):
            self.model = model
            self.alg = model.to_lisrel()
        elif isinstance(model, SEMAlg):
            self.model = model
            self.alg = model
        else:
            raise ValueError(
                f"model should be an instance of SEM/SEMGraph/SEMAlg. Got: {type(model)}"
            )

    def _masks(self):
        B_mask = jnp.asarray(self.alg.B_mask)
        S_mask = jnp.asarray(self.alg.S_mask)
        B_fixed = np.where(np.isnan(self.alg.B_fixed), 0.0, self.alg.B_fixed)
        S_fixed = np.where(np.isnan(self.alg.S_fixed), 0.0, self.alg.S_fixed)
        B_free = jnp.asarray(self.alg.B_mask & np.isnan(self.alg.B_fixed))
        S_free = jnp.asarray(self.alg.S_mask & np.isnan(self.alg.S_fixed))
        return B_mask, S_mask, jnp.asarray(B_fixed), jnp.asarray(S_fixed), B_free, S_free

    def get_init_values(self, data, method="random", seed=None):
        """Starting (B, zeta) matrices for the optimizer (ref
        SEMEstimator.py:173-217, Bollen Table 4C.1 'std' recipe)."""
        variables = list(self.alg.variables)
        m = len(variables)
        rng = np.random.default_rng(seed)
        B = rng.random((m, m))
        zeta = rng.random((m, m))
        if method == "random":
            return B, zeta
        if method == "std":
            a = 0.4
            scaling = {}
            if hasattr(self.model, "get_scaling_indicators"):
                scaling = dict(self.model.get_scaling_indicators())
            for var in variables:
                scaling.setdefault(var, var)
            std = {
                v: (data.loc[:, scaling[v]].std()
                    if scaling[v] in data.columns else 1.0)
                for v in variables
            }
            for i in range(m):
                for j in range(m):
                    if scaling[variables[i]] == variables[j]:
                        B[i, j] = 1.0
                    elif i != j:
                        B[i, j] = a * (std[variables[i]] / std[variables[j]])
            for i in range(m):
                zeta[i, i] = a * std[variables[i]] ** 2
            for i in range(m):
                for j in range(m):
                    if i != j:
                        zeta[i, j] = zeta[j, i] = a * np.sqrt(
                            zeta[i, i] * zeta[j, j]
                        )
            return B, zeta
        raise NotImplementedError(f"Initialization method {method} not supported.")

    def ml_loss(self, params, loss_args):
        """-2 log-likelihood (up to constants): log|Sigma| + tr(S Sigma^-1)."""
        S_emp = loss_args["S"]
        sigma = self._implied(params)
        chol = jnp.linalg.cholesky(sigma)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.diag(chol), 1e-12)))
        return logdet + jnp.trace(
            S_emp @ jnp.linalg.inv(sigma)
        )

    def uls_loss(self, params, loss_args):
        S_emp = loss_args["S"]
        sigma = self._implied(params)
        diff = S_emp - sigma
        return jnp.sum(diff**2)

    def gls_loss(self, params, loss_args):
        S_emp = loss_args["S"]
        sigma = self._implied(params)
        S_inv = jnp.linalg.inv(S_emp)
        diff = (S_emp - sigma) @ S_inv
        return jnp.trace(diff @ diff)

    def _implied(self, params):
        (B_mask, S_mask, B_fixed, S_fixed, B_free, S_free) = self._mask_cache
        B = B_fixed + params["B"] * B_free
        # S must stay symmetric PSD-ish: use symmetric parameterization with
        # softplus on the diagonal
        S_raw = params["S"] * S_free
        S_sym = 0.5 * (S_raw + S_raw.T)
        diag = jax.nn.softplus(params["S_diag"])
        S = S_fixed + S_sym - jnp.diag(jnp.diag(S_sym)) + jnp.diag(diag)
        return self.alg.implied_covariance(B, S)

    def fit(self, data, method="ml", opt="adam", lr=0.05, max_iter=2000, exit_delta=1e-6, **kwargs):
        """Fit free parameters to the empirical covariance of ``data``.

        Returns a summary dict with fitted B, S, implied covariance and the
        final loss.
        """
        observed = self.alg.observed
        X = data.loc[:, observed].to_numpy(dtype=np.float64)
        S_emp = jnp.asarray(np.cov(X.T, bias=True))

        self._mask_cache = self._masks()
        n = len(self.alg.variables)
        rng = np.random.default_rng(0)
        params = {
            "B": jnp.asarray(rng.normal(scale=0.1, size=(n, n))),
            "S": jnp.asarray(np.zeros((n, n))),
            "S_diag": jnp.asarray(np.zeros(n)),
        }
        loss_fn = {
            "ml": self.ml_loss,
            "uls": self.uls_loss,
            "gls": self.gls_loss,
        }[method.lower()]

        params = optimize(
            loss_fn,
            params=params,
            loss_args={"S": S_emp},
            opt=opt,
            lr=lr,
            max_iter=max_iter,
            exit_delta=exit_delta,
        )

        (B_mask, S_mask, B_fixed, S_fixed, B_free, S_free) = self._mask_cache
        B = np.asarray(B_fixed + params["B"] * B_free)
        sigma = np.asarray(self._implied(params))
        final_loss = float(loss_fn(params, {"S": S_emp}))

        summary = {
            "variables": self.alg.variables,
            "B": B,
            "Sigma": sigma,
            "S_emp": np.asarray(S_emp),
            "loss": final_loss,
            "params": params,
        }
        return summary


class IVEstimator:
    """Two-stage least squares with instrumental variables.

    Parity: ``SEMEstimator.py:390-466``.
    """

    def __init__(self, model):
        self.model = model

    def fit(self, X, Y, data, ivs=None, civs=None):
        """Estimate the effect X -> Y using instruments ``ivs``."""
        if ivs is None:
            from pgmpy_tpu.inference.causal import CausalInference
            from pgmpy_tpu.base.dag import DAG

            if isinstance(self.model, (SEM, SEMGraph)):
                dag = DAG(list(self.model.graph.edges()))
                dag.add_nodes_from(self.model.graph.nodes())
                dag.latents = set(self.model.latents)
            else:
                dag = self.model
            ivs = sorted(CausalInference(dag).get_ivs(X, Y), key=str)
        if not ivs:
            raise ValueError("No instrumental variables found/specified.")

        Z = np.column_stack(
            [np.ones(data.shape[0])]
            + [data[z].to_numpy(dtype=np.float64) for z in ivs]
        )
        x = data[X].to_numpy(dtype=np.float64)
        y = data[Y].to_numpy(dtype=np.float64)
        # stage 1: x ~ Z
        beta1, _, _, _ = jnp.linalg.lstsq(jnp.asarray(Z), jnp.asarray(x))
        x_hat = Z @ np.asarray(beta1)
        # stage 2: y ~ [1, x_hat]
        W = np.column_stack([np.ones_like(x_hat), x_hat])
        beta2, _, _, _ = jnp.linalg.lstsq(jnp.asarray(W), jnp.asarray(y))
        return float(np.asarray(beta2)[1]), {"ivs": ivs, "stage1": np.asarray(beta1)}
