"""Decomposable structure scores (K2/BDeu/BDs/LL/BIC/AIC + Gaussian
variants).

Parity: ``/root/reference/pgmpy/estimators/StructureScore.py:15-1737``.
Local scores are lgamma/log reductions over device-computed count tables
(discrete) or lstsq residuals (Gaussian).
"""

import numpy as np
import pandas as pd
from scipy.special import gammaln

from pgmpy_tpu.estimators.base import StructureEstimator


def get_scoring_method(scoring_method, data, use_cache=True):
    scores = {
        "k2": K2,
        "bdeu": BDeu,
        "bds": BDs,
        "bic-d": BIC,
        "bic": BIC,
        "aic-d": AIC,
        "aic": AIC,
        "ll-g": LogLikelihoodGauss,
        "bic-g": BICGauss,
        "aic-g": AICGauss,
        "ll-cg": LogLikelihoodCondGauss,
        "bic-cg": BICCondGauss,
        "aic-cg": AICCondGauss,
        "loglikelihood": LogLikeliHood,
    }
    if isinstance(scoring_method, str):
        key = scoring_method.lower()
        if key not in scores:
            raise ValueError(
                f"Unknown scoring method: {scoring_method}. Options: {sorted(scores)}"
            )
        scorer = scores[key](data)
    elif isinstance(scoring_method, StructureScore):
        scorer = scoring_method
    else:
        raise ValueError(
            "scoring_method should either be a string or an instance of StructureScore"
        )
    if use_cache:
        return scorer, ScoreCache(scorer, data)
    return scorer, scorer


class StructureScore(StructureEstimator):
    def __init__(self, data=None, **kwargs):
        super().__init__(data, **kwargs)

    def score(self, model):
        """Sum of local scores + structure prior."""
        score = 0
        for node in model.nodes():
            score += self.local_score(node, list(model.predecessors(node)))
        score += self.structure_prior(model)
        return score

    def structure_prior(self, model):
        return 0

    def structure_prior_ratio(self, operation):
        return 0

    def local_score(self, variable, parents):
        raise NotImplementedError


class K2(StructureScore):
    def local_score(self, variable, parents):
        counts = self._coded.counts(variable, list(parents)).astype(np.float64)
        var_card = counts.shape[0]
        counts_with_alpha = counts + 1.0
        col_sums = counts_with_alpha.sum(axis=0)
        # Parity quirk (ref StructureScore.py:346-380): the reference drops
        # all-zero parent configurations from the conditional term
        # (reindex=False, zero-column adjustment commented out there) but
        # still adds lgamma(r) for EVERY parent configuration — so an
        # unobserved configuration nets +lgamma(r) instead of 0.
        observed = counts.sum(axis=0) > 0
        score = float(
            np.sum(gammaln(counts_with_alpha))
            - np.sum(gammaln(col_sums[observed]))
        )
        score += counts.shape[1] * float(gammaln(var_card))
        return score


class BDeu(StructureScore):
    def __init__(self, data=None, equivalent_sample_size=10, **kwargs):
        self.equivalent_sample_size = equivalent_sample_size
        super().__init__(data, **kwargs)

    def local_score(self, variable, parents):
        counts = self._coded.counts(variable, list(parents)).astype(np.float64)
        var_card, n_configs = counts.shape
        alpha = self.equivalent_sample_size / n_configs
        beta = self.equivalent_sample_size / counts.size
        col_sums = counts.sum(axis=0)
        score = float(
            np.sum(gammaln(counts + beta))
            - n_configs * var_card * gammaln(beta)
            + n_configs * gammaln(alpha)
            - np.sum(gammaln(col_sums + alpha))
        )
        return score


class BDs(BDeu):
    """BDeu with prior spread only over *observed* parent configurations."""

    def structure_prior_ratio(self, operation):
        nodes_num = len(self.variables)
        if operation == "+":
            return -np.log(nodes_num - 1)
        if operation == "-":
            return np.log(nodes_num - 1)
        return 0

    def structure_prior(self, model):
        nedges = float(len(model.edges()))
        nodes_num = len(model.nodes())
        return -(nedges + float(nodes_num) * (float(nodes_num) - 1) / 2) * np.log(
            nodes_num - 1
        ) if nodes_num > 1 else 0

    def local_score(self, variable, parents):
        counts = self._coded.counts(variable, list(parents)).astype(np.float64)
        var_card = counts.shape[0]
        col_sums = counts.sum(axis=0)
        observed = col_sums > 0
        n_obs_configs = max(int(observed.sum()), 1)
        alpha = self.equivalent_sample_size / n_obs_configs
        beta = self.equivalent_sample_size / (n_obs_configs * var_card)
        counts = counts[:, observed]
        col_sums = col_sums[observed]
        score = float(
            np.sum(gammaln(counts + beta))
            - counts.size * gammaln(beta)
            + n_obs_configs * gammaln(alpha)
            - np.sum(gammaln(col_sums + alpha))
        )
        return score


class LogLikeliHood(StructureScore):
    def local_score(self, variable, parents):
        counts = self._coded.counts(variable, list(parents)).astype(np.float64)
        col_sums = counts.sum(axis=0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            log_ratio = np.where(
                counts > 0, np.log(counts) - np.log(col_sums), 0.0
            )
        return float(np.sum(counts * log_ratio))


class BIC(LogLikeliHood):
    def local_score(self, variable, parents):
        counts = self._coded.counts(variable, list(parents)).astype(np.float64)
        sample_size = counts.sum()
        var_card, n_configs = counts.shape
        ll = LogLikeliHood.local_score(self, variable, parents)
        num_params = n_configs * (var_card - 1)
        return ll - 0.5 * np.log(max(sample_size, 1)) * num_params


class AIC(LogLikeliHood):
    def local_score(self, variable, parents):
        counts = self._coded.counts(variable, list(parents)).astype(np.float64)
        var_card, n_configs = counts.shape
        ll = LogLikeliHood.local_score(self, variable, parents)
        num_params = n_configs * (var_card - 1)
        return ll - num_params


# deprecated alias used by the reference
BicScore = BIC
AicScore = AIC
K2Score = K2
BDeuScore = BDeu
BDsScore = BDs


class _GaussBase(StructureScore):
    """Gaussian local scores from linear-regression residuals (jnp lstsq)."""

    def _residual_ll(self, variable, parents):
        import jax.numpy as jnp

        y = self.data[variable].to_numpy(dtype=np.float64)
        n = y.shape[0]
        if parents:
            X = np.column_stack(
                [np.ones(n)] + [self.data[p].to_numpy(dtype=np.float64) for p in parents]
            )
            beta, _, _, _ = jnp.linalg.lstsq(jnp.asarray(X), jnp.asarray(y))
            resid = y - X @ np.asarray(beta)
        else:
            resid = y - y.mean()
        sigma2 = max(float(np.mean(resid**2)), 1e-12)
        ll = -0.5 * n * (np.log(2 * np.pi * sigma2) + 1)
        k = len(parents) + 2  # intercept + coefficients + variance
        return ll, k, n


class LogLikelihoodGauss(_GaussBase):
    def local_score(self, variable, parents):
        ll, _, _ = self._residual_ll(variable, list(parents))
        return ll


class BICGauss(_GaussBase):
    def local_score(self, variable, parents):
        ll, k, n = self._residual_ll(variable, list(parents))
        return ll - 0.5 * k * np.log(max(n, 1))


class AICGauss(_GaussBase):
    def local_score(self, variable, parents):
        ll, k, n = self._residual_ll(variable, list(parents))
        return ll - k


class _CondGaussBase(StructureScore):
    """Conditional-linear-Gaussian local scores for MIXED data
    (reference: ``StructureScore.py:1192-1737``).

    * continuous child: per discrete-parent configuration, a linear
      regression on the continuous parents (jnp lstsq residuals).
    * discrete child with continuous parents: multinomial logistic
      regression fitted with a few optax steps.
    * discrete child with only discrete parents: the plain discrete LL.
    """

    def _split_parents(self, parents):
        disc, cont = [], []
        for p in parents:
            if pd.api.types.is_float_dtype(self.data[p]):
                cont.append(p)
            else:
                disc.append(p)
        return disc, cont

    def _ll_continuous_child(self, variable, disc_parents, cont_parents):
        import itertools as it

        import jax.numpy as jnp

        y_all = self.data[variable].to_numpy(dtype=np.float64)
        n = len(y_all)
        if disc_parents:
            groups = self.data.groupby(disc_parents, observed=True).indices
        else:
            groups = {None: np.arange(n)}
        # pooled (parent-free) model: fallback scorer for configurations too
        # small to fit a regression, so every candidate parent set is scored
        # on the same n rows — otherwise fragmenting parents silently drop
        # (typically negative) terms and get inflated LL (ADVICE r1)
        pooled_mean = float(y_all.mean()) if n else 0.0
        pooled_sigma2 = max(float(np.mean((y_all - pooled_mean) ** 2)), 1e-12) if n else 1.0
        ll = 0.0
        k = 0
        for _, idx in groups.items():
            y = y_all[idx]
            if len(y) < len(cont_parents) + 2:
                resid = y - pooled_mean
                ll += -0.5 * (
                    len(y) * np.log(2 * np.pi * pooled_sigma2)
                    + float(np.sum(resid**2)) / pooled_sigma2
                )
                k += len(cont_parents) + 2
                continue
            if cont_parents:
                X = np.column_stack(
                    [np.ones(len(idx))]
                    + [
                        self.data[p].to_numpy(dtype=np.float64)[idx]
                        for p in cont_parents
                    ]
                )
                beta, _, _, _ = jnp.linalg.lstsq(jnp.asarray(X), jnp.asarray(y))
                resid = y - X @ np.asarray(beta)
            else:
                resid = y - y.mean()
            sigma2 = max(float(np.mean(resid**2)), 1e-12)
            ll += -0.5 * len(y) * (np.log(2 * np.pi * sigma2) + 1)
            k += len(cont_parents) + 2
        return ll, k, n

    def _ll_discrete_child(self, variable, disc_parents, cont_parents):
        n = self.data.shape[0]
        if not cont_parents:
            ll = LogLikeliHood.local_score(self, variable, disc_parents)
            counts = self._coded.counts(variable, list(disc_parents))
            k = counts.shape[1] * (counts.shape[0] - 1)
            return ll, k, n
        # multinomial logistic regression of the child on [continuous
        # parents + one-hot discrete parents]
        import jax
        import jax.numpy as jnp
        import optax

        names = self._coded.state_names[variable]
        card = len(names)
        y = jnp.asarray(
            self.data[variable]
            .map({s: i for i, s in enumerate(names)})
            .to_numpy(dtype=np.int32)
        )
        feats = [np.ones(n)]
        feats += [self.data[p].to_numpy(dtype=np.float64) for p in cont_parents]
        for p in disc_parents:
            p_names = self._coded.state_names[p]
            codes = self.data[p].map({s: i for i, s in enumerate(p_names)}).to_numpy()
            onehot = np.eye(len(p_names))[codes][:, 1:]  # drop baseline
            feats.append(onehot)
        X = jnp.asarray(np.column_stack(feats))
        d = X.shape[1]
        W0 = jnp.zeros((d, card))

        def nll(W):
            logits = X @ W
            return -jnp.sum(
                jax.nn.log_softmax(logits, axis=1)[jnp.arange(n), y]
            )

        tx = optax.adam(0.1)
        state = tx.init(W0)
        W = W0

        @jax.jit
        def step(W, state):
            loss, grads = jax.value_and_grad(nll)(W)
            updates, state = tx.update(grads, state, W)
            return optax.apply_updates(W, updates), state, loss

        prev = None
        for _ in range(300):
            W, state, loss = step(W, state)
            loss = float(loss)
            if prev is not None and abs(prev - loss) < 1e-4:
                break
            prev = loss
        k = d * (card - 1)
        return -loss, k, n

    def _local(self, variable, parents):
        parents = list(parents)
        disc_parents, cont_parents = self._split_parents(parents)
        if pd.api.types.is_float_dtype(self.data[variable]):
            return self._ll_continuous_child(variable, disc_parents, cont_parents)
        return self._ll_discrete_child(variable, disc_parents, cont_parents)


class LogLikelihoodCondGauss(_CondGaussBase):
    def local_score(self, variable, parents):
        ll, _, _ = self._local(variable, parents)
        return ll


class BICCondGauss(_CondGaussBase):
    def local_score(self, variable, parents):
        ll, k, n = self._local(variable, parents)
        return ll - 0.5 * k * np.log(max(n, 1))


class AICCondGauss(_CondGaussBase):
    def local_score(self, variable, parents):
        ll, k, n = self._local(variable, parents)
        return ll - k


class ScoreCache(StructureScore):
    """LRU cache over (variable, parents) local scores
    (reference: ``estimators/ScoreCache.py:18-124``)."""

    def __init__(self, base_scorer, data, max_size=10000, **kwargs):
        if not isinstance(base_scorer, StructureScore):
            raise TypeError("base_scorer must be an instance of StructureScore")
        from pgmpy_tpu.utils.cache import LRUDict

        self.base_scorer = base_scorer
        self.max_size = max_size
        self._cache = LRUDict(max_size=max_size)
        super().__init__(data, **kwargs)

    def local_score(self, variable, parents):
        key = (variable, tuple(sorted(parents, key=str)))
        if key in self._cache:
            # true LRU: a hit refreshes recency (ref ScoreCache.py:18-124)
            return self._cache[key]
        score = self.base_scorer.local_score(variable, list(parents))
        self._cache[key] = score
        return score

    def structure_prior(self, model):
        return self.base_scorer.structure_prior(model)

    def structure_prior_ratio(self, operation):
        return self.base_scorer.structure_prior_ratio(operation)
