"""ExpectationMaximization for latent-variable parameter learning.

Reference: ``/root/reference/pgmpy/estimators/EM.py:22-410`` expands each
unique row against every latent-state combination with joblib workers.
TPU design: the expansion is a single device tensor — data codes tiled over
the latent-state grid; the E-step is one jitted log-prob gather over all
nodes + softmax over the latent grid; the M-step reuses the weighted count
kernel.  Convergence by max CPD delta.
"""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import TINY, config, logger
from pgmpy_tpu.estimators.base import _CodedData, ParameterEstimator
from pgmpy_tpu.factors.cpd import TabularCPD


class ExpectationMaximization(ParameterEstimator):
    """EM for latent-variable CPD estimation: the E-step's per-row
    latent-grid log-likelihoods run as one jitted device program, the
    M-step is a weighted batched count.

    Examples
    --------
    >>> import numpy as np
    >>> import pandas as pd
    >>> from pgmpy_tpu.estimators import ExpectationMaximization
    >>> from pgmpy_tpu.models import DiscreteBayesianNetwork
    >>> rng = np.random.default_rng(0)
    >>> h = rng.integers(0, 2, 800)
    >>> df = pd.DataFrame({
    ...     "a": np.where(rng.random(800) < 0.9, h, 1 - h),
    ...     "b": np.where(rng.random(800) < 0.9, h, 1 - h)})
    >>> model = DiscreteBayesianNetwork([("h", "a"), ("h", "b")],
    ...                                 latents={"h"})
    >>> cpds = ExpectationMaximization(model, df).get_parameters(
    ...     seed=0, show_progress=False)
    >>> sorted(c.variable for c in cpds)
    ['a', 'b', 'h']
    >>> vals = next(c for c in cpds if c.variable == "a").get_values()
    >>> bool(abs(vals[0, 0] - vals[0, 1]) > 0.5)  # a tracks the latent
    True
    """

    def __init__(self, model, data, **kwargs):
        from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork

        if not isinstance(model, DiscreteBayesianNetwork):
            raise NotImplementedError(
                "Expectation Maximization is only implemented for DiscreteBayesianNetwork"
            )
        self.model_ = model
        self.model = model
        self.data_orig = data
        observed = [c for c in data.columns if c != "_weight"]
        missing_model_vars = set(model.nodes()) - set(observed)
        if missing_model_vars - set(model.latents):
            raise ValueError(
                f"Columns missing for non-latent variables: {missing_model_vars - set(model.latents)}"
            )
        # BaseEstimator over the observed columns only
        from pgmpy_tpu.estimators.base import BaseEstimator

        BaseEstimator.__init__(self, data, state_names=kwargs.get("state_names"))

    def get_parameters(
        self,
        latent_card=None,
        apply_smoothing=False,
        max_iter=100,
        atol=1e-08,
        n_jobs=1,
        batch_size=1000,
        seed=None,
        init_cpds=None,
        show_progress=True,
    ):
        """EM parameter estimation.  Reference contract
        ``/root/reference/pgmpy/estimators/EM.py:196-207``:
        ``apply_smoothing`` swaps the M-step's MLE counts for
        BayesianEstimator's default BDeu prior (ess=5 spread uniformly over
        each CPD table); ``batch_size`` bounds E-step device memory by
        chunking the expanded (row x latent-combination) tensor;
        ``init_cpds`` accepts a dict, "random", or "uniform".
        """
        model = self.model_
        latents = sorted(model.latents, key=str)
        if latent_card is None:
            latent_card = {var: 2 for var in latents}
        observed_vars = [v for v in self.variables]

        # state names for latents
        state_names = dict(self.state_names)
        for var in latents:
            state_names[var] = list(range(latent_card[var]))
        cards = {v: len(state_names[v]) for v in state_names}

        # initialize CPDs (random unless provided)
        rng = np.random.default_rng(seed)
        if isinstance(init_cpds, str):
            if init_cpds not in ("random", "uniform"):
                raise ValueError(
                    "If `init_cpds` is a string, it must be either 'random' "
                    f"or 'uniform'. Got: {init_cpds}"
                )
            init_mode, init_cpds = init_cpds, None
        else:
            init_mode = "random"
        cpds = {}
        for var in sorted(model.nodes(), key=str):
            parents = sorted(model.get_parents(var), key=str)
            if init_cpds and var in init_cpds:
                cpds[var] = init_cpds[var]
                continue
            if init_mode == "uniform":
                card = cards[var]
                n_cols = int(np.prod([cards[p] for p in parents])) if parents else 1
                cpds[var] = TabularCPD(
                    var,
                    card,
                    np.full((card, n_cols), 1.0 / card),
                    evidence=parents or None,
                    evidence_card=[cards[p] for p in parents] or None,
                    state_names={v: state_names[v] for v in [var] + parents},
                )
                continue
            cpds[var] = TabularCPD.get_random(
                var, evidence=parents or None,
                cardinality={v: cards[v] for v in [var] + parents},
                state_names={v: state_names[v] for v in [var] + parents},
                seed=int(rng.integers(2**31)),
            )

        # expanded code matrix: (n * K, d_all) over all model vars
        var_order = sorted(model.nodes(), key=str)
        var_idx = {v: i for i, v in enumerate(var_order)}
        n = self.data_orig.shape[0]
        obs_codes = np.asarray(self._coded.codes)
        combos = np.array(
            list(itertools.product(*[range(cards[l]) for l in latents])), dtype=np.int32
        )
        K = combos.shape[0] if latents else 1
        expanded = np.zeros((n * K, len(var_order)), dtype=np.int32)
        for v in observed_vars:
            if v in var_idx:
                expanded[:, var_idx[v]] = np.repeat(
                    obs_codes[:, self._coded.var_index[v]], K
                )
        for j, l in enumerate(latents):
            expanded[:, var_idx[l]] = np.tile(combos[:, j], n)
        expanded_j = jnp.asarray(expanded)

        node_specs = []
        for var in var_order:
            parents = sorted(model.get_parents(var), key=str)
            node_specs.append(
                (
                    var_idx[var],
                    tuple(var_idx[p] for p in parents),
                    tuple(cards[p] for p in parents),
                )
            )

        def log_prob(codes, tables):
            lp = jnp.zeros(codes.shape[0], dtype=config.DTYPE)
            for (vi, p_idx, p_cards), table in zip(node_specs, tables):
                # NaN observations carry code -1: clip for the gather and
                # drop the node's term (approximate marginalization of the
                # missing entry) instead of letting -1 wrap to the last state
                valid = codes[:, vi] >= 0
                flat = jnp.zeros(codes.shape[0], dtype=jnp.int32)
                for pj, pc in zip(p_idx, p_cards):
                    valid = valid & (codes[:, pj] >= 0)
                    flat = flat * pc + jnp.maximum(codes[:, pj], 0)
                term = jnp.log(
                    jnp.maximum(table[flat, jnp.maximum(codes[:, vi], 0)], TINY)
                )
                lp = lp + jnp.where(valid, term, 0.0)
            return lp

        @jax.jit
        def e_step_chunk(tables, codes_chunk):
            lp = log_prob(codes_chunk, tables)  # (rows*K,)
            lp = lp.reshape(-1, K)
            w = jax.nn.softmax(lp, axis=1)
            return w.reshape(-1)

        batch_size = max(int(batch_size), 1)

        def e_step(tables):
            if n <= batch_size:
                return e_step_chunk(tables, expanded_j)
            # memory-bounded E-step: pad rows to a multiple of batch_size so
            # every chunk compiles to ONE static shape, then loop chunks
            n_pad = -(-n // batch_size) * batch_size
            if not hasattr(self, "_em_padded") or self._em_padded.shape[0] != n_pad * K:
                pad = np.zeros((n_pad * K, expanded.shape[1]), dtype=np.int32)
                pad[: n * K] = expanded
                self._em_padded = jnp.asarray(pad)
            chunks = []
            for s in range(0, n_pad, batch_size):
                chunks.append(
                    e_step_chunk(
                        tables, self._em_padded[s * K : (s + batch_size) * K]
                    )
                )
            return jnp.concatenate(chunks)[: n * K]

        coded_all = _CodedData.__new__(_CodedData)
        coded_all.variables = var_order
        coded_all.n = n * K
        coded_all.state_names = {v: state_names[v] for v in var_order}
        coded_all.codes = expanded_j
        coded_all.var_index = var_idx
        coded_all.cards = {v: cards[v] for v in var_order}
        coded_all.weights = None

        for iteration in range(int(max_iter)):
            tables = [
                jnp.asarray(np.asarray(cpds[var].get_values(), dtype=np.float64).T, dtype=config.DTYPE)
                for var in var_order
            ]
            weights = e_step(tables)

            specs = [
                (var, sorted(model.get_parents(var), key=str)) for var in var_order
            ]
            tables = coded_all.multi_counts(specs, weights=weights)
            new_cpds = {}
            max_diff = 0.0
            for (var, parents), counts in zip(specs, tables):
                counts = counts.astype(np.float64)
                if apply_smoothing:
                    # BayesianEstimator's default BDeu prior (ess=5): the
                    # equivalent sample size spread uniformly over the table
                    counts = counts + 5.0 / counts.size
                zero_cols = counts.sum(axis=0) == 0
                counts[:, zero_cols] = 1.0
                cpd = TabularCPD(
                    var,
                    cards[var],
                    counts,
                    evidence=parents or None,
                    evidence_card=[cards[p] for p in parents] or None,
                    state_names={v: state_names[v] for v in [var] + parents},
                )
                cpd.normalize()
                max_diff = max(
                    max_diff,
                    float(np.max(np.abs(cpd.get_values() - cpds[var].get_values()))),
                )
                new_cpds[var] = cpd
            cpds = new_cpds
            if max_diff < atol:
                break
        else:
            logger.warning(
                f"EM did not converge within {max_iter} iterations (last delta: {max_diff:.2e})"
            )
        return [cpds[var] for var in var_order]
