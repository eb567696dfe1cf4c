"""Estimator base classes: the learning hot path is a device count kernel.

Reference: ``/root/reference/pgmpy/estimators/base.py:14-427`` computes
``state_counts`` with a pandas groupby per (variable, parents).  Here the
DataFrame is integer-coded ONCE at construction; each count table is one
jitted flat-index ``bincount`` (segment-sum) on device, shared by MLE /
Bayesian / EM / structure scores / CI tests.
"""

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import config


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _bincount_weighted(flat_idx, weights, length):
    from pgmpy_tpu.ops.pallas_kernels import weighted_bincount

    # pallas one-hot MXU kernel on TPU (3.3x the scatter-add lowering);
    # scatter fallback elsewhere
    return weighted_bincount(flat_idx, weights, length)


@partial(jax.jit, static_argnums=(2,))
def _multi_counts_kernel(codes, w, spec):
    """One scatter-add over all (variable, parents) count tables.  ``spec``
    is a hashable (col_lists, all_cards, offsets, total) tuple so jit caches
    the compiled program per spec — EM calls this every iteration with the
    same spec and must not retrace (ADVICE r1)."""
    col_lists, all_cards, offsets, total = spec
    flats = []
    ws = []
    for cols, cards, off in zip(col_lists, all_cards, offsets):
        sub = codes[:, jnp.asarray(cols)]
        valid = jnp.all(sub >= 0, axis=1)
        flat = sub[:, 0]
        for k in range(1, len(cols)):
            flat = flat * cards[k] + sub[:, k]
        flats.append(jnp.where(valid, flat + off, off))
        ws.append(jnp.where(valid, w, 0.0))
    flat_all = jnp.concatenate(flats)
    w_all = jnp.concatenate(ws)
    return jnp.zeros(total, dtype=config.DTYPE).at[flat_all].add(w_all)


class _CodedData:
    """Integer-coded dataset resident on device.  NaN rows are tracked with
    a per-column validity mask (code -1)."""

    def __init__(self, df, state_names=None, weighted=False):
        self.variables = [c for c in df.columns if c != "_weight"]
        self.n = df.shape[0]
        self.state_names = {}
        codes = np.empty((self.n, len(self.variables)), dtype=np.int32)
        for j, var in enumerate(self.variables):
            col = df[var]
            if state_names and var in state_names:
                names = list(state_names[var])
                observed = set(col.dropna().unique())
                if not observed <= set(names):
                    raise ValueError(
                        f"Data contains unexpected states for variable: {var}."
                    )
            else:
                names = col.dropna().unique().tolist()
                try:
                    names = sorted(names)
                except TypeError:
                    names = sorted(names, key=str)
            self.state_names[var] = names
            mapping = {s: i for i, s in enumerate(names)}
            codes[:, j] = np.asarray(
                [mapping.get(x, -1) if not pd.isna(x) else -1 for x in col],
                dtype=np.int32,
            )
        self.codes = jnp.asarray(codes)
        self.var_index = {v: j for j, v in enumerate(self.variables)}
        self.cards = {v: len(self.state_names[v]) for v in self.variables}
        if weighted or "_weight" in df.columns:
            self.weights = jnp.asarray(
                df["_weight"].to_numpy(dtype=np.float64), dtype=config.DTYPE
            )
        else:
            self.weights = None

    def counts(self, variable, parents=(), weights=None, device=False):
        """(var_card, prod(parent_cards)) count matrix, device-computed.
        Rows with a NaN in any involved column are dropped.  With
        ``device=True`` the table stays a jnp array on device (so callers
        like the CI-test statistic kernels can fuse follow-up math without
        a host round-trip)."""
        cols = [self.var_index[variable]] + [self.var_index[p] for p in parents]
        cards = [self.cards[variable]] + [self.cards[p] for p in parents]
        sub = self.codes[:, jnp.asarray(cols)]
        valid = jnp.all(sub >= 0, axis=1)
        flat = sub[:, 0]
        for k in range(1, len(cols)):
            flat = flat * cards[k] + sub[:, k]
        flat = jnp.where(valid, flat, 0)
        # weights=None means UNWEIGHTED (ones) — a stored _weight column is
        # only used when the caller passes it explicitly
        w = weights if weights is not None else jnp.ones((self.n,), dtype=config.DTYPE)
        w = jnp.where(valid, w, 0.0)
        total = int(np.prod(cards))
        table = _bincount_weighted(flat, w, total)
        if device:
            return table.reshape(cards[0], -1)
        return np.asarray(table).reshape(cards[0], -1)

    def multi_counts(self, specs, weights=None):
        """Count tables for many (variable, parents) specs in ONE device
        call: per-spec flat indices are offset into a single scatter-add.

        Returns a list of (var_card, prod(parent_cards)) arrays.
        """
        # weights=None means UNWEIGHTED (see counts())
        w = weights if weights is not None else jnp.ones((self.n,), dtype=config.DTYPE)

        offsets, sizes, all_cards, col_lists = [], [], [], []
        offset = 0
        for variable, parents in specs:
            cols = [self.var_index[variable]] + [self.var_index[p] for p in parents]
            cards = [self.cards[variable]] + [self.cards[p] for p in parents]
            col_lists.append(tuple(cols))
            all_cards.append(tuple(cards))
            offsets.append(offset)
            size = int(np.prod(cards))
            sizes.append(size)
            offset += size
        total = offset

        spec = (tuple(col_lists), tuple(all_cards), tuple(offsets), total)
        combined = np.asarray(_multi_counts_kernel(self.codes, w, spec))
        out = []
        for (variable, parents), off, size, cards in zip(
            specs, offsets, sizes, all_cards
        ):
            out.append(combined[off : off + size].reshape(cards[0], -1))
        return out


class BaseEstimator:
    def __init__(self, data=None, state_names=None, **kwargs):
        self.data = data
        if data is not None:
            self.variables = [c for c in data.columns if c != "_weight"]
            self._coded = _CodedData(
                data, state_names if isinstance(state_names, dict) else None
            )
            self.state_names = self._coded.state_names
        else:
            self.variables = None
            self._coded = None
            self.state_names = {}

    def _collect_state_names(self, variable):
        return list(self.state_names[variable])

    def state_counts(self, variable, parents=[], weighted=False, reindex=True):
        """Count table as a DataFrame (parity with the reference's shape:
        rows = variable states, columns = parent-state MultiIndex)."""
        parents = list(parents)
        if weighted and "_weight" not in self.data.columns:
            raise ValueError("data must contain a `_weight` column if weighted=True")
        weights = (
            self._coded.weights
            if weighted
            else jnp.ones((self._coded.n,), dtype=config.DTYPE)
        )
        table = self._coded.counts(variable, parents, weights=weights)
        index = pd.Index(self.state_names[variable], name=variable)
        if parents:
            columns = pd.MultiIndex.from_product(
                [self.state_names[p] for p in parents], names=parents
            )
            df = pd.DataFrame(table, index=index, columns=columns)
        else:
            df = pd.DataFrame(table, index=index, columns=[""])
        return df


class ParameterEstimator(BaseEstimator):
    def __init__(self, model, data, **kwargs):
        model_vars = set(model.nodes())
        data_vars = set(c for c in data.columns if c != "_weight")
        if model_vars != data_vars:
            raise ValueError(
                f"variable names of the model must be identical to column names in data. "
                f"Missing in data: {model_vars - data_vars}; extra: {data_vars - model_vars}"
            )
        self.model = model
        super().__init__(data, **kwargs)

    def state_counts(self, variable, weighted=False, **kwargs):
        parents = sorted(self.model.get_parents(variable), key=str)
        return super().state_counts(
            variable, parents=parents, weighted=weighted, **kwargs
        )


class StructureEstimator(BaseEstimator):
    def __init__(self, data=None, independencies=None, **kwargs):
        self.independencies = independencies
        super().__init__(data, **kwargs)

    def estimate(self):
        pass


class MarginalEstimator(BaseEstimator):
    """Base for estimators that fit models to empirical clique marginals."""

    def __init__(self, model, data, **kwargs):
        from pgmpy_tpu.factors.factor_dict import FactorDict
        from pgmpy_tpu.models.factor_graph import FactorGraph
        from pgmpy_tpu.models.junction_tree import JunctionTree
        from pgmpy_tpu.models.markov_network import DiscreteMarkovNetwork

        if isinstance(model, FactorGraph):
            model = model.to_markov_model()
        if isinstance(model, DiscreteMarkovNetwork):
            model = model.to_junction_tree()
        if not isinstance(model, JunctionTree):
            raise ValueError(
                "model must be a DiscreteMarkovNetwork, FactorGraph or "
                f"JunctionTree. Got {type(model)}"
            )
        self.theta = None
        self.belief_propagation = None
        self.model = model
        super().__init__(data=data, **kwargs)
        cliques = list(model.nodes())
        self.observed_marginals = FactorDict.from_dataframe(data, cliques)
