"""Compiled ancestral sampler: the device program behind all forward-style
sampling.

Reference hot path (``/root/reference/pgmpy/sampling/Sampling.py:30-409``,
``mathext.py:150-212``): a per-node Python loop with np.unique dedup and
np.random.choice per unique parent row.  TPU-native redesign: CPTs are
stacked per node as ``(prod(parent_cards), card)`` log-prob tables in HBM;
one jitted program walks the (static) topological order, gathers each
node's parent columns, forms flat parent-config indices, and draws all n
samples at once with ``jax.random.categorical`` — the batch dimension IS
the vectorization, no host round-trips.  Likelihood weighting accumulates
``log p(evidence | parents)`` in the same sweep.  Chains/samples shard over
a device mesh via ``pgmpy_tpu.parallel``.
"""

import networkx as nx
import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import config

_NEG_INF = -1e30

# One-hot tile budget for table-row lookups: TPU gathers serialize per
# element, so (n, card) row fetches go through the MXU as
# ``one_hot(idx) @ table`` whenever the (n, n_rows) one-hot stays within
# ~1 GB f32 AND the table is narrow enough for the one-hot to pay off.
ONEHOT_MAX_ROWS = 4096
ONEHOT_MAX_ELEMS = 1 << 28


def onehot_table_rows(table, idx, n, max_rows=ONEHOT_MAX_ROWS,
                      max_elems=ONEHOT_MAX_ELEMS):
    """(n, card) rows of ``table`` selected by ``idx`` — an MXU one-hot
    contraction where the tile fits, else a gather.  Shared by the
    ancestral sampler and the Gibbs kernel (both were gather-bound)."""
    from pgmpy_tpu.ops.einsum import PRECISION

    n_rows = table.shape[0]
    if n_rows <= max_rows and n * n_rows <= max_elems:
        onehot = jax.nn.one_hot(idx, n_rows, dtype=table.dtype)
        return jax.lax.dot_general(
            onehot,
            table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=PRECISION,
        )
    return table[idx]


class CompiledAncestralSampler:
    """Compile a DiscreteBayesianNetwork into a device sampling program."""

    def __init__(self, model):
        model.check_model()
        self.model = model
        self.variables = list(nx.topological_sort(model))
        self.topological_order = self.variables  # reference-name alias
        self.var_index = {v: i for i, v in enumerate(self.variables)}
        self.cards = [model.get_cardinality(v) for v in self.variables]
        self.cardinality = dict(zip(self.variables, self.cards))
        self.state_names = {
            v: model.get_cpds(v).state_names[v] for v in self.variables
        }

        self._node_specs = []
        for v in self.variables:
            cpd = model.get_cpds(v)
            evidence = cpd.variables[1:]
            parent_idx = tuple(self.var_index[p] for p in evidence)
            parent_cards = tuple(int(c) for c in cpd.cardinality[1:])
            # (prod(parent_cards), card): row = flat parent config
            table = np.asarray(cpd.get_values(), dtype=np.float64).T
            log_table = jnp.asarray(
                np.log(np.maximum(table, 1e-38)), dtype=config.DTYPE
            )
            # strides for flat index: C-order over parents (last fastest)
            strides = []
            acc = 1
            for c in reversed(parent_cards):
                strides.append(acc)
                acc *= c
            strides = tuple(reversed(strides))
            self._node_specs.append((parent_idx, strides, log_table))

        # sample codes leave the device in int8 when every cardinality
        # fits: the tunnel moves bulk arrays at ~30 MB/s, so shrinking the
        # (n, d) transfer 4x is the single biggest lever on sampling wall
        # time (the compiled program itself runs in ~7 ms per 100k ALARM
        # rows)
        self._out_dtype = (
            jnp.int8 if max(self.cards, default=2) < 128 else jnp.int32
        )
        self._forward_jit = jax.jit(self._forward, static_argnums=(1,))
        self._forward_partial_jit = jax.jit(
            self._forward_partial, static_argnums=(1,)
        )
        self._lw_jit = jax.jit(self._likelihood_weighted, static_argnums=(1, 2))

    # ------------------------------------------------------------------ #
    # reference BayesianModelInference surface (ref sampling/base.py:38-160):
    # host-side CPD slicing tables used by external callers; the compiled
    # sampler itself never needs them.
    # ------------------------------------------------------------------ #
    def pre_compute_reduce(self, variable):
        """{parent-state tuple (reversed evidence order): reduced values}."""
        import itertools

        cpd = self.model.get_cpds(variable)
        evid = cpd.variables[:0:-1]
        vals = np.asarray(cpd.values, dtype=np.float64)
        cached = {}
        for sc in itertools.product(*[range(self.cardinality[v]) for v in evid]):
            index = [slice(None)] * vals.ndim
            for v, s in zip(evid, sc):
                index[cpd.variables.index(v)] = s
            cached[sc] = vals[tuple(index)]
        return cached

    def pre_compute_reduce_maps(self, variable, evidence=None,
                                state_combinations=None):
        """(state-combination -> weight index, weight index -> weight array)
        with non-``evidence`` parents marginalized out."""
        import itertools

        cpd = self.model.get_cpds(variable)
        if evidence is None:
            evidence = [
                v for v in cpd.variables[1:] if v not in self.model.latents
            ]
        if state_combinations is None:
            state_combinations = [
                tuple(sc)
                for sc in itertools.product(
                    *[range(self.cardinality[v]) for v in evidence]
                )
            ]
        vals = np.asarray(cpd.values, dtype=np.float64)
        reduce_index = [cpd.variables.index(v) for v in evidence]
        rows = []
        for sc in state_combinations:
            index = [slice(None)] * vals.ndim
            for ax, s in zip(reduce_index, sc):
                index[ax] = s
            reduced = vals[tuple(index)]
            # marginalize every remaining non-child axis
            marg = reduced.reshape(reduced.shape[0], -1).sum(axis=1)
            rows.append(marg / marg.sum())
        weights_list = np.stack(rows)
        unique_weights, weights_indices = np.unique(
            weights_list, axis=0, return_inverse=True
        )
        state_to_index = dict(zip(state_combinations, weights_indices))
        index_to_weight = dict(enumerate(unique_weights))
        return state_to_index, index_to_weight

    # ------------------------------------------------------------------ #
    def _parent_flat(self, columns, parent_idx, strides):
        if not parent_idx:
            return jnp.int32(0)  # unused: callers branch on parent_idx
        flat = columns[parent_idx[0]] * strides[0]
        for pi, st in zip(parent_idx[1:], strides[1:]):
            flat = flat + columns[pi] * st
        return flat

    def _table_rows(self, log_table, flat, n):
        """(n, card) CPT rows for the flat parent configs (see
        :func:`onehot_table_rows`)."""
        return onehot_table_rows(log_table, flat, n)

    def _forward(self, key, n, given):
        """given: (d,) int32, -1 = sample, >=0 = clamp to that state for all
        rows (used for root evidence / do); per-row partials handled via
        ``partial`` in the public API."""
        keys = jax.random.split(key, len(self.variables))
        columns = [None] * len(self.variables)
        for i, (parent_idx, strides, log_table) in enumerate(self._node_specs):
            flat = self._parent_flat(columns, parent_idx, strides)
            if parent_idx:
                logits = self._table_rows(log_table, flat, n)  # (n, card)
            else:
                logits = jnp.broadcast_to(log_table[0], (n, log_table.shape[1]))
            draw = jax.random.categorical(keys[i], logits, axis=-1).astype(jnp.int32)
            columns[i] = jnp.where(given[i] >= 0, given[i], draw)
        return jnp.stack(columns, axis=1).astype(self._out_dtype)

    def _forward_partial(self, key, n, given, partial):
        """Like ``_forward`` but with a per-row (n, d) ``partial`` array:
        entries >= 0 replace the draw for that row BEFORE children are
        sampled, so descendants condition on the supplied values (ref
        Sampling.py:99-146 uses partial values as the node's samples).
        Clamps (``given``, from do-interventions) take precedence."""
        keys = jax.random.split(key, len(self.variables))
        columns = [None] * len(self.variables)
        for i, (parent_idx, strides, log_table) in enumerate(self._node_specs):
            flat = self._parent_flat(columns, parent_idx, strides)
            if parent_idx:
                logits = self._table_rows(log_table, flat, n)
            else:
                logits = jnp.broadcast_to(log_table[0], (n, log_table.shape[1]))
            draw = jax.random.categorical(keys[i], logits, axis=-1).astype(jnp.int32)
            draw = jnp.where(partial[:, i] >= 0, partial[:, i], draw)
            columns[i] = jnp.where(given[i] >= 0, given[i], draw)
        return jnp.stack(columns, axis=1).astype(self._out_dtype)

    def _likelihood_weighted(self, key, n, evidence_tuple):
        """evidence_tuple: tuple of (var_index, state).  Returns (samples,
        log_weights)."""
        ev = dict(evidence_tuple)
        keys = jax.random.split(key, len(self.variables))
        columns = [None] * len(self.variables)
        logw = jnp.zeros((n,), dtype=config.DTYPE)
        for i, (parent_idx, strides, log_table) in enumerate(self._node_specs):
            flat = self._parent_flat(columns, parent_idx, strides)
            if parent_idx:
                logits = self._table_rows(log_table, flat, n)
            else:
                logits = jnp.broadcast_to(log_table[0], (n, log_table.shape[1]))
            if i in ev:
                state = ev[i]
                columns[i] = jnp.full((n,), state, dtype=jnp.int32)
                logw = logw + logits[:, state]
            else:
                columns[i] = jax.random.categorical(
                    keys[i], logits, axis=-1
                ).astype(jnp.int32)
        return jnp.stack(columns, axis=1).astype(self._out_dtype), logw

    # ------------------------------------------------------------------ #
    def forward(self, n, seed=None, clamp=None, partial=None):
        """Draw n ancestral samples; returns integer codes (n, d) —
        int8 when every cardinality < 128 (cheap device-to-host
        transfer), int32 otherwise.  Upcast before any stride/flat-index
        arithmetic on the result.

        clamp: {var: state_index} fixed states (roots/do-interventions).
        partial: (n, d) int32 array with -1 where sampling is needed.
        """
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )
        given = np.full(len(self.variables), -1, dtype=np.int32)
        if clamp:
            for var, state in clamp.items():
                given[self.var_index[var]] = state
        if partial is not None:
            return self._forward_partial_jit(
                key, int(n), jnp.asarray(given),
                jnp.asarray(partial, dtype=jnp.int32),
            )
        return self._forward_jit(key, int(n), jnp.asarray(given))

    def likelihood_weighted(self, n, evidence, seed=None):
        """evidence: {var: state_index}.  Returns (codes, log_weights)."""
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )
        ev = tuple(
            sorted((self.var_index[v], int(s)) for v, s in evidence.items())
        )
        return self._lw_jit(key, int(n), ev)

    def rejection(self, n, evidence, seed=None, batch_size=None, max_batches=1000):
        """Rejection sampling: forward batches, keep rows matching evidence.

        Root evidence is clamped for free (exact); only non-root evidence
        costs rejections.
        """
        roots = {
            v: s
            for v, s in evidence.items()
            if not self._node_specs[self.var_index[v]][0]
        }
        rest = {v: s for v, s in evidence.items() if v not in roots}
        rng = np.random.default_rng(seed)
        if not rest:
            return self.forward(
                n, seed=int(rng.integers(2**31)), clamp=roots
            )

        check_idx = np.asarray([self.var_index[v] for v in rest])
        check_val = np.asarray([int(s) for s in rest.values()])
        collected = []
        total = 0
        batch = batch_size or max(int(n), 1024)
        for _ in range(max_batches):
            codes = np.asarray(
                self.forward(batch, seed=int(rng.integers(2**31)), clamp=roots)
            )
            mask = (codes[:, check_idx] == check_val).all(axis=1)
            hits = codes[mask]
            if hits.size:
                collected.append(hits)
                total += hits.shape[0]
            if total >= n:
                break
            # adapt batch size to the observed acceptance rate
            accept_rate = max(mask.mean(), 1e-4)
            batch = int(min(max((n - total) / accept_rate * 1.2, 1024), 2_000_000))
        if total < n:
            raise ValueError(
                f"Rejection sampling failed to collect {n} samples "
                f"(got {total}); evidence probability too low — use "
                "likelihood_weighted_sample instead."
            )
        return jnp.asarray(np.concatenate(collected, axis=0)[:n])

    # ------------------------------------------------------------------ #
    def to_dataframe(self, codes, include_latents=True):
        import pandas as pd

        codes = np.asarray(codes)
        # build the categorical columns directly (one pass, no int
        # DataFrame + per-column reassignment churn)
        keep = [
            v for v in self.variables
            if include_latents or v not in self.model.latents
        ]
        return pd.DataFrame(
            {
                v: pd.Categorical.from_codes(
                    codes[:, self.var_index[v]],
                    categories=self.state_names[v],
                )
                for v in keep
            },
            copy=False,
        )
