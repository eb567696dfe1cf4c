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


@partial(jax.jit, static_argnums=(5, 6))
def _padded_counts_matmul_kernel(codes, w, col_idx, cards, spec_w, m, n_chunk):
    """Batched count tables as a one-hot MXU contraction instead of a
    scatter-add.  TPU scatter lowers to serialized updates (~17 ns/elem
    measured on v5e — 136 ms for an 800-spec x 10k-row PC level batch);
    building the per-chunk one-hot and contracting on the MXU is
    bandwidth-bound at s*n*m*4 bytes instead, ~25-50x faster for the
    small tables (m <= ~1k) structure learning produces.

    Returns the (s, m) table matrix: row i is spec i's flattened count
    table in its first ``size_i`` entries.
    """
    codes = codes.astype(jnp.int32)
    s = col_idx.shape[0]
    k = col_idx.shape[1]
    flat = jnp.zeros((s, codes.shape[0]), dtype=jnp.int32)
    valid = jnp.ones((s, codes.shape[0]), dtype=bool)
    for j in range(k):  # k <= 8, static unroll over spec columns
        cj = col_idx[:, j]
        real = cj >= 0
        code_j = codes[:, jnp.where(real, cj, 0)].T  # (s, n)
        code_j = jnp.where(real[:, None], code_j, 0)
        valid = valid & (code_j >= 0)
        flat = flat * cards[:, j][:, None] + jnp.maximum(code_j, 0)
    wgt = jnp.where(valid, w[None, :] * spec_w[:, None], 0.0)
    flat = jnp.clip(flat, 0, m - 1)

    n = flat.shape[1]
    pad = (-n) % n_chunk
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
        wgt = jnp.pad(wgt, ((0, 0), (0, pad)))
    n_chunks = flat.shape[1] // n_chunk
    flat_c = flat.reshape(s, n_chunks, n_chunk).transpose(1, 0, 2)
    wgt_c = wgt.reshape(s, n_chunks, n_chunk).transpose(1, 0, 2)
    iota = jnp.arange(m, dtype=jnp.int32)

    def body(acc, xs):
        f, ww = xs
        onehot = (f[:, :, None] == iota).astype(config.DTYPE)  # (s, C, m)
        acc = acc + jax.lax.dot_general(
            ww[:, None, :],
            onehot,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]
        return acc, None

    out, _ = jax.lax.scan(
        body, jnp.zeros((s, m), dtype=config.DTYPE), (flat_c, wgt_c)
    )
    return out


@partial(jax.jit, static_argnums=(6,))
def _padded_counts_kernel(codes, w, col_idx, cards, offsets, spec_w, total):
    """Shape-stable batched count kernel: many (variable, parents) tables
    in one scatter-add, with the spec list passed as PADDED DATA (not a
    static tuple).  The compiled program is keyed only on
    (n_rows, n_specs_bucket, max_cols_bucket, total_bucket), so search
    loops (HillClimb/GES/PC) whose spec lists change every iteration reuse
    one compiled program instead of retracing ``_multi_counts_kernel``.

    col_idx (s, k) int32, -1 = padding column; cards (s, k) int32, 1 on
    padding; offsets (s,) int32 start of each spec's table; spec_w (s,)
    1.0 for real specs / 0.0 for padding rows.
    """
    codes = codes.astype(jnp.int32)
    s, k = col_idx.shape
    flat = jnp.zeros((s, codes.shape[0]), dtype=jnp.int32)
    valid = jnp.ones((s, codes.shape[0]), dtype=bool)
    for j in range(k):  # k <= 8, static unroll over spec columns
        cj = col_idx[:, j]
        real = cj >= 0
        code_j = codes[:, jnp.where(real, cj, 0)].T  # (s, n)
        code_j = jnp.where(real[:, None], code_j, 0)
        valid = valid & (code_j >= 0)
        flat = flat * cards[:, j][:, None] + jnp.maximum(code_j, 0)
    idx = jnp.clip(flat + offsets[:, None], 0, total - 1)
    wgt = jnp.where(valid, w[None, :] * spec_w[:, None], 0.0)
    return (
        jnp.zeros(total, dtype=config.DTYPE)
        .at[idx.reshape(-1)]
        .add(wgt.reshape(-1))
    )


@partial(jax.jit, static_argnums=(2,))
def _multi_counts_kernel(codes, w, spec):
    """One scatter-add over all (variable, parents) count tables.  ``spec``
    is a hashable (col_lists, all_cards, offsets, total) tuple so jit caches
    the compiled program per spec — EM calls this every iteration with the
    same spec and must not retrace (ADVICE r1)."""
    col_lists, all_cards, offsets, total = spec
    codes = codes.astype(jnp.int32)
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

    # class-level default: EM builds instances via __new__ (skipping
    # __init__), and `self.n_dispatches += 1` still works — the read falls
    # back to the class attribute, the write lands on the instance
    n_dispatches = 0

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
            elif isinstance(col.dtype, pd.CategoricalDtype):
                # fast path for categorical input (what simulate() returns):
                # reuse the existing codes and remap through a small
                # permutation instead of re-factorizing 100k+ rows — the
                # hash-based pd.Categorical() below was the dominant cost
                # of MLE fits on large frames.  Semantics identical to the
                # generic path: state names = OBSERVED values, sorted.
                cats = list(col.cat.categories)
                raw = np.asarray(col.cat.codes, dtype=np.int32)  # -1 = NaN
                seen = np.bincount(raw[raw >= 0], minlength=len(cats)) > 0
                observed = [c for c, s in zip(cats, seen) if s]
                try:
                    names = sorted(observed)
                except TypeError:
                    names = sorted(observed, key=str)
                pos = {c: i for i, c in enumerate(names)}
                remap = np.full(len(cats) + 1, -1, dtype=np.int32)
                for i, c in enumerate(cats):
                    if seen[i]:
                        remap[i] = pos[c]
                self.state_names[var] = names
                codes[:, j] = remap[raw]  # raw -1 hits the trailing -1
                continue
            else:
                names = col.dropna().unique().tolist()
                try:
                    names = sorted(names)
                except TypeError:
                    names = sorted(names, key=str)
            self.state_names[var] = names
            # vectorized coding: pd.Categorical maps values -> positions in
            # `names` in C (unknown values and NaN both code to -1); the
            # old per-row python loop cost seconds per million rows
            codes[:, j] = np.asarray(
                pd.Categorical(col, categories=names).codes, dtype=np.int32
            )
        # upload int8 when every cardinality fits (NaN code -1 included):
        # the host->device link moves bulk arrays slowly (~30 MB/s via the
        # tunnel), and a 100k x 37 frame is 14.8 MB as int32 vs 3.7 as
        # int8 — the upload dominated large MLE fits.  Kernels upcast to
        # int32 before any index arithmetic.
        if all(c < 128 for c in map(len, self.state_names.values())):
            codes = codes.astype(np.int8)
        self.codes = jnp.asarray(codes)
        self.var_index = {v: j for j, v in enumerate(self.variables)}
        self.cards = {v: len(self.state_names[v]) for v in self.variables}
        # device-dispatch odometer: every counts()/multi_counts() call is
        # one (or, for huge batches, a few chunked) device program launch.
        # Tests assert PC levels / HillClimb iterations stay O(1) dispatches.
        self.n_dispatches = 0  # shadow the class default per instance
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
        sub = self.codes[:, jnp.asarray(cols)].astype(jnp.int32)
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
        self.n_dispatches += 1
        table = _bincount_weighted(flat, w, total)
        if device:
            return table.reshape(cards[0], -1)
        return np.asarray(table).reshape(cards[0], -1)

    # Cap on (n_specs x n_rows) per kernel launch: the kernel concatenates
    # one flat-index vector per spec, so a 5000-spec x 100k-row batch would
    # materialize 2 GB of indices in one program.  Chunking keeps peak
    # device memory ~128 MB while the dispatch count stays O(1)-ish.
    _MULTI_COUNTS_MAX_ELEMS = 1 << 24
    # above this (bucketed) max table size the one-hot contraction's
    # s*n*m work exceeds the serialized scatter's s*n — use scatter
    _MATMUL_MAX_TABLE = 1024

    def multi_counts(self, specs, weights=None):
        """Count tables for many (variable, parents) specs in ONE device
        call (a few chunked calls for very large batches): per-spec flat
        indices are offset into a single scatter-add.

        Returns a list of (var_card, prod(parent_cards)) arrays.
        """
        # weights=None means UNWEIGHTED (see counts())
        w = weights if weights is not None else jnp.ones((self.n,), dtype=config.DTYPE)

        specs = list(specs)
        chunk = max(1, self._MULTI_COUNTS_MAX_ELEMS // max(self.n, 1))
        if len(specs) > chunk:
            out = []
            for i in range(0, len(specs), chunk):
                out.extend(self.multi_counts(specs[i : i + chunk], weights=weights))
            return out

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
        self.n_dispatches += 1
        combined = np.asarray(_multi_counts_kernel(self.codes, w, spec))
        out = []
        for (variable, parents), off, size, cards in zip(
            specs, offsets, sizes, all_cards
        ):
            out.append(combined[off : off + size].reshape(cards[0], -1))
        return out


    def multi_counts_padded(self, specs, weights=None):
        """Like :meth:`multi_counts` but through the shape-stable padded
        kernel — use for DYNAMIC spec lists (structure-search iterations,
        per-level CI-test batches) where the static-spec kernel would
        retrace on every call.  Spec-count / column-count / output-size are
        bucketed to powers of two so successive iterations share one
        compiled program.

        Returns a list of (var_card, prod(parent_cards)) float arrays
        (exact integers for unweighted data).
        """
        specs = list(specs)
        if not specs:
            return []
        w = weights if weights is not None else jnp.ones((self.n,), dtype=config.DTYPE)

        # chunk: bound both the (s x n) index tensor and the int32 offsets
        max_specs = max(1, self._MULTI_COUNTS_MAX_ELEMS // max(self.n, 1))
        if len(specs) > max_specs:
            out = []
            for i in range(0, len(specs), max_specs):
                out.extend(
                    self.multi_counts_padded(specs[i : i + max_specs], weights=weights)
                )
            return out

        s_real = len(specs)
        cols_l, cards_l, sizes = [], [], []
        for variable, parents in specs:
            cols = [self.var_index[variable]] + [self.var_index[p] for p in parents]
            cards = [self.cards[variable]] + [self.cards[p] for p in parents]
            cols_l.append(cols)
            cards_l.append(cards)
            sizes.append(int(np.prod(cards)))
        total_real = int(np.sum(sizes))
        if total_real > (1 << 26):
            # huge tables: fall back to per-half recursion to keep the
            # scatter output (and its power-of-two bucket) bounded
            half = max(1, s_real // 2)
            if s_real == 1:
                return self.multi_counts(specs, weights=weights)
            return self.multi_counts_padded(
                specs[:half], weights=weights
            ) + self.multi_counts_padded(specs[half:], weights=weights)

        k_real = max(len(c) for c in cols_l)
        # power-of-two buckets -> stable compiled shapes across iterations
        s_pad = 1 << max(3, (s_real - 1).bit_length())
        k_pad = 1 << max(0, (k_real - 1).bit_length())
        total = 1 << max(10, (total_real - 1).bit_length())
        m_real = max(sizes)
        m = 1 << max(3, (m_real - 1).bit_length())

        col_idx = np.full((s_pad, k_pad), -1, dtype=np.int32)
        cards_a = np.ones((s_pad, k_pad), dtype=np.int32)
        offsets = np.zeros(s_pad, dtype=np.int32)
        spec_w = np.zeros(s_pad, dtype=np.float32)
        off = 0
        for i, (cols, cards) in enumerate(zip(cols_l, cards_l)):
            # left-pad so the running product semantics match the compact
            # layout (leading pad columns multiply flat by 1 and add 0)
            start = k_pad - len(cols)
            col_idx[i, start:] = cols
            cards_a[i, start:] = cards
            offsets[i] = off
            spec_w[i] = 1.0
            off += sizes[i]

        # TPU scatter serializes (~17 ns/element measured); route small-
        # table batches through the one-hot MXU contraction there.  CPU
        # (the test lane) keeps the scatter — one-hot materialization is
        # slower than host scatter.
        use_matmul = (
            jax.default_backend() != "cpu" and m <= self._MATMUL_MAX_TABLE
        )
        n_chunk = 0
        if use_matmul:
            # chunk size: keep the (s, C, m) one-hot tile <= 2^24 elems.
            # When even a 128-row chunk would blow that bound (s_pad*m >
            # 2^17), bound MEMORY not just the chunk: split the spec batch
            # (halving s_pad) rather than flooring n_chunk — the old
            # max(128, ...) floor let the tile exceed 2^24 by up to 16x
            # (~4 GB peak near the table-size cap) and risked device OOM.
            n_chunk = min(4096, (1 << 24) // max(s_pad * m, 1))
            if n_chunk < 128:
                if s_real > 1:
                    half = max(1, s_real // 2)
                    return self.multi_counts_padded(
                        specs[:half], weights=weights
                    ) + self.multi_counts_padded(specs[half:], weights=weights)
                # single oversized spec: the scatter kernel's working set
                # is O(total), not O(s*chunk*m) — use it instead
                use_matmul = False

        self.n_dispatches += 1
        if use_matmul:
            tables = np.asarray(
                _padded_counts_matmul_kernel(
                    self.codes,
                    w,
                    jnp.asarray(col_idx),
                    jnp.asarray(cards_a),
                    jnp.asarray(spec_w, dtype=config.DTYPE),
                    m,
                    int(n_chunk),
                )
            )
            return [
                tables[i, :size].reshape(cards_l[i][0], -1)
                for i, size in enumerate(sizes)
            ]

        combined = np.asarray(
            _padded_counts_kernel(
                self.codes,
                w,
                jnp.asarray(col_idx),
                jnp.asarray(cards_a),
                jnp.asarray(offsets),
                jnp.asarray(spec_w, dtype=config.DTYPE),
                total,
            )
        )
        out = []
        for i, size in enumerate(sizes):
            o = int(offsets[i])
            out.append(combined[o : o + size].reshape(cards_l[i][0], -1))
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

    def estimate(self):
        """Abstract hook; concrete subclasses (MirrorDescentEstimator)
        override (reference ``estimators/base.py:426-427``)."""
        pass

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
