"""Library-agnostic deterministic data generation for differential goldens.

Used both by ``tools/gen_goldens_v2.py`` (running the REFERENCE pgmpy to
produce golden outputs) and by ``tests/test_reference_goldens_v2.py``
(running pgmpy_tpu against them).  Sampling is plain numpy inverse-CDF
ancestral sampling driven only by the model's public CPD surface, with a
fixed lexicographic-topological node order — so both libraries, loading
the same BIF file, see the IDENTICAL DataFrame.
"""

import numpy as np
import pandas as pd


def lex_topological_order(nodes, edges):
    """Deterministic topological order: lexicographic Kahn's algorithm."""
    nodes = sorted(nodes, key=str)
    parents = {n: set() for n in nodes}
    children = {n: set() for n in nodes}
    for u, v in edges:
        parents[v].add(u)
        children[u].add(v)
    order = []
    ready = sorted([n for n in nodes if not parents[n]], key=str)
    while ready:
        n = ready.pop(0)
        order.append(n)
        for c in sorted(children[n], key=str):
            parents[c].discard(n)
            if not parents[c]:
                ready.append(c)
        ready.sort(key=str)
    return order


def standalone_sample(model, n_rows, seed):
    """Sample ``n_rows`` ancestrally with a numpy Philox stream.

    ``model`` only needs nodes()/edges()/get_cpds(node) with the shared
    CPD surface (variables, get_values(), state_names) — satisfied by both
    pgmpy and pgmpy_tpu models.
    """
    rng = np.random.default_rng(seed)
    order = lex_topological_order(list(model.nodes()), list(model.edges()))
    columns = {}
    codes = {}
    for node in order:
        cpd = model.get_cpds(node)
        values = np.asarray(cpd.get_values(), dtype=np.float64)
        evidence = list(cpd.variables[1:])
        ev_cards = [len(cpd.state_names[e]) for e in evidence]
        # column index: LAST evidence cycles fastest (shared convention)
        col = np.zeros(n_rows, dtype=np.int64)
        for e, card in zip(evidence, ev_cards):
            col = col * card + codes[e]
        probs = values[:, col].T  # (n_rows, card)
        cdf = np.cumsum(probs, axis=1)
        u = rng.random(n_rows)
        draw = (u[:, None] >= cdf).sum(axis=1)
        draw = np.minimum(draw, values.shape[0] - 1)
        codes[node] = draw
        states = [str(s) for s in cpd.state_names[node]]
        # categorical dtype with the FULL state list: keeps unobserved
        # states in view and matches what simulate() returns in both
        # libraries (plain object columns break the reference's dtype
        # inference when a column is single-valued)
        columns[node] = pd.Categorical.from_codes(draw, categories=states)
    return pd.DataFrame(columns, columns=sorted(columns, key=str))


def standalone_gaussian_frame(n_rows, seed):
    """Deterministic all-continuous frame from a fixed 6-variable linear
    SEM (A->B, A->C, B->D, C->D, D->E, B->F, E->F).  Shared between the
    reference-golden generator and pgmpy_tpu tests."""
    rng = np.random.default_rng(seed)
    eps = rng.normal(size=(n_rows, 6))
    A = eps[:, 0]
    B = 0.7 * A + 0.8 * eps[:, 1]
    C = -0.5 * A + eps[:, 2]
    D = 0.6 * B + 0.4 * C + 0.5 * eps[:, 3]
    E = 1.2 * D + eps[:, 4]
    F = 0.3 * B - 0.7 * E + 1.2 * eps[:, 5]
    return pd.DataFrame({"A": A, "B": B, "C": C, "D": D, "E": E, "F": F})


GAUSSIAN_FRAME_EDGES = [
    ("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E"),
    ("B", "F"), ("E", "F"),
]


def standalone_mixed_frame(n_rows, seed):
    """Deterministic mixed discrete/continuous frame.  Categorical columns
    use explicit pandas Categorical dtype (the reference's dtype inference
    rejects pandas-3 native string columns)."""
    rng = np.random.default_rng(seed)
    n = n_rows
    A = rng.normal(size=n)
    B = pd.Categorical(
        np.where(rng.random(n) < 1.0 / (1.0 + np.exp(-A)), "b1", "b0")
    )
    C = 0.5 * A + 1.0 * (np.asarray(B) == "b1") + 0.7 * rng.normal(size=n)
    d_noise = rng.normal(size=n)
    D = pd.Categorical(
        np.where(C + 0.5 * d_noise > 0.7, "d2",
                 np.where(C + 0.5 * d_noise > -0.3, "d1", "d0"))
    )
    E = rng.integers(0, 3, size=n)  # integer column => kind 'N'
    F = pd.Categorical(rng.choice(["f0", "f1"], size=n))
    return pd.DataFrame({"A": A, "B": B, "C": C, "D": D, "E": E, "F": F})


def em_init_values(spec, seed):
    """Deterministic EM initial CPDs: ``spec`` is a sorted list of
    ``(variable, card, [(parent, parent_card), ...])`` rows; returns
    {variable: 2-D normalized ndarray (card, prod(parent_cards))}.
    Both libraries wrap the same arrays in their own TabularCPD."""
    out = {}
    for i, (var, card, parents) in enumerate(spec):
        rng = np.random.default_rng(seed + 31 * i)
        n_cols = 1
        for _, pc in parents:
            n_cols *= pc
        vals = rng.random((card, n_cols)) + 0.1
        out[var] = vals / vals.sum(axis=0, keepdims=True)
    return out


def mplp_grid_spec(rows, cols, seed):
    """Deterministic binary grid Markov network: returns (nodes, edges,
    unary, pairwise) where unary[node] is a length-2 array and
    pairwise[edge] a (2, 2) array of factor values."""
    rng = np.random.default_rng(seed)
    nodes = [f"x{r}_{c}" for r in range(rows) for c in range(cols)]
    edges = []
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                edges.append((f"x{r}_{c}", f"x{r}_{c + 1}"))
            if r + 1 < rows:
                edges.append((f"x{r}_{c}", f"x{r + 1}_{c}"))
    unary = {n: np.exp(rng.normal(size=2)) for n in nodes}
    pairwise = {e: np.exp(rng.normal(size=(2, 2))) for e in edges}
    return nodes, edges, unary, pairwise


CAUSAL_GRAPH_SPECS = {
    # name: (edges, latents)
    "backdoor_chain": ([("Z", "X"), ("Z", "Y"), ("X", "Y")], []),
    "napkin": (
        [("W", "Z"), ("Z", "X"), ("X", "Y"), ("U1", "W"), ("U1", "X"),
         ("U2", "W"), ("U2", "Y")],
        ["U1", "U2"],
    ),
    "m_graph": (
        [("X", "Y"), ("U1", "X"), ("U1", "M"), ("U2", "M"), ("U2", "Y")],
        ["U1", "U2"],
    ),
    "iv_classic": (
        [("Z", "X"), ("X", "Y"), ("U", "X"), ("U", "Y")],
        ["U"],
    ),
    "frontdoor": ([("X", "M"), ("M", "Y"), ("U", "X"), ("U", "Y")], ["U"]),
    "multi_adjust": (
        [("A", "X"), ("B", "X"), ("A", "Y"), ("B", "Y"), ("X", "Y"),
         ("X", "C"), ("C", "Y")],
        [],
    ),
}


DBN_2TBN_EDGES = [
    (("A", 0), ("B", 0)),
    (("A", 0), ("C", 0)),
    (("B", 0), ("D", 0)),
    (("C", 0), ("D", 0)),
    (("A", 0), ("A", 1)),
    (("B", 0), ("B", 1)),
    (("C", 0), ("C", 1)),
    (("D", 0), ("D", 1)),
]


def standalone_dbn_frame(n_rows, n_slices, seed):
    """Deterministic wide DBN training frame: columns (var, t) for
    t in 0..n_slices-1, binary integer data with temporal correlation."""
    rng = np.random.default_rng(seed)
    cols = {}
    prev = {}
    for t in range(n_slices):
        for var in ["A", "B", "C", "D"]:
            if t == 0:
                col = (rng.random(n_rows) < 0.5).astype(np.int64)
            else:
                flip = rng.random(n_rows) < 0.25
                col = np.where(flip, 1 - prev[var], prev[var])
            cols[(var, t)] = col
            prev[var] = col
    df = pd.DataFrame(cols)
    df.columns = pd.MultiIndex.from_tuples(df.columns)
    return df


INDEPENDENCE_GRAPHS = {
    "collider_chain": [("A", "B"), ("C", "B"), ("B", "D"), ("D", "E")],
    "diamond": [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")],
    "tree": [("R", "X"), ("R", "Y"), ("X", "U"), ("X", "V")],
}


# ---------------------------------------------------------------------------
# Deterministic linear predictor for pillai_trace differential goldens.
#
# The reference's pillai_trace hard-requires XGBoost (absent here), so exact
# prediction parity is impossible with its default regressor.  Instead both
# libraries are driven with the SAME deterministic least-squares predictor —
# the reference via a monkeypatched ``_get_predictions`` (in
# tools/gen_goldens_v6.py), ours via the public ``classifier_factory`` /
# ``regressor_factory`` hooks — which makes everything downstream
# (one-hot residual assembly, canonical correlations, the Muller-Peterson F
# approximation) differentially testable to float tolerance.
# ---------------------------------------------------------------------------


def _with_intercept(Z):
    Z = np.asarray(Z, dtype=np.float64)
    if Z.ndim == 1:
        Z = Z[:, None]
    return np.column_stack([np.ones(Z.shape[0]), Z])


def pillai_encode_Z(data, Z):
    """Replicates pgmpy_tpu's ``_feature_matrix`` encoding: categorical
    columns -> sorted-factorize integer codes, numeric columns -> float64."""
    cols = []
    for z in Z:
        col = data[z]
        if isinstance(col.dtype, pd.CategoricalDtype) or not pd.api.types.is_numeric_dtype(col):
            codes, _ = pd.factorize(col, sort=True)
            cols.append(codes.astype(np.float64))
        else:
            cols.append(col.to_numpy(dtype=np.float64))
    if not cols:
        return np.zeros((data.shape[0], 0))
    return np.column_stack(cols)


def linear_lstsq_predict(Zmat_with_intercept, y):
    beta, _, _, _ = np.linalg.lstsq(Zmat_with_intercept, np.asarray(y, dtype=np.float64), rcond=None)
    return Zmat_with_intercept @ beta


class LinearPillaiRegressor:
    """sklearn-like deterministic linear regressor (intercept + lstsq)."""

    def fit(self, Z, y):
        self.beta, _, _, _ = np.linalg.lstsq(
            _with_intercept(Z), np.asarray(y, dtype=np.float64), rcond=None
        )
        return self

    def predict(self, Z):
        return _with_intercept(Z) @ self.beta


class LinearPillaiClassifier:
    """sklearn-like deterministic linear-probability classifier: lstsq of
    the one-hot target on [1, Z]; predict_proba columns are code order."""

    def fit(self, Z, codes):
        codes = np.asarray(codes)
        k = int(codes.max()) + 1
        onehot = np.eye(k)[codes]
        self.beta, _, _, _ = np.linalg.lstsq(_with_intercept(Z), onehot, rcond=None)
        return self

    def predict_proba(self, Z):
        return _with_intercept(Z) @ self.beta


PILLAI_CASES = [
    ("A", "C", ["B"]),
    ("B", "D", ["A", "C"]),
    ("A", "B", []),
    ("B", "D", []),
    ("C", "D", ["A", "B", "E", "F"]),
    ("B", "F", ["C", "E"]),
    ("D", "A", ["B"]),
    ("D", "F", ["A", "B", "C"]),
]

EDGE_STRENGTH_DAG = [
    ("A", "B"),
    ("A", "C"),
    ("B", "C"),
    ("C", "D"),
    ("B", "D"),
    ("E", "D"),
    ("C", "F"),
]


def standalone_sample_jpd(jpd, n, seed):
    """Deterministic rows from a joint distribution table (shared by the
    v7 golden generator and tests): inverse-CDF over the raveled joint."""
    rng = np.random.default_rng(seed)
    flat = np.asarray(jpd.values, dtype=np.float64).ravel()
    idx = rng.choice(flat.size, size=n, p=flat / flat.sum())
    codes = np.stack(np.unravel_index(idx, jpd.cardinality), axis=1)
    return pd.DataFrame(codes, columns=list(jpd.variables))
