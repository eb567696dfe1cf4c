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
