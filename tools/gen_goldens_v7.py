"""Generate tests/reference_goldens_v7.json by RUNNING the reference pgmpy:
long-tail deterministic surfaces not covered by goldens v2-v6 —

- ``DiscreteBayesianNetwork.fit_update`` (dirichlet update from prior CPDs)
- ``JointProbabilityDistribution.minimal_imap`` / ``is_imap``
- ``DiscreteMarkovNetwork.triangulate`` (all six heuristics),
  ``to_junction_tree`` clique/sepset structure, ``get_partition_function``
  (+ ``FactorGraph.get_partition_function``)
- ``DAG.to_pdag`` CPDAG edges on zoo networks
- ``utils.discretize`` (rounding + quantile) and
  ``preprocess_data`` / ``get_dataset_type``
- ``prediction.NaiveAdjustmentRegressor`` fit/predict with the default
  linear estimator
- ``SEMGraph.to_lisrel`` / ``to_standard_lisrel`` matrix masks
- ``DynamicBayesianNetwork.get_constant_bn`` structure + CPD values

Run with:
  sh tools/make_refshims.sh
  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_v7.py
"""

import json
import os
import sys

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))

from _golden_data import (  # noqa: E402
    DBN_2TBN_EDGES,
    standalone_sample_jpd,
    mplp_grid_spec,
    standalone_dbn_frame,
    standalone_gaussian_frame,
    standalone_mixed_frame,
    standalone_sample,
)

from pgmpy.base import DAG  # noqa: E402
from pgmpy.factors.discrete import (  # noqa: E402
    DiscreteFactor,
    JointProbabilityDistribution,
)
from pgmpy.models import (  # noqa: E402
    DiscreteMarkovNetwork,
    DynamicBayesianNetwork,
    FactorGraph,
    SEMGraph,
)
from pgmpy.utils import discretize, get_example_model  # noqa: E402
from pgmpy.utils.utils import get_dataset_type  # noqa: E402


def cpds_dict(model):
    out = {}
    for cpd in model.get_cpds():
        out[str(cpd.variable)] = {
            "evidence": [str(v) for v in cpd.variables[1:]],
            "values": np.asarray(cpd.get_values(), dtype=np.float64).tolist(),
        }
    return out


def gen_fit_update():
    model = get_example_model("asia")
    df = standalone_sample(model, 1500, seed=31)
    model.fit_update(df, n_prev_samples=1000)
    print("fit_update done")
    return {"n_rows": 1500, "seed": 31, "n_prev_samples": 1000,
            "cpds": cpds_dict(model)}


def gen_jpd():
    # deterministic 3-variable joint: normalized arange-based table
    vals = np.arange(1.0, 13.0)
    vals = vals / vals.sum()
    jpd = JointProbabilityDistribution(["A", "B", "C"], [2, 3, 2], vals)
    imap_edges = {}
    for order in (["A", "B", "C"], ["C", "B", "A"], ["B", "A", "C"]):
        dag = jpd.minimal_imap(order=order)
        imap_edges["".join(order)] = sorted(
            [str(u), str(v)] for u, v in dag.edges()
        )
    # uniform joint (the reference docstring case) and a joint with C
    # independent of (A, B) — both exercise the subset-certification quirk
    uni = JointProbabilityDistribution(["A", "B", "C"], [2, 3, 2], np.ones(12) / 12)
    imap_edges["uniform_ABC"] = sorted(
        [str(u), str(v)] for u, v in uni.minimal_imap(order=["A", "B", "C"]).edges()
    )
    ab = np.array([[0.30, 0.10, 0.05], [0.05, 0.15, 0.35]])  # dependent A,B
    c = np.array([0.4, 0.6])
    part = JointProbabilityDistribution(
        ["A", "B", "C"], [2, 3, 2], np.einsum("ab,c->abc", ab, c).ravel()
    )
    imap_edges["partial_ABC"] = sorted(
        [str(u), str(v)] for u, v in part.minimal_imap(order=["A", "B", "C"]).edges()
    )
    # is_imap against a fully-connected BN (always an I-map) fitted by MLE
    from pgmpy.models import DiscreteBayesianNetwork

    bn = DiscreteBayesianNetwork([("A", "B"), ("A", "C"), ("B", "C")])
    df = standalone_sample_jpd(jpd, 4000, seed=5)
    bn.fit(df)
    print("jpd imaps done")
    return {
        "values": vals.tolist(),
        "minimal_imap_edges": imap_edges,
        "is_imap_full_bn": bool(jpd.is_imap(bn)),
    }


def build_grid_mn(cls=DiscreteMarkovNetwork, factor_cls=DiscreteFactor):
    nodes, edges, unary, pairwise = mplp_grid_spec(3, 3, seed=17)
    mn = cls()
    mn.add_nodes_from(nodes)
    mn.add_edges_from(edges)
    factors = [
        factor_cls([n], [2], unary[n]) for n in nodes
    ] + [
        factor_cls(list(e), [2, 2], pairwise[e].ravel()) for e in edges
    ]
    mn.add_factors(*factors)
    return mn


def gen_markov_network():
    """The reference's triangulation tie-breaking is hash-order dependent
    (its clique sets differ across PYTHONHASHSEED), so record only the
    triangulation-invariant quantities."""
    out = {"partition_function": float(build_grid_mn().get_partition_function())}

    fg = FactorGraph()
    nodes, edges, unary, pairwise = mplp_grid_spec(2, 3, seed=23)
    fg.add_nodes_from(nodes)
    factors = [DiscreteFactor(list(e), [2, 2], pairwise[e].ravel()) for e in edges]
    fg.add_factors(*factors)
    fg.add_edges_from(
        [(v, f) for f in factors for v in f.scope()]
    )
    out["fg_partition_function"] = float(fg.get_partition_function())
    print("markov-network structure done")
    return out


def gen_to_pdag():
    out = {}
    for name in ["asia", "survey", "sachs"]:
        dag = DAG(get_example_model(name).edges())
        pdag = dag.to_pdag()
        directed, undirected = [], []
        seen = set()
        for u, v in pdag.edges():
            if (v, u) in pdag.edges():
                if (v, u) not in seen:
                    undirected.append(sorted([str(u), str(v)]))
                    seen.add((u, v))
            else:
                directed.append([str(u), str(v)])
        out[name] = {
            "directed": sorted(directed),
            "undirected": sorted(undirected),
        }
    print("to_pdag done")
    return out


def gen_discretize():
    gdf = standalone_gaussian_frame(200, seed=41)
    out = {"n_rows": 200, "seed": 41}
    card = {c: 4 for c in gdf.columns}
    for method in ["rounding", "quantile"]:
        disc = discretize(gdf, cardinality=card, method=method)
        out[method] = {
            c: [str(x) for x in disc[c].tolist()] for c in disc.columns
        }
    mdf = standalone_mixed_frame(50, seed=42)
    out["dataset_type"] = {
        c: str(t) for c, t in get_dataset_type(mdf).items()
    } if isinstance(get_dataset_type(mdf), dict) else str(get_dataset_type(mdf))
    print("discretize done")
    return out


def gen_naive_adjustment():
    from pgmpy.prediction import NaiveAdjustmentRegressor

    gdf = standalone_gaussian_frame(400, seed=43)
    # features are role-driven: [exposure] + adjustment + pretreatment
    dag = DAG(
        [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E"),
         ("B", "F"), ("E", "F")],
        roles={
            "exposure": "B",
            "outcome": "D",
            "adjustment": ["A", "C"],
            "pretreatment": ["F"],
        },
    )
    reg = NaiveAdjustmentRegressor(causal_graph=dag)
    X = gdf.drop(columns=["D"])
    y = gdf["D"]
    reg.fit(X, y)
    preds = reg.predict(X.iloc[:20])
    print("naive adjustment done")
    return {
        "n_rows": 400,
        "seed": 43,
        "predictions_first20": np.asarray(preds, dtype=np.float64).tolist(),
        "score": float(reg.score(X, y)),
    }


STD_LISREL_SHAPES = {
    # matrix -> (row section, col section) of the var_names dict
    "B": ("eta", "eta"),
    "gamma": ("eta", "xi"),
    "wedge_y": ("y", "eta"),
    "wedge_x": ("x", "xi"),
    "phi": ("xi", "xi"),
    "psi": ("eta", "eta"),
    "theta_e": ("y", "y"),
    "theta_del": ("x", "x"),
}


def keyed_matrix(M, rows, cols):
    """Order-independent {row|col: value} dict (NaN -> None)."""
    M = np.asarray(M, dtype=np.float64)
    out = {}
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            v = M[i, j]
            out[f"{r}|{c}"] = None if np.isnan(v) else float(v)
    return out


SEM_DEMO = dict(
    ebunch=[
        ("xi1", "x1", 0.4),
        ("xi1", "x2", 0.5),
        ("xi1", "eta1", 0.3),
        ("eta1", "y1", 0.8),
        ("eta1", "y2", 0.9),
    ],
    latents=["xi1", "eta1"],
    err_corr=[("y1", "y2")],
)


def gen_sem_lisrel():
    """The reference's eta ordering is hash-dependent (set iteration), so
    record order-independent edge-level facts instead of raw matrices."""
    graph = SEMGraph(**SEM_DEMO)
    alg = graph.to_lisrel()
    eta = [str(x) for x in alg.eta]
    B = np.asarray(alg.B, dtype=np.float64)  # row=child, col=parent (mask)
    Bf = np.asarray(alg.B_fixed_mask, dtype=np.float64)
    zeta = np.asarray(alg.zeta, dtype=np.float64)
    out = {
        "observed": sorted(str(v) for v in alg.y),
        "b_edges": sorted(
            [eta[j], eta[i]] for i, j in zip(*np.nonzero(B))
        ),
        "b_fixed": sorted(
            [eta[j], eta[i], float(Bf[i, j])] for i, j in zip(*np.nonzero(Bf))
        ),
        "zeta_offdiag": sorted(
            sorted([eta[i], eta[j]])
            for i, j in zip(*np.nonzero(zeta))
            if i < j
        ),
        "zeta_diag": sorted(eta[i] for i in np.nonzero(np.diag(zeta))[0]),
    }
    var_names, masks, fixed = graph.to_standard_lisrel()
    out["std_var_names"] = {k: sorted(map(str, v)) for k, v in var_names.items()}
    out["std_masks"] = {}
    out["std_fixed"] = {}
    for mat, (rs, cs) in STD_LISREL_SHAPES.items():
        rows = [str(v) for v in var_names[rs]]
        cols = [str(v) for v in var_names[cs]]
        out["std_masks"][mat] = keyed_matrix(masks[mat], rows, cols)
        out["std_fixed"][mat] = keyed_matrix(fixed[mat], rows, cols)
    print("sem lisrel done")
    return out


def gen_dbn_constant_bn():
    dbn = DynamicBayesianNetwork(DBN_2TBN_EDGES)
    df = standalone_dbn_frame(1200, n_slices=3, seed=44)
    dbn.fit(df)
    out = {}
    for t in (0, 1):
        cbn = dbn.get_constant_bn(t_slice=t)
        out[f"t{t}"] = {
            "nodes": sorted(map(str, cbn.nodes())),
            "edges": sorted([str(u), str(v)] for u, v in cbn.edges()),
            "cpds": cpds_dict(cbn),
        }
    print("dbn constant bn done")
    return out


def main():
    goldens = {
        "fit_update": gen_fit_update(),
        "jpd": gen_jpd(),
        "markov_network": gen_markov_network(),
        "to_pdag": gen_to_pdag(),
        "discretize": gen_discretize(),
        "naive_adjustment": gen_naive_adjustment(),
        "sem_lisrel": gen_sem_lisrel(),
        "dbn_constant_bn": gen_dbn_constant_bn(),
    }
    out = os.path.join(HERE, "..", "tests", "reference_goldens_v7.json")
    with open(out, "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
