"""Generate tests/reference_goldens_v5.json by RUNNING the reference pgmpy:
model-fit metrics (log_likelihood_score, structure_score across scoring
methods, SHD), 2-TBN DBN parameter fitting, NoisyOR CPD construction, and
independence-set machinery (get_independencies, closure, entails) on the
shared deterministic inputs in tests/_golden_data.py.

Run with:  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_v5.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from _golden_data import (  # noqa: E402
    DBN_2TBN_EDGES,
    GAUSSIAN_FRAME_EDGES,
    INDEPENDENCE_GRAPHS,
    standalone_dbn_frame,
    standalone_gaussian_frame,
    standalone_sample,
)

from pgmpy.base import DAG  # noqa: E402
from pgmpy.factors.discrete import NoisyORCPD  # noqa: E402
from pgmpy.independencies import Independencies  # noqa: E402
from pgmpy.metrics import SHD, log_likelihood_score, structure_score  # noqa: E402
from pgmpy.models import (  # noqa: E402
    DynamicBayesianNetwork,
    LinearGaussianBayesianNetwork,
)
from pgmpy.utils import get_example_model  # noqa: E402

N_ROWS = 2000


def norm_assertions(independencies):
    """Canonical sorted triple list for an Independencies object."""
    out = []
    for a in independencies.get_assertions():
        out.append(
            [
                sorted(str(x) for x in a.event1),
                sorted(str(x) for x in a.event2),
                sorted(str(x) for x in a.event3),
            ]
        )
    return sorted(out)


def gen_metrics():
    out = {}
    for name in ["asia", "cancer"]:
        model = get_example_model(name)
        df = standalone_sample(model, N_ROWS, seed=2026)
        entry = {
            "n_rows": N_ROWS,
            "data_seed": 2026,
            "log_likelihood_score": float(log_likelihood_score(model, df)),
        }
        for method in ["k2", "bdeu", "bds", "bic-d", "aic-d"]:
            entry[f"structure_score_{method}"] = float(
                structure_score(model, df, scoring_method=method)
            )
        out[name] = entry

    gdf = standalone_gaussian_frame(N_ROWS, seed=2027)
    glgbn = LinearGaussianBayesianNetwork(GAUSSIAN_FRAME_EDGES)
    gentry = {}
    for method in ["ll-g", "bic-g", "aic-g"]:
        gentry[f"structure_score_{method}"] = float(
            structure_score(glgbn, gdf, scoring_method=method)
        )
    out["gaussian_frame"] = gentry

    # SHD over fixed graph pairs (pure graph metric)
    shd_cases = []
    pairs = [
        (INDEPENDENCE_GRAPHS["diamond"], INDEPENDENCE_GRAPHS["collider_chain"]),
        (INDEPENDENCE_GRAPHS["diamond"], [("A", "B"), ("C", "A"), ("B", "D"), ("C", "D")]),
        (INDEPENDENCE_GRAPHS["tree"], [("R", "X"), ("Y", "R"), ("X", "U"), ("X", "V")]),
    ]
    for true_edges, est_edges in pairs:
        nodes = sorted({n for e in true_edges + est_edges for n in e})
        t = DAG()
        t.add_nodes_from(nodes)
        t.add_edges_from(true_edges)
        e = DAG()
        e.add_nodes_from(nodes)
        e.add_edges_from(est_edges)
        shd_cases.append(
            {
                "true": sorted(map(list, true_edges)),
                "est": sorted(map(list, est_edges)),
                "shd": int(SHD(t, e)),
            }
        )
    out["shd"] = shd_cases
    return out


def gen_dbn_fit():
    df = standalone_dbn_frame(3000, 5, seed=2030)
    dbn = DynamicBayesianNetwork(DBN_2TBN_EDGES)
    dbn.fit(df)
    cpds = []
    for cpd in sorted(
        dbn.get_cpds(), key=lambda c: (str(c.variable[0]), c.variable[1])
    ):
        cpds.append(
            {
                "variable": [str(cpd.variable[0]), int(cpd.variable[1])],
                "evidence": [
                    [str(v[0]), int(v[1])] for v in cpd.variables[1:]
                ],
                "state_names": {
                    str(tuple(v)): [str(s) for s in cpd.state_names[v]]
                    for v in cpd.variables
                },
                "values_2d": np.asarray(cpd.get_values(), dtype=float).tolist(),
            }
        )
    return {"n_rows": 3000, "n_slices": 5, "seed": 2030, "cpds": cpds}


def gen_noisy_or():
    cases = []
    for variable, evidence, probs in [
        ("Y", ["X1", "X2"], [0.8, 0.6]),
        ("Y", ["A", "B", "C"], [0.9, 0.5, 0.3]),
        ("Z", ["P"], [0.7]),
    ]:
        cpd = NoisyORCPD(variable, probs, evidence=evidence)
        cases.append(
            {
                "variable": variable,
                "evidence": evidence,
                "prob_values": probs,
                "state_names": {
                    str(v): [str(s) for s in cpd.state_names[v]]
                    for v in cpd.variables
                },
                "values_2d": np.asarray(cpd.get_values(), dtype=float).tolist(),
            }
        )
    return cases


def gen_independencies():
    out = {}
    for name, edges in INDEPENDENCE_GRAPHS.items():
        dag = DAG(edges)
        out[name] = {
            "edges": sorted(map(list, edges)),
            "get_independencies": norm_assertions(dag.get_independencies()),
            "local_independencies": norm_assertions(
                dag.local_independencies(sorted(dag.nodes(), key=str))
            ),
        }
    ind = Independencies(["X", "Y", ["Z"]], ["X", "W"])
    closure = Independencies(["X", ["Y", "W"]]).closure()
    out["closure_example"] = norm_assertions(closure)
    out["entails"] = {
        "case1": bool(
            Independencies(["X", ["Y", "W"]]).entails(Independencies(["X", "Y"]))
        ),
        "case2": bool(
            Independencies(["X", "Y"]).entails(Independencies(["X", ["Y", "W"]]))
        ),
    }
    return out


def main():
    out = {
        "metrics": gen_metrics(),
        "dbn_fit": gen_dbn_fit(),
        "noisy_or": gen_noisy_or(),
        "independencies": gen_independencies(),
    }
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "reference_goldens_v5.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)


if __name__ == "__main__":
    main()
