"""Generate tests/reference_goldens_extras.json by RUNNING the reference
pgmpy: Bayesian-prior parameter estimation, virtual-evidence queries,
interventional (do) queries, and DBN forward/backward inference.

Run with:  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_extras.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from _golden_data import standalone_sample  # noqa: E402

from pgmpy.utils import get_example_model  # noqa: E402
from pgmpy.estimators import BayesianEstimator  # noqa: E402
from pgmpy.factors.discrete import TabularCPD  # noqa: E402
from pgmpy.inference import CausalInference, DBNInference, VariableElimination  # noqa: E402
from pgmpy.models import DynamicBayesianNetwork  # noqa: E402


def main():
    out = {}

    # --- Bayesian estimation with BDeu / K2 priors -------------------- #
    be_out = {}
    for name in ("cancer", "survey"):
        model = get_example_model(name)
        df = standalone_sample(model, 2000, seed=11)
        be = BayesianEstimator(model, df)
        per_node = {}
        for node in sorted(model.nodes(), key=str):
            bdeu = be.estimate_cpd(node, prior_type="BDeu", equivalent_sample_size=10)
            k2 = be.estimate_cpd(node, prior_type="K2")
            per_node[str(node)] = {
                "evidence": [str(v) for v in bdeu.variables[1:]],
                "bdeu": np.asarray(bdeu.get_values(), dtype=np.float64).ravel().tolist(),
                "k2": np.asarray(k2.get_values(), dtype=np.float64).ravel().tolist(),
            }
        be_out[name] = {"n_rows": 2000, "data_seed": 11, "cpds": per_node}
    out["bayesian_estimator"] = be_out

    # --- virtual evidence --------------------------------------------- #
    model = get_example_model("cancer")
    ve = VariableElimination(model)
    smoker_states = model.get_cpds("Smoker").state_names["Smoker"]
    virt = TabularCPD("Smoker", 2, [[0.7], [0.3]],
                      state_names={"Smoker": smoker_states})
    q = ve.query(["Cancer"], virtual_evidence=[virt], show_progress=False)
    q2 = ve.query(["Dyspnoea"], evidence={"Xray": "positive"},
                  virtual_evidence=[virt], show_progress=False)
    out["virtual_evidence"] = {
        "network": "cancer",
        "virtual": {"variable": "Smoker", "values": [0.7, 0.3],
                    "states": [str(s) for s in smoker_states]},
        "cases": [
            {"variable": "Cancer", "evidence": {},
             "states": [str(s) for s in q.state_names["Cancer"]],
             "values": np.asarray(q.values, dtype=np.float64).tolist()},
            {"variable": "Dyspnoea", "evidence": {"Xray": "positive"},
             "states": [str(s) for s in q2.state_names["Dyspnoea"]],
             "values": np.asarray(q2.values, dtype=np.float64).tolist()},
        ],
    }

    # --- interventional queries ---------------------------------------- #
    do_out = []
    for name, target, do, evidence in [
        ("cancer", "Dyspnoea", {"Cancer": "True"}, {}),
        ("cancer", "Xray", {"Smoker": "True"}, {}),
        ("survey", "T", {"E": "high"}, {}),
        ("survey", "T", {"E": "high"}, {"A": "adult"}),
    ]:
        model = get_example_model(name)
        ci = CausalInference(model)
        q = ci.query([target], do=do, evidence=evidence or None,
                     show_progress=False)
        do_out.append({
            "network": name, "variable": target, "do": do,
            "evidence": evidence,
            "states": [str(s) for s in q.state_names[target]],
            "values": np.asarray(q.values, dtype=np.float64).tolist(),
        })
    out["do_queries"] = do_out

    # --- DBN forward/backward inference -------------------------------- #
    dbn = DynamicBayesianNetwork()
    dbn.add_edges_from([(("Z", 0), ("X", 0)), (("Z", 0), ("Z", 1))])
    dbn.add_cpds(
        TabularCPD(("Z", 0), 2, [[0.7], [0.3]]),
        TabularCPD(("X", 0), 2, [[0.9, 0.2], [0.1, 0.8]],
                   evidence=[("Z", 0)], evidence_card=[2]),
        TabularCPD(("Z", 1), 2, [[0.8, 0.3], [0.2, 0.7]],
                   evidence=[("Z", 0)], evidence_card=[2]),
    )
    dbn.initialize_initial_state()
    inf = DBNInference(dbn)
    fwd = inf.forward_inference(
        [("Z", 2)], evidence={("X", 0): 0, ("X", 1): 1, ("X", 2): 0}
    )
    bwd = inf.backward_inference([("Z", 0)], evidence={("X", 0): 0, ("X", 1): 1})
    out["dbn"] = {
        "forward_z2": np.asarray(fwd[("Z", 2)].values, dtype=np.float64).tolist(),
        "backward_z0": np.asarray(bwd[("Z", 0)].values, dtype=np.float64).tolist(),
    }

    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "reference_goldens_extras.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)


if __name__ == "__main__":
    main()
