"""Generate tests/reference_goldens_v2.json by RUNNING the reference pgmpy
(via the /tmp/refshims stubs) on deterministic shared data.

Run with:  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_v2.py

Covers surfaces beyond the v1 VE posteriors: MLE CPDs, structure scores,
power-divergence CI tests, BP posteriors, MAP queries, and per-dataset
log-probability — everything keyed to the standalone sampler in
tests/_golden_data.py so pgmpy_tpu's test replays the identical frame.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from _golden_data import standalone_sample  # noqa: E402

from pgmpy.utils import get_example_model  # noqa: E402
from pgmpy.estimators import AIC, BDeu, BIC, K2, MaximumLikelihoodEstimator  # noqa: E402
from pgmpy.estimators.CITests import chi_square, g_sq  # noqa: E402
from pgmpy.inference import BeliefPropagation, VariableElimination  # noqa: E402
from pgmpy.metrics import BayesianModelProbability  # noqa: E402

NETWORKS = ["asia", "cancer", "survey", "sachs"]
N_ROWS = 4000


def main():
    rng = np.random.default_rng(7)
    out = {}
    for name in NETWORKS:
        model = get_example_model(name)
        df = standalone_sample(model, N_ROWS, seed=2026)
        nodes = sorted(model.nodes(), key=str)

        entry = {"n_rows": N_ROWS, "data_seed": 2026, "data_checksum": [
            int(x) for x in np.asarray(
                [hash(tuple(df[c].astype(str))) % (2**31) for c in df.columns]
            )
        ]}

        # MLE CPDs
        mle = MaximumLikelihoodEstimator(model, df)
        cpds = {}
        for node in nodes:
            cpd = mle.estimate_cpd(node)
            cpds[node] = {
                "evidence": [str(v) for v in cpd.variables[1:]],
                "values": np.asarray(cpd.get_values(), dtype=np.float64)
                .ravel()
                .tolist(),
            }
        entry["mle"] = cpds

        # structure scores of the TRUE structure on the sampled data
        entry["scores"] = {
            "k2": float(K2(df).score(model)),
            "bdeu": float(BDeu(df, equivalent_sample_size=5).score(model)),
            "bic": float(BIC(df).score(model)),
            "aic": float(AIC(df).score(model)),
        }

        # CI tests on random triples
        ci = []
        for _ in range(6):
            x, y = rng.choice(nodes, size=2, replace=False)
            others = [n for n in nodes if n not in (x, y)]
            z = list(rng.choice(others, size=min(2, len(others)), replace=False))
            chi, p, dof = chi_square(x, y, z, df, boolean=False)
            g, gp, gdof = g_sq(x, y, z, df, boolean=False)
            ci.append({"x": str(x), "y": str(y), "z": [str(v) for v in z],
                       "chi": float(chi), "p": float(p), "dof": int(dof),
                       "g": float(g), "g_p": float(gp)})
        entry["ci_tests"] = ci

        # posteriors + VE map_query on random signatures; reference BP
        # where its junction-tree construction works (it raises 'No sepset
        # found' on e.g. asia), reference VE otherwise — exact methods, so
        # the golden is the same either way
        ve = VariableElimination(model)
        try:
            bp = BeliefPropagation(model)
        except ValueError:
            bp = ve
        queries = []
        for _ in range(4):
            q = str(rng.choice(nodes))
            ev_pool = [n for n in nodes if n != q]
            ev_vars = list(rng.choice(ev_pool, size=min(2, len(ev_pool)), replace=False))
            evidence = {}
            for v in ev_vars:
                states = model.get_cpds(v).state_names[v]
                evidence[str(v)] = str(states[int(rng.integers(len(states)))])
            phi = bp.query([q], evidence=evidence, show_progress=False)
            m = ve.map_query([q], evidence=evidence, show_progress=False)
            queries.append({
                "variable": q,
                "evidence": evidence,
                "states": [str(s) for s in phi.state_names[q]],
                "values": np.asarray(phi.values, dtype=np.float64).tolist(),
                "map": str(m[q]),
            })
        entry["bp_queries"] = queries

        # dataset log-probability under the true model
        entry["logprob_sum"] = float(
            np.sum(BayesianModelProbability(model).score(df))
        )

        out[name] = entry
        print(name, "done", flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "reference_goldens_v2.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)


if __name__ == "__main__":
    main()
