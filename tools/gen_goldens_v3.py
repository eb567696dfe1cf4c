"""Generate tests/reference_goldens_v3.json by RUNNING the reference pgmpy:
constraint-based structure discovery (PC skeletons + separating sets) and
model-fit metrics (correlation_score, fisher_c, implied_cis) on the shared
deterministic frames.

Run with:  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_v3.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from _golden_data import standalone_sample  # noqa: E402

from pgmpy.utils import get_example_model  # noqa: E402
from pgmpy.estimators import PC  # noqa: E402
from pgmpy.estimators.CITests import chi_square  # noqa: E402
from pgmpy.metrics import correlation_score, fisher_c, implied_cis  # noqa: E402

NETWORKS = ["asia", "cancer", "survey", "sachs"]
N_ROWS = 4000


def main():
    out = {}
    for name in NETWORKS:
        model = get_example_model(name)
        df = standalone_sample(model, N_ROWS, seed=2026)

        skel, sepsets = PC(df).build_skeleton(
            ci_test="chi_square", significance_level=0.01
        )
        entry = {
            "n_rows": N_ROWS,
            "data_seed": 2026,
            "pc_skeleton": sorted(
                sorted([str(u), str(v)]) for u, v in skel.edges()
            ),
            "pc_sepsets": [
                {"pair": sorted([str(u), str(v)]),
                 "sep": sorted(str(s) for s in sep)}
                for (u, v), sep in sepsets.items()
            ],
            "correlation_score": float(
                correlation_score(model, df, test="chi_square",
                                  significance_level=0.05)
            ),
            "fisher_c": float(
                fisher_c(model, df, ci_test=chi_square, show_progress=False)
            ),
        }
        cis = implied_cis(model, df, ci_test=chi_square, show_progress=False)
        entry["implied_cis"] = [
            {"u": str(r["u"]), "v": str(r["v"]),
             "cond": sorted(str(c) for c in r["cond_vars"]),
             "p": float(r["p-value"])}
            for _, r in cis.iterrows()
        ]
        out[name] = entry
        print(name, "done", flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "reference_goldens_v3.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)


if __name__ == "__main__":
    main()
