"""Measure reference pgmpy-CPU baselines for the learning/sampling lane.

VERDICT r4 #2: the structure/learning secondaries in bench.py had no
vs_baseline anchors.  This script times the reference on the EXACT data
bench.py uses (2000-row ALARM simulate seed=3, via pgmpy_tpu's sampler)
plus a 100k-row MLE config, and prints one JSON object to record in
BASELINE.md.

Run in two phases (separate interpreters: phase gen needs pgmpy_tpu,
phase ref needs the reference on PYTHONPATH):

  python tools/measure_ref_learning.py gen
  PYTHONPATH=/root/repo/tools/refshims:/root/reference \
      python tools/measure_ref_learning.py ref

Phase `gen` writes /tmp/ref_baseline_data/{alarm2000,alarm100k}.csv and
alarm_edges.json; phase `ref` times the reference estimators median-of-3
on a quiet machine.

Reference GibbsSampling is NOT timed: its kernel construction enumerates
the joint state space of all other variables
(``/root/reference/pgmpy/sampling/Sampling.py:448-477`` — itertools.product
over 36 ALARM variables ~= 10^17 states), i.e. infeasible by construction;
BASELINE.md records it as such.
"""

import json
import os
import sys
import time

OUT_DIR = "/tmp/ref_baseline_data"


def phase_gen():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pgmpy_tpu.utils.utils import get_example_model

    os.makedirs(OUT_DIR, exist_ok=True)
    alarm = get_example_model("alarm")
    df = alarm.simulate(n_samples=2000, seed=3, show_progress=False)
    df.to_csv(f"{OUT_DIR}/alarm2000.csv", index=False)
    big = alarm.simulate(n_samples=100_000, seed=5, show_progress=False)
    big.to_csv(f"{OUT_DIR}/alarm100k.csv", index=False)
    with open(f"{OUT_DIR}/alarm_edges.json", "w") as f:
        json.dump(list(alarm.edges()), f)
    print("wrote", OUT_DIR)


def median_time(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def phase_ref():
    import pandas as pd

    import pgmpy

    print("reference pgmpy", pgmpy.__version__, file=sys.stderr)
    from pgmpy.estimators import (
        PC,
        HillClimbSearch,
        MaximumLikelihoodEstimator,
        TreeSearch,
    )
    from pgmpy.models import DiscreteBayesianNetwork
    from pgmpy.sampling import BayesianModelSampling

    # modern pandas reads dtype=str as a StringDtype the reference's
    # preprocess_data doesn't recognize; categorical is its native lane
    df = pd.read_csv(f"{OUT_DIR}/alarm2000.csv", dtype=str).astype("category")
    big = pd.read_csv(f"{OUT_DIR}/alarm100k.csv", dtype=str).astype("category")
    edges = json.load(open(f"{OUT_DIR}/alarm_edges.json"))

    results = {}

    t, ts = median_time(
        lambda: PC(df).build_skeleton(
            ci_test="chi_square", max_cond_vars=2, show_progress=False
        )
    )
    results["alarm_pc_skeleton_s"] = {"median": round(t, 3), "all": [round(x, 3) for x in ts]}
    print("pc:", results["alarm_pc_skeleton_s"], file=sys.stderr)

    t, ts = median_time(
        lambda: HillClimbSearch(df).estimate(
            scoring_method="bic-d", show_progress=False
        )
    )
    results["alarm_hillclimb_s"] = {"median": round(t, 3), "all": [round(x, 3) for x in ts]}
    print("hillclimb:", results["alarm_hillclimb_s"], file=sys.stderr)

    t, ts = median_time(lambda: TreeSearch(df).estimate(show_progress=False))
    results["alarm_treesearch_s"] = {"median": round(t, 3), "all": [round(x, 3) for x in ts]}
    print("treesearch:", results["alarm_treesearch_s"], file=sys.stderr)

    def mle(data):
        model = DiscreteBayesianNetwork(edges)
        MaximumLikelihoodEstimator(model, data).get_parameters(n_jobs=1)

    t, ts = median_time(lambda: mle(df))
    results["alarm_mle_2000_s"] = {"median": round(t, 3), "all": [round(x, 3) for x in ts]}
    print("mle2000:", results["alarm_mle_2000_s"], file=sys.stderr)

    t, ts = median_time(lambda: mle(big))
    results["alarm_mle_100k_s"] = {"median": round(t, 3), "all": [round(x, 3) for x in ts]}
    print("mle100k:", results["alarm_mle_100k_s"], file=sys.stderr)

    # forward sampling baseline (single-threaded reference sampler)
    model = DiscreteBayesianNetwork(edges)
    fitted = MaximumLikelihoodEstimator(model, big).get_parameters(n_jobs=1)
    model.add_cpds(*fitted)
    sampler = BayesianModelSampling(model)
    t, ts = median_time(
        lambda: sampler.forward_sample(size=100_000, show_progress=False)
    )
    results["alarm_forward_100k_s"] = {"median": round(t, 3), "all": [round(x, 3) for x in ts]}
    results["alarm_forward_samples_per_s"] = int(100_000 / t)
    print("forward:", results["alarm_forward_100k_s"], file=sys.stderr)

    print(json.dumps(results))


def phase_predict():
    """Reference predict() baseline: per-unique-row VE via joblib
    (``DiscreteBayesianNetwork.py:731-911``) on the same 2000-row frame
    bench.py predicts (BP/HISTORY columns dropped)."""
    import pandas as pd

    from pgmpy.estimators import MaximumLikelihoodEstimator
    from pgmpy.models import DiscreteBayesianNetwork

    df = pd.read_csv(f"{OUT_DIR}/alarm2000.csv", dtype=str).astype("category")
    edges = json.load(open(f"{OUT_DIR}/alarm_edges.json"))
    model = DiscreteBayesianNetwork(edges)
    model.add_cpds(*MaximumLikelihoodEstimator(model, df).get_parameters(n_jobs=1))
    pred_df = df.drop(columns=["BP", "HISTORY"])
    t, ts = median_time(lambda: model.predict(pred_df, n_jobs=1), reps=3)
    out = {
        "alarm_predict_2000_s": {"median": round(t, 3),
                                 "all": [round(x, 3) for x in ts]},
        "alarm_predict_rows_per_s": int(len(pred_df) / t),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if sys.argv[1:] == ["gen"]:
        phase_gen()
    elif sys.argv[1:] == ["ref"]:
        phase_ref()
    elif sys.argv[1:] == ["predict"]:
        phase_predict()
    else:
        print(__doc__)
        sys.exit(2)
