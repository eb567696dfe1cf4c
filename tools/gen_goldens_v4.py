"""Generate tests/reference_goldens_v4.json by RUNNING the reference pgmpy:
score-based structure search (HillClimb/GES/TreeSearch/Mmhc/Exhaustive),
Gaussian + conditional-Gaussian scores, residual-based CI tests
(pearsonr/gcm), linear-Gaussian model fitting/prediction, EM with a fixed
deterministic init, Mplp MAP, and causal identification outputs —
everything on the shared deterministic frames from tests/_golden_data.py.

Run with:  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_v4.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from _golden_data import (  # noqa: E402
    CAUSAL_GRAPH_SPECS,
    GAUSSIAN_FRAME_EDGES,
    em_init_values,
    mplp_grid_spec,
    standalone_gaussian_frame,
    standalone_mixed_frame,
    standalone_sample,
)

from pgmpy.base import DAG  # noqa: E402
from pgmpy.estimators import (  # noqa: E402
    GES,
    AICCondGauss,
    AICGauss,
    BICCondGauss,
    BICGauss,
    ExhaustiveSearch,
    ExpectationMaximization,
    HillClimbSearch,
    LogLikelihoodCondGauss,
    LogLikelihoodGauss,
    MmhcEstimator,
    TreeSearch,
)
from pgmpy.estimators.CITests import gcm, pearsonr  # noqa: E402
from pgmpy.factors.discrete import DiscreteFactor, TabularCPD  # noqa: E402
from pgmpy.inference import CausalInference, Mplp  # noqa: E402
from pgmpy.models import (  # noqa: E402
    DiscreteBayesianNetwork,
    DiscreteMarkovNetwork,
    LinearGaussianBayesianNetwork,
)
from pgmpy.utils import get_example_model  # noqa: E402

N_ROWS = 2000


def dag_edges(g):
    return sorted([str(u), str(v)] for u, v in g.edges())


def gen_gauss():
    df = standalone_gaussian_frame(N_ROWS, seed=2027)
    cases = [
        ["D", ["B", "C"]],
        ["D", []],
        ["F", ["B", "E"]],
        ["F", ["A"]],
        ["E", ["D", "A", "B"]],
        ["A", ["F"]],
    ]
    scores = []
    for v, ps in cases:
        scores.append(
            {
                "variable": v,
                "parents": ps,
                "ll_g": float(LogLikelihoodGauss(df).local_score(v, ps)),
                "bic_g": float(BICGauss(df).local_score(v, ps)),
                "aic_g": float(AICGauss(df).local_score(v, ps)),
            }
        )

    hc = HillClimbSearch(df).estimate(scoring_method="bic-g", show_progress=False)

    ci_cases = [
        ["A", "B", []],
        ["A", "D", ["B", "C"]],
        ["B", "C", ["A"]],
        ["E", "F", ["D"]],
        ["A", "E", ["D"]],
    ]
    ci = []
    for x, y, z in ci_cases:
        pr = pearsonr(x, y, z, df, boolean=False)
        gc = gcm(x, y, z, df, boolean=False)
        ci.append(
            {
                "x": x,
                "y": y,
                "z": z,
                "pearsonr": [float(pr[0]), float(pr[1])],
                "gcm": [float(gc[0]), float(gc[1])],
            }
        )

    # linear-Gaussian model fit / joint Gaussian / prediction / loglik
    lgbn = LinearGaussianBayesianNetwork(GAUSSIAN_FRAME_EDGES)
    lgbn.fit(df)
    cpds = []
    for cpd in sorted(lgbn.get_cpds(), key=lambda c: str(c.variable)):
        cpds.append(
            {
                "variable": str(cpd.variable),
                "evidence": [str(e) for e in cpd.evidence],
                "beta": [float(b) for b in np.ravel(cpd.beta)],
                "std": float(np.ravel(cpd.std)[0]),
            }
        )
    mean, cov = lgbn.to_joint_gaussian()
    nodes = list(lgbn.nodes())
    loglik = float(lgbn.log_likelihood(df))

    pred_df = df.iloc[:5][["A", "B", "C"]].copy()
    pred_vars, pred_mu, pred_cov = lgbn.predict(pred_df)

    # ATE via the linear estimator path.  Queries are chosen so the
    # reference's answer is deterministic: its "smallest" tie-break is
    # frozenset-iteration-order (hash-randomized) and its "all" strategy
    # crashes when an edge has several adjustment sets, so the goldens
    # use (a) a pair whose per-edge smallest sets are unique and (b) an
    # explicit frozenset estimand.
    ci_model = CausalInference(lgbn)
    ate_a_c = float(
        ci_model.estimate_ate(
            "A", "C", data=df, estimand_strategy="smallest",
            estimator_type="linear",
        )
    )
    # the reference's explicit-frozenset estimand branch is broken (it
    # validates the double-wrapped set), so the Z != {} regression path is
    # goldened at the LinearEstimator level instead
    from pgmpy.inference.LinearModel import LinearEstimator

    ate_e_f = float(
        LinearEstimator(lgbn).fit(X="E", Y="F", Z=["D"], data=df)._get_ate()
    )

    return {
        "n_rows": N_ROWS,
        "seed": 2027,
        "scores": scores,
        "hillclimb_bicg_edges": dag_edges(hc),
        "ci_tests": ci,
        "lgbn_cpds": cpds,
        "joint_mean": {str(n): float(m) for n, m in zip(nodes, mean)},
        "joint_cov": {
            "nodes": [str(n) for n in nodes],
            "cov": np.asarray(cov, dtype=float).tolist(),
        },
        "log_likelihood": loglik,
        "predict": {
            "vars": [str(v) for v in pred_vars],
            "mu": np.asarray(pred_mu, dtype=float).tolist(),
            "cov": np.asarray(pred_cov, dtype=float).tolist(),
        },
        "ate_A_C": ate_a_c,
        "ate_E_F_given_D": ate_e_f,
    }


def gen_condgauss():
    df = standalone_mixed_frame(N_ROWS, seed=2028)
    cases = [
        ["C", ["A", "B"]],
        ["C", []],
        ["A", ["B", "D"]],
        ["B", ["A", "C"]],
        ["B", ["D"]],
        ["B", []],
        ["D", ["A", "B", "E"]],
        ["C", ["A", "B", "D", "E"]],
        ["B", ["E"]],
        ["F", ["C", "D"]],
    ]
    scores = []
    for v, ps in cases:
        scores.append(
            {
                "variable": v,
                "parents": ps,
                "ll_cg": float(LogLikelihoodCondGauss(df).local_score(v, ps)),
                "bic_cg": float(BICCondGauss(df).local_score(v, ps)),
                "aic_cg": float(AICCondGauss(df).local_score(v, ps)),
            }
        )
    hc = HillClimbSearch(df).estimate(scoring_method="bic-cg", show_progress=False)
    return {
        "n_rows": N_ROWS,
        "seed": 2028,
        "scores": scores,
        "hillclimb_biccg_edges": dag_edges(hc),
    }


def gen_discrete_search():
    out = {}
    for name in ["asia", "cancer", "survey"]:
        model = get_example_model(name)
        df = standalone_sample(model, N_ROWS, seed=2026)
        entry = {"n_rows": N_ROWS, "data_seed": 2026}

        hc_bic = HillClimbSearch(df).estimate(
            scoring_method="bic-d", show_progress=False
        )
        entry["hillclimb_bic_edges"] = dag_edges(hc_bic)
        hc_k2 = HillClimbSearch(df).estimate(
            scoring_method="k2", show_progress=False
        )
        entry["hillclimb_k2_edges"] = dag_edges(hc_k2)

        ges = GES(df).estimate(scoring_method="bic-d")
        entry["ges_edges"] = dag_edges(ges)

        root = sorted(df.columns, key=str)[0]
        ts = TreeSearch(df, root_node=root).estimate(
            estimator_type="chow-liu", show_progress=False
        )
        entry["chow_liu_root"] = str(root)
        entry["chow_liu_edges"] = dag_edges(ts)

        class_node = sorted(df.columns, key=str)[-1]
        tan = TreeSearch(df, root_node=root).estimate(
            estimator_type="tan", class_node=class_node, show_progress=False
        )
        entry["tan_root"] = str(root)
        entry["tan_class"] = str(class_node)
        entry["tan_edges"] = dag_edges(tan)

        if name in ("cancer", "survey"):
            mmhc = MmhcEstimator(df).estimate(significance_level=0.01)
            entry["mmhc_edges"] = dag_edges(mmhc)

        if name == "cancer":
            cols = sorted(df.columns, key=str)[:4]
            sub = df[cols]
            best = ExhaustiveSearch(sub, use_cache=False).estimate()
            entry["exhaustive_cols"] = [str(c) for c in cols]
            entry["exhaustive_edges"] = dag_edges(best)

        out[name] = entry
        print("discrete_search", name, "done", flush=True)
    return out


def gen_em():
    model = get_example_model("cancer")
    df_full = standalone_sample(model, 1500, seed=2029)
    latent = "Smoker"
    df = df_full.drop(columns=[latent])

    bn = DiscreteBayesianNetwork(list(model.edges()), latents={latent})
    spec = []
    for var in sorted(bn.nodes(), key=str):
        card = 2
        parents = sorted(bn.get_parents(var), key=str)
        spec.append((var, card, [(p, 2) for p in parents]))
    init_vals = em_init_values(spec, seed=77)
    init_cpds = {}
    for var, card, parents in spec:
        init_cpds[var] = TabularCPD(
            var,
            card,
            init_vals[var],
            evidence=[p for p, _ in parents] or None,
            evidence_card=[pc for _, pc in parents] or None,
            state_names={
                v: (
                    sorted(model.get_cpds(v).state_names[v], key=str)
                    if v != latent
                    else [0, 1]
                )
                for v in [var] + [p for p, _ in parents]
            },
        )
    em = ExpectationMaximization(bn, df)
    cpds = em.get_parameters(
        latent_card={latent: 2},
        max_iter=8,
        atol=1e-12,
        seed=0,
        init_cpds=init_cpds,
        show_progress=False,
    )
    out_cpds = []
    for cpd in sorted(cpds, key=lambda c: str(c.variable)):
        out_cpds.append(
            {
                "variable": str(cpd.variable),
                "evidence": [str(e) for e in cpd.variables[1:]],
                "state_names": {
                    str(v): [str(s) for s in cpd.state_names[v]]
                    for v in cpd.variables
                },
                "values_2d": np.asarray(cpd.get_values(), dtype=float).tolist(),
            }
        )
    return {
        "network": "cancer",
        "latent": latent,
        "n_rows": 1500,
        "data_seed": 2029,
        "init_seed": 77,
        "max_iter": 8,
        "cpds": out_cpds,
    }


def gen_mplp():
    nodes, edges, unary, pairwise = mplp_grid_spec(3, 3, seed=55)
    mn = DiscreteMarkovNetwork()
    mn.add_nodes_from(nodes)
    mn.add_edges_from(edges)
    factors = [
        DiscreteFactor([n], [2], unary[n]) for n in nodes
    ] + [
        DiscreteFactor(list(e), [2, 2], pairwise[e].ravel()) for e in edges
    ]
    mn.add_factors(*factors)
    mplp = Mplp(mn)
    assignment = mplp.map_query()
    gap = mplp.get_integrality_gap()
    return {
        "rows": 3,
        "cols": 3,
        "seed": 55,
        "assignment": {str(k): int(v) for k, v in assignment.items()},
        "integrality_gap": float(gap),
    }


def gen_causal_graphs():
    out = {}
    for name, (edges, latents) in CAUSAL_GRAPH_SPECS.items():
        model = DiscreteBayesianNetwork(edges, latents=set(latents))
        infer = CausalInference(model)
        entry = {}
        try:
            mas = infer.get_minimal_adjustment_set("X", "Y")
            entry["minimal_adjustment_set"] = (
                sorted(str(s) for s in mas) if mas is not None else None
            )
        except ValueError as err:
            entry["minimal_adjustment_set_error"] = str(err)
        try:
            entry["ivs"] = sorted(str(s) for s in infer.get_ivs("X", "Y"))
        except ValueError as err:
            entry["ivs_error"] = str(err)
        try:
            entry["conditional_ivs"] = sorted(
                [str(z), sorted(str(c) for c in cond)]
                for z, cond in infer.get_conditional_ivs("X", "Y")
            )
        except ValueError as err:
            entry["conditional_ivs_error"] = str(err)
        out[name] = entry
    return out


def main():
    out = {
        "gauss": gen_gauss(),
        "condgauss": gen_condgauss(),
        "discrete_search": gen_discrete_search(),
        "em": gen_em(),
        "mplp": gen_mplp(),
        "causal_graphs": gen_causal_graphs(),
    }
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "reference_goldens_v4.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)


if __name__ == "__main__":
    main()
