"""Differential goldens v4: replay reference outputs for score-based
structure search, Gaussian/conditional-Gaussian scores, residual CI
tests, linear-Gaussian fitting/prediction, EM with a fixed init, Mplp
MAP, and causal identification.  Golden values were produced by RUNNING
the reference pgmpy (``tools/gen_goldens_v4.py``) on the shared
deterministic frames in ``tests/_golden_data.py``.
"""

import json
import os

import numpy as np
import pytest

from _golden_data import (
    CAUSAL_GRAPH_SPECS,
    GAUSSIAN_FRAME_EDGES,
    em_init_values,
    mplp_grid_spec,
    standalone_gaussian_frame,
    standalone_mixed_frame,
    standalone_sample,
)

from pgmpy_tpu.estimators import (
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
from pgmpy_tpu.estimators.citests import gcm, pearsonr
from pgmpy_tpu.factors import DiscreteFactor, TabularCPD
from pgmpy_tpu.inference import CausalInference, Mplp
from pgmpy_tpu.models import (
    DiscreteBayesianNetwork,
    DiscreteMarkovNetwork,
    LinearGaussianBayesianNetwork,
)
from pgmpy_tpu.utils import get_example_model

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "reference_goldens_v4.json"))
)


def dag_edges(g):
    return sorted([str(u), str(v)] for u, v in g.edges())


def assert_search_parity(dag, golden_edges, df, scorer_cls, **scorer_kw):
    """Tie-robust structure-search parity: the reference's HillClimb
    enumerates add-operations from a python SET (hash-randomized), so
    score-equivalent orientations flip between processes.  Assert the
    skeleton matches and that our result scores exactly as well as the
    reference's (under our scorer)."""
    from pgmpy_tpu.base import DAG

    skel = {frozenset((str(u), str(v))) for u, v in dag.edges()}
    gskel = {frozenset((u, v)) for u, v in golden_edges}
    assert skel == gskel, (sorted(map(sorted, skel)), sorted(map(sorted, gskel)))
    golden_dag = DAG()
    golden_dag.add_nodes_from(df.columns)
    golden_dag.add_edges_from([tuple(e) for e in golden_edges])
    ours_dag = DAG()
    ours_dag.add_nodes_from(df.columns)
    ours_dag.add_edges_from(dag.edges())
    scorer = scorer_cls(df, **scorer_kw)
    s_ours = sum(
        scorer.local_score(n, list(ours_dag.predecessors(n)))
        for n in ours_dag.nodes()
    )
    s_gold = sum(
        scorer.local_score(n, list(golden_dag.predecessors(n)))
        for n in golden_dag.nodes()
    )
    assert s_ours == pytest.approx(s_gold, rel=1e-9), (s_ours, s_gold)


@pytest.fixture(scope="module")
def gauss_df():
    return standalone_gaussian_frame(GOLDENS["gauss"]["n_rows"], seed=2027)


@pytest.fixture(scope="module")
def mixed_df():
    return standalone_mixed_frame(GOLDENS["condgauss"]["n_rows"], seed=2028)


class TestGaussianScores:
    def test_local_scores(self, gauss_df):
        for case in GOLDENS["gauss"]["scores"]:
            v, ps = case["variable"], case["parents"]
            assert LogLikelihoodGauss(gauss_df).local_score(v, ps) == pytest.approx(
                case["ll_g"], rel=1e-9
            )
            assert BICGauss(gauss_df).local_score(v, ps) == pytest.approx(
                case["bic_g"], rel=1e-9
            )
            assert AICGauss(gauss_df).local_score(v, ps) == pytest.approx(
                case["aic_g"], rel=1e-9
            )

    def test_hillclimb_bicg(self, gauss_df):
        dag = HillClimbSearch(gauss_df).estimate(
            scoring_method="bic-g", show_progress=False
        )
        assert_search_parity(
            dag, GOLDENS["gauss"]["hillclimb_bicg_edges"], gauss_df, BICGauss
        )

    def test_pearsonr_gcm(self, gauss_df):
        for case in GOLDENS["gauss"]["ci_tests"]:
            x, y, z = case["x"], case["y"], case["z"]
            pr = pearsonr(x, y, z, gauss_df, boolean=False)
            assert np.allclose(pr, case["pearsonr"], rtol=1e-8, atol=1e-12)
            gc = gcm(x, y, z, gauss_df, boolean=False)
            assert np.allclose(gc, case["gcm"], rtol=1e-8, atol=1e-12)


class TestCondGaussScores:
    def test_local_scores(self, mixed_df):
        for case in GOLDENS["condgauss"]["scores"]:
            v, ps = case["variable"], case["parents"]
            assert LogLikelihoodCondGauss(mixed_df).local_score(
                v, ps
            ) == pytest.approx(case["ll_cg"], rel=1e-9)
            assert BICCondGauss(mixed_df).local_score(v, ps) == pytest.approx(
                case["bic_cg"], rel=1e-9
            )
            assert AICCondGauss(mixed_df).local_score(v, ps) == pytest.approx(
                case["aic_cg"], rel=1e-9
            )

    def test_hillclimb_biccg(self, mixed_df):
        dag = HillClimbSearch(mixed_df).estimate(
            scoring_method="bic-cg", show_progress=False
        )
        assert_search_parity(
            dag,
            GOLDENS["condgauss"]["hillclimb_biccg_edges"],
            mixed_df,
            BICCondGauss,
        )


class TestLinearGaussianParity:
    @pytest.fixture(scope="class")
    def fitted(self, gauss_df):
        lgbn = LinearGaussianBayesianNetwork(GAUSSIAN_FRAME_EDGES)
        lgbn.fit(gauss_df)
        return lgbn

    def test_fit_cpds(self, fitted):
        by_var = {c["variable"]: c for c in GOLDENS["gauss"]["lgbn_cpds"]}
        for cpd in fitted.get_cpds():
            g = by_var[str(cpd.variable)]
            # align beta order to the golden's evidence order
            order = [list(cpd.evidence).index(e) for e in g["evidence"]]
            beta = [cpd.beta[0]] + [cpd.beta[1 + i] for i in order]
            assert np.allclose(beta, g["beta"], rtol=1e-8, atol=1e-10)
            assert float(np.ravel(cpd.std)[0]) == pytest.approx(g["std"], rel=1e-8)

    def test_joint_gaussian(self, fitted):
        g_nodes = GOLDENS["gauss"]["joint_cov"]["nodes"]
        variables, mean, cov = fitted.joint_gaussian()
        idx = [variables.index(n) for n in g_nodes]
        mean = mean[idx]
        cov = cov[np.ix_(idx, idx)]
        g_mean = [GOLDENS["gauss"]["joint_mean"][n] for n in g_nodes]
        # the reference's public values are rounded to 8 decimals
        assert np.allclose(mean, g_mean, rtol=0, atol=1e-8)
        assert np.allclose(
            cov, GOLDENS["gauss"]["joint_cov"]["cov"], rtol=0, atol=1e-8
        )
        # public contract: rounded 2-tuple
        mu2, cov2 = fitted.to_joint_gaussian()
        assert np.allclose(mu2[idx], g_mean, atol=1e-7)

    def test_log_likelihood(self, fitted, gauss_df):
        assert fitted.log_likelihood(gauss_df) == pytest.approx(
            GOLDENS["gauss"]["log_likelihood"], rel=1e-9
        )

    def test_predict(self, fitted, gauss_df):
        pred_df = gauss_df.iloc[:5][["A", "B", "C"]].copy()
        variables, mu, cov = fitted.predict(pred_df)
        g = GOLDENS["gauss"]["predict"]
        idx = [variables.index(v) for v in g["vars"]]
        assert np.allclose(
            np.asarray(mu)[:, idx], g["mu"], rtol=1e-6, atol=1e-8
        )
        assert np.allclose(
            np.asarray(cov)[np.ix_(idx, idx)], g["cov"], rtol=1e-6, atol=1e-8
        )

    def test_estimate_ate(self, fitted, gauss_df):
        infer = CausalInference(fitted)
        ate = infer.estimate_ate(
            "A", "C", data=gauss_df,
            estimand_strategy="smallest", estimator_type="linear",
        )
        assert float(ate) == pytest.approx(GOLDENS["gauss"]["ate_A_C"], rel=1e-8)
        from pgmpy_tpu.inference.linear_model import LinearEstimator

        ate = LinearEstimator(fitted).fit(
            X="E", Y="F", Z=["D"], data=gauss_df
        )._get_ate()
        assert float(ate) == pytest.approx(
            GOLDENS["gauss"]["ate_E_F_given_D"], rel=1e-8
        )


class TestDiscreteSearch:
    @pytest.fixture(scope="class", params=["asia", "cancer", "survey"])
    def net(self, request):
        name = request.param
        model = get_example_model(name)
        df = standalone_sample(
            model, GOLDENS["discrete_search"][name]["n_rows"], seed=2026
        )
        return name, GOLDENS["discrete_search"][name], df

    def test_hillclimb(self, net):
        from pgmpy_tpu.estimators.scores import BIC, K2

        name, g, df = net
        dag = HillClimbSearch(df).estimate(
            scoring_method="bic-d", show_progress=False
        )
        assert_search_parity(dag, g["hillclimb_bic_edges"], df, BIC)
        dag = HillClimbSearch(df).estimate(scoring_method="k2", show_progress=False)
        assert_search_parity(dag, g["hillclimb_k2_edges"], df, K2)

    def test_ges(self, net):
        name, g, df = net
        dag = GES(df).estimate(scoring_method="bic-d")
        assert dag_edges(dag) == g["ges_edges"]

    def test_chow_liu_and_tan(self, net):
        name, g, df = net
        ts = TreeSearch(df, root_node=g["chow_liu_root"]).estimate(
            estimator_type="chow-liu", show_progress=False
        )
        assert dag_edges(ts) == g["chow_liu_edges"]
        tan = TreeSearch(df, root_node=g["tan_root"]).estimate(
            estimator_type="tan", class_node=g["tan_class"], show_progress=False
        )
        assert dag_edges(tan) == g["tan_edges"]

    def test_mmhc(self, net):
        import networkx as nx

        from pgmpy_tpu.estimators.scores import BDeu

        name, g, df = net
        est = MmhcEstimator(df)

        # The reference's mmpc is NOT deterministic: its max-min heuristic
        # iterates a hash-ordered set with a >= tie rule, and 1-p ties at
        # 1.0 are pervasive — three PYTHONHASHSEEDs give three different
        # skeletons on this very frame.  So no exact-skeleton golden can
        # exist; instead assert (a) OUR mmpc is deterministic across
        # calls, and (b) the full search achieves AT LEAST the recorded
        # reference run's BDeu score (cross-library anchor).
        skel = est.mmpc(significance_level=0.01)
        skel2 = MmhcEstimator(df).mmpc(significance_level=0.01)
        assert sorted(map(sorted, skel.edges())) == sorted(
            map(sorted, skel2.edges())
        )

        dag = est.estimate(significance_level=0.01)
        scorer = BDeu(df, equivalent_sample_size=10)

        def total(edges):
            d = nx.DiGraph(list(edges))
            d.add_nodes_from(df.columns)
            return sum(
                scorer.local_score(n, list(d.predecessors(n))) for n in d.nodes()
            )

        assert total(dag.edges()) >= total(map(tuple, g["mmhc_edges"])) - 1e-6

    def test_exhaustive(self, net):
        name, g, df = net
        if "exhaustive_edges" not in g:
            pytest.skip("exhaustive not goldened for this network")
        sub = df[g["exhaustive_cols"]]
        best = ExhaustiveSearch(sub, use_cache=False).estimate()
        assert dag_edges(best) == g["exhaustive_edges"]


class TestEMParity:
    def test_em_fixed_init(self):
        g = GOLDENS["em"]
        model = get_example_model(g["network"])
        df_full = standalone_sample(model, g["n_rows"], seed=g["data_seed"])
        latent = g["latent"]
        df = df_full.drop(columns=[latent])

        bn = DiscreteBayesianNetwork(list(model.edges()), latents={latent})
        spec = []
        for var in sorted(bn.nodes(), key=str):
            parents = sorted(bn.get_parents(var), key=str)
            spec.append((var, 2, [(p, 2) for p in parents]))
        init_vals = em_init_values(spec, seed=g["init_seed"])
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
            max_iter=g["max_iter"],
            atol=1e-12,
            seed=0,
            init_cpds=init_cpds,
            show_progress=False,
        )
        ours = {str(c.variable): c for c in cpds}
        for gc in g["cpds"]:
            cpd = ours[gc["variable"]]
            ev_ours = [str(e) for e in cpd.variables[1:]]
            assert sorted(ev_ours) == sorted(gc["evidence"])
            # align the golden's (card, prod(ev_g)) table to OUR evidence
            # order and state order, then compare values
            var = gc["variable"]
            g_states = {k: [str(x) for x in v] for k, v in gc["state_names"].items()}
            card = len(g_states[var])
            g_cards = [len(g_states[e]) for e in gc["evidence"]]
            arr = np.asarray(gc["values_2d"], dtype=np.float64).reshape(
                [card] + g_cards
            )
            # permute evidence axes into our order
            perm = [0] + [1 + gc["evidence"].index(e) for e in ev_ours]
            arr = np.transpose(arr, perm)
            # align state orders per axis
            our_states = {
                str(v): [str(s) for s in cpd.state_names[v]] for v in cpd.variables
            }
            idx0 = [g_states[var].index(s) for s in our_states[var]]
            arr = arr[np.ix_(idx0, *[
                [g_states[e].index(s) for s in our_states[e]] for e in ev_ours
            ])] if ev_ours else arr[idx0]
            arr2d = arr.reshape(card, -1)
            # our E-step runs on device in f32, so the converged fixed
            # point agrees with the reference's f64 EM to ~1e-5
            assert np.allclose(
                np.asarray(cpd.get_values(), dtype=np.float64), arr2d, atol=1e-4
            ), (var, cpd.get_values(), arr2d)


class TestMplpParity:
    def test_map_query(self):
        import itertools

        g = GOLDENS["mplp"]
        nodes, edges, unary, pairwise = mplp_grid_spec(
            g["rows"], g["cols"], seed=g["seed"]
        )
        mn = DiscreteMarkovNetwork()
        mn.add_nodes_from(nodes)
        mn.add_edges_from(edges)
        factors = [DiscreteFactor([n], [2], unary[n]) for n in nodes] + [
            DiscreteFactor(list(e), [2, 2], pairwise[e].ravel()) for e in edges
        ]
        mn.add_factors(*factors)
        mplp = Mplp(mn)
        assignment = {str(k): int(v) for k, v in mplp.map_query().items()}

        def energy(assign):
            e = 0.0
            for n in nodes:
                e += np.log(unary[n][assign[n]])
            for u, v in edges:
                e += np.log(pairwise[(u, v)][assign[u], assign[v]])
            return e

        best = max(
            energy(dict(zip(nodes, vals)))
            for vals in itertools.product([0, 1], repeat=len(nodes))
        )
        ref_energy = energy({k: int(v) for k, v in g["assignment"].items()})
        ours_energy = energy(assignment)
        # the reference's per-cluster local decode can return a suboptimal
        # assignment even at integrality gap 0 (it scores 14.95 on this
        # grid vs the true MAP 16.32); require ours to be at least as good
        # AND exactly optimal on this brute-forceable instance
        assert ours_energy >= ref_energy - 1e-9
        assert ours_energy == pytest.approx(best, abs=1e-9)
        assert float(mplp.get_integrality_gap()) == pytest.approx(
            g["integrality_gap"], abs=1e-6
        )


class TestCausalGraphParity:
    @pytest.mark.parametrize("name", sorted(CAUSAL_GRAPH_SPECS))
    def test_identification_outputs(self, name):
        g = GOLDENS["causal_graphs"][name]
        edges, latents = CAUSAL_GRAPH_SPECS[name]
        model = DiscreteBayesianNetwork(edges, latents=set(latents))
        infer = CausalInference(model)

        if "minimal_adjustment_set" in g:
            mas = infer.get_minimal_adjustment_set("X", "Y")
            got = sorted(str(s) for s in mas) if mas is not None else None
            assert got == g["minimal_adjustment_set"]
        else:
            with pytest.raises(ValueError):
                infer.get_minimal_adjustment_set("X", "Y")

        if "ivs" in g:
            assert sorted(str(s) for s in infer.get_ivs("X", "Y")) == g["ivs"]
        else:
            with pytest.raises(ValueError):
                infer.get_ivs("X", "Y")

        if "conditional_ivs" in g:
            got = sorted(
                [str(z), sorted(str(c) for c in cond)]
                for z, cond in infer.get_conditional_ivs("X", "Y")
            )
            assert got == g["conditional_ivs"]
        else:
            with pytest.raises(ValueError):
                infer.get_conditional_ivs("X", "Y")
