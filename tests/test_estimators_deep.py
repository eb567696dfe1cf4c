"""Deep estimator tests: CI tests, structure scores, and structure search.

Mirrors the depth of the reference suites
(/root/reference/pgmpy/tests/test_estimators/ — test_PC.py 644 LoC,
test_StructureScore.py 643 LoC, test_CITests.py 522 LoC) with independent
oracles: scipy contingency statistics computed directly in the test,
closed-form lgamma score formulas re-derived inline, and recovery checks
on data simulated from known ground-truth structures.
"""

import math

import numpy as np
import pandas as pd
import pytest
from scipy import stats

from pgmpy_tpu.estimators import (
    AIC,
    BDeu,
    BDs,
    BIC,
    K2,
    BayesianEstimator,
    ExhaustiveSearch,
    ExpectationMaximization,
    ExpertKnowledge,
    GES,
    HillClimbSearch,
    LogLikeliHood,
    MaximumLikelihoodEstimator,
    PC,
    TreeSearch,
    chi_square,
    g_sq,
    independence_match,
    pearsonr,
    power_divergence,
)
from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.independencies import Independencies
from pgmpy_tpu.models import DiscreteBayesianNetwork


def _bn_abc():
    """A -> B -> C chain with strong dependence."""
    model = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
    model.add_cpds(
        TabularCPD("A", 2, [[0.5], [0.5]]),
        TabularCPD("B", 2, [[0.9, 0.1], [0.1, 0.9]],
                   evidence=["A"], evidence_card=[2]),
        TabularCPD("C", 2, [[0.85, 0.15], [0.15, 0.85]],
                   evidence=["B"], evidence_card=[2]))
    return model


@pytest.fixture(scope="module")
def chain_data():
    return _bn_abc().simulate(n_samples=4000, seed=7, show_progress=False)


# --------------------------------------------------------------------- #
# CI tests vs scipy oracles
# --------------------------------------------------------------------- #
class TestCITests:
    def test_marginal_chi2_matches_scipy(self, chain_data):
        chi, p, dof = chi_square("A", "B", [], chain_data, boolean=False)
        table = pd.crosstab(chain_data["A"], chain_data["B"])
        # reference semantics: chi2_contingency default Yates correction
        want_chi, want_p, want_dof, _ = stats.chi2_contingency(table)
        assert chi == pytest.approx(want_chi, rel=1e-6)
        assert p == pytest.approx(want_p, abs=1e-9)
        assert dof == want_dof

    def test_conditional_chi2_sums_groups(self, chain_data):
        chi, p, dof = chi_square("A", "C", ["B"], chain_data, boolean=False)
        want_chi = 0.0
        want_dof = 0
        for _, grp in chain_data.groupby("B", observed=True):
            table = pd.crosstab(grp["A"], grp["C"])
            if table.shape[0] < 2 or table.shape[1] < 2:
                continue
            c, _, d, _ = stats.chi2_contingency(table)
            want_chi += c
            want_dof += d
        assert chi == pytest.approx(want_chi, rel=1e-6)
        assert p == pytest.approx(1 - stats.chi2.cdf(want_chi, want_dof),
                                  abs=1e-9)

    def test_g_sq_matches_scipy(self, chain_data):
        g, p, dof = g_sq("B", "C", [], chain_data, boolean=False)
        table = pd.crosstab(chain_data["B"], chain_data["C"])
        want_g, want_p, want_dof, _ = stats.chi2_contingency(
            table, lambda_="log-likelihood")
        assert g == pytest.approx(want_g, rel=1e-6)
        assert dof == want_dof

    def test_boolean_decisions(self, chain_data):
        # A and B strongly dependent; A ⟂ C | B by construction
        assert not chi_square("A", "B", [], chain_data, boolean=True,
                              significance_level=0.01)
        assert chi_square("A", "C", ["B"], chain_data, boolean=True,
                          significance_level=0.01)

    def test_power_divergence_lambdas_agree_on_independent(self):
        rng = np.random.default_rng(0)
        data = pd.DataFrame({
            "X": rng.choice(["0", "1"], 2000),
            "Y": rng.choice(["0", "1"], 2000)})
        for lam in ["pearson", "log-likelihood", "freeman-tukey",
                    "mod-log-likelihood", "neyman", "cressie-read"]:
            assert power_divergence("X", "Y", [], data, boolean=True,
                                    significance_level=0.01, lambda_=lam)

    def test_pearsonr_marginal(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=3000)
        y = 0.8 * x + rng.normal(size=3000)
        z = rng.normal(size=3000)
        data = pd.DataFrame({"X": x, "Y": y, "Z": z})
        r, p = pearsonr("X", "Y", [], data, boolean=False)
        want_r, want_p = stats.pearsonr(x, y)
        assert r == pytest.approx(want_r, abs=1e-9)
        assert not pearsonr("X", "Y", [], data, boolean=True,
                            significance_level=0.05)
        assert pearsonr("X", "Z", [], data, boolean=True,
                        significance_level=0.01)

    def test_pearsonr_partial_kills_common_cause(self):
        rng = np.random.default_rng(2)
        z = rng.normal(size=4000)
        x = z + 0.5 * rng.normal(size=4000)
        y = z + 0.5 * rng.normal(size=4000)
        data = pd.DataFrame({"X": x, "Y": y, "Z": z})
        assert not pearsonr("X", "Y", [], data, boolean=True,
                            significance_level=0.01)
        assert pearsonr("X", "Y", ["Z"], data, boolean=True,
                        significance_level=0.01)

    def test_independence_match_oracle(self):
        ind = Independencies([["A"], ["C"], ["B"]])
        assert independence_match("A", "C", ["B"], independencies=ind)
        assert not independence_match("A", "B", [], independencies=ind)


# --------------------------------------------------------------------- #
# structure scores vs closed-form lgamma oracles
# --------------------------------------------------------------------- #
def _counts(data, var, parents, states):
    """N_ijk count tensor (j = parent config, k = child state) via plain
    boolean masks — independent of any groupby/count implementation."""
    import itertools

    configs = []
    for combo in itertools.product(*(states[p] for p in parents)):
        mask = np.ones(len(data), dtype=bool)
        for p, s in zip(parents, combo):
            mask &= (data[p] == s).to_numpy()
        configs.append(
            [int(((data[var] == s).to_numpy() & mask).sum())
             for s in states[var]])
    return np.array(configs, dtype=np.float64)


def _k2_oracle(data, var, parents, states):
    n = _counts(data, var, parents, states)
    r = len(states[var])
    score = 0.0
    for row in n:
        score += math.lgamma(r) - math.lgamma(r + row.sum())
        for c in row:
            score += math.lgamma(1 + c) - math.lgamma(1)
    return score


def _bdeu_oracle(data, var, parents, states, ess=10):
    n = _counts(data, var, parents, states)
    q = n.shape[0]
    r = len(states[var])
    a_j = ess / q
    a_jk = ess / (q * r)
    score = 0.0
    for row in n:
        score += math.lgamma(a_j) - math.lgamma(a_j + row.sum())
        for c in row:
            score += math.lgamma(a_jk + c) - math.lgamma(a_jk)
    return score


def _ll_oracle(data, var, parents, states):
    n = _counts(data, var, parents, states)
    ll = 0.0
    for row in n:
        tot = row.sum()
        for c in row:
            if c > 0:
                ll += c * math.log(c / tot)
    return ll


class TestStructureScores:
    @pytest.fixture(scope="class")
    def data(self):
        return _bn_abc().simulate(n_samples=500, seed=3, show_progress=False)

    def _states(self, data):
        return {c: sorted(data[c].unique()) for c in data.columns}

    @pytest.mark.parametrize("parents", [[], ["A"], ["A", "C"]])
    def test_k2_local_score(self, data, parents):
        got = K2(data).local_score("B", parents)
        want = _k2_oracle(data, "B", parents, self._states(data))
        assert got == pytest.approx(want, rel=1e-9)

    @pytest.mark.parametrize("parents", [[], ["B"]])
    def test_bdeu_local_score(self, data, parents):
        got = BDeu(data, equivalent_sample_size=10).local_score("C", parents)
        want = _bdeu_oracle(data, "C", parents, self._states(data))
        assert got == pytest.approx(want, rel=1e-9)

    def test_loglikelihood_local_score(self, data):
        got = LogLikeliHood(data).local_score("B", ["A"])
        want = _ll_oracle(data, "B", ["A"], self._states(data))
        assert got == pytest.approx(want, rel=1e-9)

    def test_bic_penalty(self, data):
        ll = LogLikeliHood(data).local_score("B", ["A"])
        bic = BIC(data).local_score("B", ["A"])
        # 2 parent configs x (2-1) free params
        want = ll - 0.5 * math.log(len(data)) * 2
        assert bic == pytest.approx(want, rel=1e-9)

    def test_aic_penalty(self, data):
        ll = LogLikeliHood(data).local_score("B", ["A"])
        aic = AIC(data).local_score("B", ["A"])
        assert aic == pytest.approx(ll - 2, rel=1e-9)

    def test_score_decomposes(self, data):
        model = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        s = K2(data)
        total = s.score(model)
        want = (s.local_score("A", []) + s.local_score("B", ["A"])
                + s.local_score("C", ["B"]))
        assert total == pytest.approx(want, rel=1e-9)

    def test_true_structure_beats_wrong(self, data):
        s = BIC(data)
        true_model = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        indep_model = DiscreteBayesianNetwork()
        indep_model.add_nodes_from(["A", "B", "C"])
        wrong_model = DiscreteBayesianNetwork([("A", "C")])
        wrong_model.add_node("B")
        assert s.score(true_model) > s.score(indep_model)
        assert s.score(true_model) > s.score(wrong_model)

    def test_equivalent_dags_same_bdeu(self, data):
        # A->B->C and A<-B<-C are Markov equivalent: BDeu must match
        s = BDeu(data, equivalent_sample_size=10)
        m1 = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        m2 = DiscreteBayesianNetwork([("C", "B"), ("B", "A")])
        assert s.score(m1) == pytest.approx(s.score(m2), rel=1e-9)

    def test_bds_structure_prior_ratio(self, data):
        s = BDs(data)
        assert s.structure_prior_ratio("+") < 0
        assert s.structure_prior_ratio("-") > 0
        assert s.structure_prior_ratio("flip") == 0


# --------------------------------------------------------------------- #
# structure search recovers known ground truth
# --------------------------------------------------------------------- #
class TestStructureSearch:
    @pytest.fixture(scope="class")
    def data(self):
        return _bn_abc().simulate(n_samples=5000, seed=11,
                                  show_progress=False)

    def test_pc_recovers_skeleton(self, data):
        skel, sep = PC(data).build_skeleton(ci_test="chi_square",
                                            significance_level=0.01)
        assert {frozenset(e) for e in skel.edges()} == {
            frozenset(("A", "B")), frozenset(("B", "C"))}

    def test_pc_estimate_dag_equivalent(self, data):
        model = PC(data).estimate(ci_test="chi_square",
                                  significance_level=0.01,
                                  return_type="dag", show_progress=False)
        truth = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        assert {frozenset(e) for e in model.edges()} == {
            frozenset(e) for e in truth.edges()}
        assert model.get_immoralities() == {}

    def test_pc_stable_variant(self, data):
        model = PC(data).estimate(variant="stable", ci_test="chi_square",
                                  significance_level=0.01,
                                  return_type="dag", show_progress=False)
        assert {frozenset(e) for e in model.edges()} == {
            frozenset(("A", "B")), frozenset(("B", "C"))}

    def test_hill_climb_recovers_equivalence_class(self, data):
        best = HillClimbSearch(data).estimate(scoring_method="bic-d",
                                              show_progress=False)
        assert {frozenset(e) for e in best.edges()} == {
            frozenset(("A", "B")), frozenset(("B", "C"))}

    def test_hill_climb_forbidden_edge(self, data):
        ek = ExpertKnowledge(forbidden_edges=[("A", "B"), ("B", "A")])
        best = HillClimbSearch(data).estimate(
            scoring_method="bic-d", expert_knowledge=ek, show_progress=False)
        edges = {frozenset(e) for e in best.edges()}
        assert frozenset(("A", "B")) not in edges

    def test_ges_recovers(self, data):
        model = GES(data).estimate(scoring_method="bic-d")
        assert {frozenset(e) for e in model.edges()} == {
            frozenset(("A", "B")), frozenset(("B", "C"))}

    def test_exhaustive_best_matches_truth(self, data):
        small = data[["A", "B"]]
        best = ExhaustiveSearch(small, scoring_method=BIC(small)).estimate()
        assert {frozenset(e) for e in best.edges()} == {frozenset(("A", "B"))}

    def test_exhaustive_all_dags_count(self, data):
        small = data[["A", "B"]]
        searcher = ExhaustiveSearch(small, scoring_method=BIC(small))
        assert len(list(searcher.all_dags())) == 3  # a3 Robinson number

    def test_tree_search_chow_liu(self):
        model = _bn_abc()
        data = model.simulate(n_samples=4000, seed=13, show_progress=False)
        tree = TreeSearch(data, root_node="A").estimate(
            estimator_type="chow-liu", show_progress=False)
        assert {frozenset(e) for e in tree.edges()} == {
            frozenset(("A", "B")), frozenset(("B", "C"))}


# --------------------------------------------------------------------- #
# parameter estimators
# --------------------------------------------------------------------- #
class TestParameterEstimators:
    def test_mle_converges_to_truth(self):
        model = _bn_abc()
        data = model.simulate(n_samples=30_000, seed=17, show_progress=False)
        est = MaximumLikelihoodEstimator(
            DiscreteBayesianNetwork([("A", "B"), ("B", "C")]), data)
        cpds = {c.variable: c for c in est.get_parameters()}
        truth = np.asarray(model.get_cpds("B").get_values(), dtype=np.float64)
        # state order from data is sorted, matching the 0/1 layout
        got = np.asarray(cpds["B"].get_values(), dtype=np.float64)
        np.testing.assert_allclose(got, truth, atol=0.02)

    def test_bayesian_k2_prior_formula(self):
        data = pd.DataFrame({"A": ["a0"] * 6 + ["a1"] * 2})
        # direct golden: K2 prior adds 1 pseudo count per state
        model = DiscreteBayesianNetwork()
        model.add_node("A")
        est = BayesianEstimator(model, data)
        cpd = est.estimate_cpd("A", prior_type="K2")
        np.testing.assert_allclose(
            np.asarray(cpd.values, dtype=np.float64), [7 / 10, 3 / 10],
            atol=1e-7)

    def test_bayesian_dirichlet_pseudocounts(self):
        data = pd.DataFrame({"A": ["a0"] * 5 + ["a1"] * 5})
        model = DiscreteBayesianNetwork()
        model.add_node("A")
        cpd = BayesianEstimator(model, data).estimate_cpd(
            "A", prior_type="dirichlet", pseudo_counts=[[10], [0]])
        np.testing.assert_allclose(
            np.asarray(cpd.values, dtype=np.float64), [15 / 20, 5 / 20],
            atol=1e-7)

    def test_em_recovers_latent_mixture(self):
        # two-component mixture: latent L -> X with distinctive emissions
        truth = DiscreteBayesianNetwork([("L", "X"), ("L", "Y")])
        truth.add_cpds(
            TabularCPD("L", 2, [[0.5], [0.5]]),
            TabularCPD("X", 2, [[0.9, 0.1], [0.1, 0.9]],
                       evidence=["L"], evidence_card=[2]),
            TabularCPD("Y", 2, [[0.9, 0.1], [0.1, 0.9]],
                       evidence=["L"], evidence_card=[2]))
        data = truth.simulate(n_samples=3000, seed=19, show_progress=False)
        data = data[["X", "Y"]]
        model = DiscreteBayesianNetwork([("L", "X"), ("L", "Y")])
        model.latents = {"L"}
        est = ExpectationMaximization(model, data)
        cpds = {c.variable: c for c in est.get_parameters(seed=23,
                                                          show_progress=False)}
        x_vals = np.asarray(cpds["X"].get_values(), dtype=np.float64)
        # label-swapping allowed: columns must be ~(0.9,0.1) in some order
        hi = max(x_vals[0, 0], x_vals[0, 1])
        lo = min(x_vals[0, 0], x_vals[0, 1])
        assert hi > 0.8 and lo < 0.2
