"""Deep Independencies / JPD / FactorSet / metrics tests.

Mirrors the reference depth (test_Independencies.py, test_Metrics.py,
test_FactorSet.py, test_JointProbabilityDistribution.py) with independent
oracles: semi-graphoid axioms checked directly, empirical independence
from enumerated joints, hand SHD counts, and scipy chi-square fits.
"""

import itertools

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.factors import (
    DiscreteFactor,
    FactorSet,
    JointProbabilityDistribution,
    TabularCPD,
)
from pgmpy_tpu.independencies import IndependenceAssertion, Independencies
from pgmpy_tpu.metrics import (
    SHD,
    correlation_score,
    fisher_c,
    implied_cis,
    log_likelihood_score,
    structure_score,
)
from pgmpy_tpu.models import DiscreteBayesianNetwork


class TestIndependenceAssertion:
    def test_symmetry_in_eq(self):
        a = IndependenceAssertion(["X"], ["Y"], ["Z"])
        b = IndependenceAssertion(["Y"], ["X"], ["Z"])
        assert a == b
        assert hash(a) == hash(b)

    def test_multi_event(self):
        a = IndependenceAssertion(["X", "W"], ["Y"], ["Z"])
        assert a.event1 == {"X", "W"}

    def test_requires_event2(self):
        with pytest.raises(ValueError):
            IndependenceAssertion(["X"])

    def test_str(self):
        a = IndependenceAssertion(["X"], ["Y"])
        assert "X" in str(a) and "Y" in str(a)


class TestIndependencies:
    def test_contains_and_eq(self):
        ind = Independencies(["X", "Y", "Z"])
        assert ind.contains(IndependenceAssertion("X", "Y", "Z"))
        assert Independencies(["X", "Y"]) == Independencies(["Y", "X"])
        assert Independencies(["X", "Y"]) != Independencies(["X", "Z"])

    def test_closure_decomposition(self):
        # X ⟂ {Y, W} implies X ⟂ Y and X ⟂ W
        ind = Independencies(["X", ["Y", "W"]])
        closure = ind.closure()
        assert closure.contains(IndependenceAssertion("X", "Y"))
        assert closure.contains(IndependenceAssertion("X", "W"))

    def test_closure_weak_union(self):
        # X ⟂ {Y, W} implies X ⟂ Y | W
        ind = Independencies(["X", ["Y", "W"]])
        closure = ind.closure()
        assert closure.contains(IndependenceAssertion("X", "Y", "W"))

    def test_closure_contraction_direction(self):
        # (X ⟂ W | Y,Z) & (X ⟂ Y | Z) => X ⟂ {W,Y} | Z
        ind = Independencies(
            ["X", "W", ["Y", "Z"]], ["X", "Y", "Z"])
        closure = ind.closure()
        assert closure.contains(
            IndependenceAssertion("X", ["W", "Y"], "Z"))

    def test_entails(self):
        big = Independencies(["X", ["Y", "W"]])
        small = Independencies(["X", "Y"])
        assert big.entails(small)
        assert not small.entails(big)

    def test_entails_self(self):
        ind = Independencies(["X", "Y", "Z"])
        assert ind.entails(ind)

    def test_reduce_removes_implied(self):
        ind = Independencies(["X", ["Y", "W"]], ["X", "Y"])
        reduced = ind.reduce(inplace=False)
        # X ⟂ Y is implied by X ⟂ {Y, W}
        assert len(reduced.get_assertions()) == 1

    def test_dag_independencies_closed(self):
        from pgmpy_tpu.base import DAG

        dag = DAG([("A", "B"), ("B", "C")])
        ind = dag.get_independencies()
        # A ⟂ C | B must be entailed
        assert ind.entails(Independencies(["A", "C", "B"]))


def _jpd_independent():
    # P(X, Y) = P(X) P(Y), X binary 0.3/0.7, Y ternary 0.2/0.5/0.3
    px = np.array([0.3, 0.7])
    py = np.array([0.2, 0.5, 0.3])
    return JointProbabilityDistribution(
        ["X", "Y"], [2, 3], np.outer(px, py).ravel())


class TestJPD:
    def test_values_sum_validation(self):
        with pytest.raises(ValueError):
            JointProbabilityDistribution(["X"], [2], [0.6, 0.6])

    def test_marginal_distribution(self):
        jpd = _jpd_independent()
        marg = jpd.marginal_distribution(["Y"], inplace=False)
        np.testing.assert_allclose(
            np.asarray(marg.values, dtype=np.float64), [0.2, 0.5, 0.3],
            atol=1e-7)

    def test_check_independence_true(self):
        jpd = _jpd_independent()
        assert jpd.check_independence(["X"], ["Y"])

    def test_check_independence_false(self):
        vals = np.array([[0.25, 0.25], [0.05, 0.45]])
        jpd = JointProbabilityDistribution(["X", "Y"], [2, 2], vals.ravel())
        assert not jpd.check_independence(["X"], ["Y"])

    def test_conditional_distribution(self):
        jpd = _jpd_independent()
        cond = jpd.conditional_distribution([("X", 0)], inplace=False)
        np.testing.assert_allclose(
            np.asarray(cond.values, dtype=np.float64), [0.2, 0.5, 0.3],
            atol=1e-7)

    def test_get_independencies(self):
        jpd = _jpd_independent()
        ind = jpd.get_independencies()
        assert ind.contains(IndependenceAssertion("X", "Y"))

    def test_is_imap(self):
        jpd = _jpd_independent()
        model = DiscreteBayesianNetwork()
        model.add_nodes_from(["X", "Y"])
        model.add_cpds(TabularCPD("X", 2, [[0.3], [0.7]]),
                       TabularCPD("Y", 3, [[0.2], [0.5], [0.3]]))
        assert jpd.is_imap(model)

    def test_minimal_imap_independent_has_no_edges(self):
        jpd = _jpd_independent()
        imap = jpd.minimal_imap(order=["X", "Y"])
        assert len(imap.edges()) == 0


class TestFactorSet:
    def test_product_is_union(self):
        f1 = DiscreteFactor(["a"], [2], [1.0, 2.0])
        f2 = DiscreteFactor(["b"], [2], [3.0, 4.0])
        f3 = DiscreteFactor(["c"], [2], [5.0, 6.0])
        s1 = FactorSet(f1)
        s2 = FactorSet(f2, f3)
        prod = s1.product(s2, inplace=False)
        assert len(prod.get_factors()) == 3

    def test_divide_inverts(self):
        f1 = DiscreteFactor(["a"], [2], [1.0, 2.0])
        f2 = DiscreteFactor(["b"], [2], [4.0, 8.0])
        s1 = FactorSet(f1)
        s2 = FactorSet(f2)
        div = s1.divide(s2, inplace=False)
        factors = {frozenset(f.variables): f for f in div.get_factors()}
        np.testing.assert_allclose(
            np.asarray(factors[frozenset(["b"])].values, dtype=np.float64),
            [0.25, 0.125])

    def test_marginalize_touches_only_relevant(self):
        f1 = DiscreteFactor(["a", "b"], [2, 2], [1, 2, 3, 4])
        f2 = DiscreteFactor(["c"], [2], [5, 6])
        fs = FactorSet(f1, f2)
        out = fs.marginalize(["b"], inplace=False)
        scopes = {frozenset(f.variables) for f in out.get_factors()}
        assert scopes == {frozenset(["a"]), frozenset(["c"])}

    def test_operators(self):
        f1 = DiscreteFactor(["a"], [2], [1.0, 2.0])
        f2 = DiscreteFactor(["b"], [2], [3.0, 4.0])
        prod = FactorSet(f1) * FactorSet(f2)
        assert len(prod.get_factors()) == 2


def _chain_model():
    model = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
    model.add_cpds(
        TabularCPD("A", 2, [[0.4], [0.6]]),
        TabularCPD("B", 2, [[0.8, 0.2], [0.2, 0.8]],
                   evidence=["A"], evidence_card=[2]),
        TabularCPD("C", 2, [[0.9, 0.3], [0.1, 0.7]],
                   evidence=["B"], evidence_card=[2]))
    return model


class TestMetrics:
    @pytest.fixture(scope="class")
    def data(self):
        return _chain_model().simulate(n_samples=4000, seed=0,
                                       show_progress=False)

    def test_log_likelihood_score_matches_hand(self, data):
        model = _chain_model()
        got = log_likelihood_score(model, data)
        # hand: sum over rows of log CPT entries
        a = data["A"].astype(int).to_numpy()
        b = data["B"].astype(int).to_numpy()
        c = data["C"].astype(int).to_numpy()
        pa = np.array([0.4, 0.6])[a]
        pb = np.array([[0.8, 0.2], [0.2, 0.8]])[b, a]
        pc = np.array([[0.9, 0.3], [0.1, 0.7]])[c, b]
        want = np.log(pa).sum() + np.log(pb).sum() + np.log(pc).sum()
        assert got == pytest.approx(want, rel=1e-6)

    def test_structure_score_consistent_with_estimator(self, data):
        from pgmpy_tpu.estimators import BIC

        struct = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        got = structure_score(struct, data, scoring_method="bic-d")
        want = BIC(data).score(struct)
        assert got == pytest.approx(want, rel=1e-9)

    def test_correlation_score_good_model(self, data):
        # correlation_score's positive class is marginal d-SEPARATION
        # (reference metrics.py:140-162); a chain d-connects every pair,
        # so discriminate with an added independent node instead
        model = _chain_model()
        model.add_node("W")
        model.add_cpds(TabularCPD("W", 2, [[0.5], [0.5]]))
        df = model.simulate(n_samples=4000, seed=0, show_progress=False)
        score = correlation_score(model, df, test="chi_square",
                                  significance_level=0.05)
        assert score == 1.0

    def test_implied_cis_dataframe(self, data):
        model = _chain_model()
        df = implied_cis(model, data, ci_test="chi_square",
                         show_progress=False)
        # single implied CI for the chain: A ⟂ C | B
        assert len(df) == 1
        assert df.loc[0, "p-value"] > 0.01

    def test_fisher_c_good_fit(self, data):
        model = _chain_model()
        p = fisher_c(model, data, ci_test="chi_square", show_progress=False)
        assert p > 0.01

    def test_fisher_c_bad_model_rejected(self, data):
        bad = DiscreteBayesianNetwork([("A", "C")])
        bad.add_node("B")
        # claims A ⟂ B and C ⟂ B — grossly violated by the chain data
        p = fisher_c(bad, data, ci_test="chi_square", show_progress=False)
        assert p < 1e-4

    def test_shd_hand_counts(self):
        a = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        b = DiscreteBayesianNetwork([("A", "B"), ("C", "B")])
        # undirected skeletons identical; one edge reversed -> SHD 1
        assert SHD(a, b) == 1
        c = DiscreteBayesianNetwork([("A", "B")])
        c.add_node("C")
        assert SHD(a, c) == 1  # one missing edge
        d = DiscreteBayesianNetwork([("A", "B"), ("B", "C"), ("A", "C")])
        assert SHD(a, d) == 1  # one extra edge

    def test_shd_requires_same_nodes(self):
        a = DiscreteBayesianNetwork([("A", "B")])
        b = DiscreteBayesianNetwork([("A", "C")])
        with pytest.raises(ValueError):
            SHD(a, b)
