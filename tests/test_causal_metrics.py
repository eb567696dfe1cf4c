import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.base import DAG
from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.identification import Adjustment, Frontdoor
from pgmpy_tpu.inference import ApproxInference, CausalInference, VariableElimination
from pgmpy_tpu.metrics import (
    SHD,
    BayesianModelProbability,
    correlation_score,
    fisher_c,
    implied_cis,
    log_likelihood_score,
    structure_score,
)
from pgmpy_tpu.models import DiscreteBayesianNetwork


def confounded_model():
    """z -> x, z -> y, x -> y with z observed."""
    model = DiscreteBayesianNetwork([("z", "x"), ("z", "y"), ("x", "y")])
    model.add_cpds(
        TabularCPD("z", 2, [[0.4], [0.6]]),
        TabularCPD("x", 2, [[0.8, 0.3], [0.2, 0.7]], evidence=["z"], evidence_card=[2]),
        TabularCPD(
            "y", 2,
            [[0.9, 0.5, 0.6, 0.1], [0.1, 0.5, 0.4, 0.9]],
            evidence=["x", "z"], evidence_card=[2, 2],
        ),
    )
    return model


class TestBackdoorFrontdoor:
    def test_backdoor_set(self):
        ci = CausalInference(confounded_model())
        assert ci.is_valid_backdoor_adjustment_set("x", "y", ["z"])
        assert not ci.is_valid_backdoor_adjustment_set("x", "y", [])
        assert frozenset(["z"]) in ci.get_all_backdoor_adjustment_sets("x", "y")

    def test_frontdoor_classic(self):
        # smoking -> tar -> cancer with latent confounder u
        dag = DAG(
            [("u", "smoking"), ("u", "cancer"), ("smoking", "tar"), ("tar", "cancer")],
            latents=["u"],
        )
        ci = CausalInference(dag)
        assert ci.is_valid_frontdoor_adjustment_set("smoking", "cancer", ["tar"])
        assert frozenset(["tar"]) in ci.get_all_frontdoor_adjustment_sets("smoking", "cancer")
        # no backdoor set exists (the confounder is latent): the reference
        # raises here (CausalInference.py:146-210)
        with pytest.raises(ValueError, match="No valid adjustment set"):
            ci.get_all_backdoor_adjustment_sets("smoking", "cancer")

    def test_minimal_adjustment_set(self):
        ci = CausalInference(confounded_model())
        assert ci.get_minimal_adjustment_set("x", "y") == {"z"}

    def test_proper_backdoor_graph(self):
        ci = CausalInference(confounded_model())
        pbg = ci.get_proper_backdoor_graph(["x"], ["y"])
        assert not pbg.has_edge("x", "y")
        assert pbg.has_edge("z", "y")

    def test_ivs(self):
        dag = DAG([("i", "x"), ("u", "x"), ("u", "y"), ("x", "y")], latents=["u"])
        ci = CausalInference(dag)
        assert ci.get_ivs("x", "y") == {"i"}

    def test_identification_method(self):
        ci = CausalInference(confounded_model())
        out = ci.identification_method("x", "y")
        assert out["backdoor set"] == frozenset({frozenset({"z"})})


class TestCausalQuery:
    def test_adjustment_query_matches_truncated_formula(self):
        model = confounded_model()
        ci = CausalInference(model)
        result = ci.query(["y"], do={"x": 1}, show_progress=False)
        # ground truth: P(y | do(x=1)) = sum_z P(y | x=1, z) P(z)
        pz = np.array([0.4, 0.6])
        # P(y | x=1, z): CPD columns are (x, z) with z fastest -> cols 2, 3
        py_given = np.array([[0.6, 0.1], [0.4, 0.9]])  # rows y, cols z
        truth = py_given @ pz
        np.testing.assert_allclose(np.asarray(result.values), truth, atol=1e-5)

    def test_do_on_root_equals_conditioning(self):
        model = confounded_model()
        ci = CausalInference(model)
        res_do = ci.query(["x"], do={"z": 0}, show_progress=False)
        res_cond = VariableElimination(model).query(["x"], evidence={"z": 0}, show_progress=False)
        assert res_do == res_cond

    def test_no_do_regular_query(self):
        model = confounded_model()
        ci = CausalInference(model)
        res = ci.query(["y"], evidence={"x": 0}, show_progress=False)
        expected = VariableElimination(model).query(["y"], evidence={"x": 0}, show_progress=False)
        assert res == expected

    def test_estimate_ate_linear(self):
        rng = np.random.default_rng(0)
        n = 20000
        z = rng.normal(size=n)
        x = 0.8 * z + rng.normal(size=n) * 0.5
        y = 2.0 * x + 1.5 * z + rng.normal(size=n) * 0.5
        data = pd.DataFrame({"x": x, "y": y, "z": z})
        dag = DAG([("z", "x"), ("z", "y"), ("x", "y")])
        ate = CausalInference(dag).estimate_ate("x", "y", data)
        assert ate == pytest.approx(2.0, abs=0.05)


class TestIdentification:
    """Role-pipeline contract (ref identification/base.py:17-22,
    adjustment.py:117-232): identify returns (role-annotated graph,
    success); validate checks the graph's GIVEN adjustment role."""

    def test_adjustment_minimal_reference_example(self):
        # the reference Adjustment docstring example, run unchanged
        dag = DAG(
            ebunch=[("x1", "y1"), ("x1", "z1"), ("z1", "z2"),
                    ("z2", "x2"), ("y2", "z2")],
            roles={"exposure": "x1", "outcome": "y1"},
        )
        dag_with_adj, success = Adjustment(variant="minimal").identify(dag)
        assert success
        # x1 -> y1 has no backdoor path: the minimal set is empty
        assert dag_with_adj.get_role("adjustment") == []
        # original graph untouched
        assert "adjustment" not in dag.roles

    def test_adjustment_minimal_confounder(self):
        dag = DAG([("z", "x"), ("z", "y"), ("x", "y")],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal").identify(dag)
        assert success and set(out.get_role("adjustment")) == {"z"}

    def test_adjustment_validate_given_role(self):
        dag = DAG([("z", "x"), ("z", "y"), ("x", "y")],
                  roles={"exposure": "x", "outcome": "y"})
        good = dag.with_role("adjustment", ["z"])
        assert Adjustment().validate(good)
        # without adjusting for z, the confounder leaks: invalid
        assert not Adjustment().validate(dag)

    def test_adjustment_all_is_validated_powerset(self):
        # z is a confounder, w an ancestor of z; valid sets: {z}, {z, w}
        dag = DAG([("w", "z"), ("z", "x"), ("z", "y"), ("x", "y")],
                  roles={"exposure": "x", "outcome": "y"})
        graphs, success = Adjustment(variant="all").identify(dag)
        assert success
        found = {frozenset(g.get_role("adjustment")) for g in graphs}
        assert found == {frozenset({"z"}), frozenset({"z", "w"})}

    def test_adjustment_unidentifiable(self):
        dag = DAG([("u", "x"), ("u", "y"), ("x", "y")], latents=["u"],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal").identify(dag)
        assert not success and out is dag

    def test_frontdoor_strategy(self):
        dag = DAG(
            [("u", "s"), ("u", "c"), ("s", "t"), ("t", "c")], latents=["u"],
            roles={"exposure": "s", "outcome": "c"},
        )
        out, success = Frontdoor().identify(dag)
        assert success and out.get_role("frontdoor") == ["t"]

    def test_frontdoor_all_variant(self):
        dag = DAG(
            [("u", "s"), ("u", "c"), ("s", "t"), ("t", "c")], latents=["u"],
            roles={"exposure": "s", "outcome": "c"},
        )
        graphs, success = Frontdoor(variant="all").identify(dag)
        assert success
        assert {frozenset(g.get_role("frontdoor")) for g in graphs} == {
            frozenset({"t"})
        }

    def test_frontdoor_failure(self):
        dag = DAG([("u", "x"), ("u", "y"), ("x", "y")], latents=["u"],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Frontdoor().identify(dag)
        assert not success

    def test_missing_roles_raises(self):
        dag = DAG([("a", "b")])
        with pytest.raises(ValueError, match="exposure"):
            Adjustment().identify(dag)

    def test_unsupported_graph_type_raises(self):
        from pgmpy_tpu.base import UndirectedGraph

        g = UndirectedGraph([("a", "b")])
        with pytest.raises(ValueError):
            Adjustment().identify(g)

    def test_multi_exposure_raises_not_implemented(self):
        dag = DAG([("x1", "y"), ("x2", "y")],
                  roles={"exposure": ["x1", "x2"], "outcome": "y"})
        with pytest.raises(NotImplementedError):
            Adjustment(variant="minimal").identify(dag)

    def test_minimal_variance_multi_exposure_raises(self):
        # (single-exposure O-set implemented — the reference stubs the whole
        # variant; multi-exposure stays NotImplementedError)
        dag = DAG([("x1", "y"), ("x2", "y")],
                  roles={"exposure": ["x1", "x2"], "outcome": "y"})
        with pytest.raises(NotImplementedError):
            Adjustment(variant="minimal_variance").identify(dag)


class TestMetrics:
    def test_log_likelihood_score(self):
        model = confounded_model()
        df = model.simulate(n_samples=2000, seed=0, show_progress=False)
        ll = log_likelihood_score(model, df)
        # cross-check against factor-product computation on a subsample
        bmp = BayesianModelProbability(model)
        lp = bmp.log_probability(df.iloc[:5])
        from pgmpy_tpu.factors import factor_product

        joint = factor_product(*[c.to_factor() for c in model.get_cpds()])
        for k in range(5):
            expected = np.log(
                joint.get_value(**{v: df.iloc[k][v] for v in model.nodes()})
            )
            assert lp[k] == pytest.approx(expected, rel=1e-4)
        assert ll < 0

    def test_structure_score_prefers_truth(self):
        model = confounded_model()
        df = model.simulate(n_samples=5000, seed=1, show_progress=False)
        true_score = structure_score(model, df, scoring_method="bic-d")
        wrong = DAG([("x", "z"), ("y", "z")])
        wrong_score = structure_score(wrong, df, scoring_method="bic-d")
        assert true_score > wrong_score

    def test_shd(self):
        d1 = DAG([("a", "b"), ("b", "c")])
        d2 = DAG([("b", "a"), ("b", "c")])
        d2.add_nodes_from(d1.nodes())
        assert SHD(d1, d2) == 1
        d3 = DAG([("a", "b")])
        d3.add_nodes_from(d1.nodes())
        assert SHD(d1, d3) == 1

    def test_correlation_score(self):
        # reference semantics: truth = marginal CI verdicts, prediction =
        # d-SEPARATION; a model with a disconnected, genuinely independent
        # node should score perfectly, while claiming an edge to it drops
        # the score
        model = confounded_model()
        model.add_node("w")
        model.add_cpds(TabularCPD("w", 2, [[0.5], [0.5]]))
        df = model.simulate(n_samples=4000, seed=2, show_progress=False)
        score = correlation_score(model, df, test="chi_square")
        assert score == 1.0
        # a wrong structure connecting w scores strictly worse
        from pgmpy_tpu.base import DAG

        bad = DAG([("z", "x"), ("z", "y"), ("x", "y"), ("w", "x")])
        bad_score = correlation_score(bad, df, test="chi_square")
        assert bad_score < score

    def test_fisher_c(self):
        model = DiscreteBayesianNetwork([("a", "b"), ("b", "c")])
        model.add_cpds(
            TabularCPD("a", 2, [[0.5], [0.5]]),
            TabularCPD("b", 2, [[0.8, 0.2], [0.2, 0.8]], evidence=["a"], evidence_card=[2]),
            TabularCPD("c", 2, [[0.7, 0.3], [0.3, 0.7]], evidence=["b"], evidence_card=[2]),
        )
        df = model.simulate(n_samples=4000, seed=3, show_progress=False)
        out = fisher_c(model, df, ci_test="chi_square", show_progress=False)
        assert out > 0.01  # the true model should fit (bare p-value, ref
        # metrics.py:466)


class TestApproxInference:
    def test_matches_exact(self):
        model = confounded_model()
        approx = ApproxInference(model)
        res = approx.query(["y"], n_samples=40000, seed=0, show_progress=False)
        exact = VariableElimination(model).query(["y"], show_progress=False)
        np.testing.assert_allclose(
            np.asarray(res.values), np.asarray(exact.values), atol=0.02
        )

    def test_with_evidence(self):
        model = confounded_model()
        approx = ApproxInference(model)
        res = approx.query(
            ["y"], evidence={"x": 0}, n_samples=30000, seed=0, show_progress=False
        )
        exact = VariableElimination(model).query(["y"], evidence={"x": 0}, show_progress=False)
        np.testing.assert_allclose(
            np.asarray(res.values), np.asarray(exact.values), atol=0.03
        )


class TestIVMachinery:
    """Reference-parity tests on the reference's own IV test graphs
    (ref tests/test_inference/test_CausalInference.py:500-830)."""

    def setup_method(self):
        from pgmpy_tpu.models import SEMGraph

        self.demo = CausalInference(SEMGraph(
            ebunch=[
                ("xi1", "x1"), ("xi1", "x2"), ("xi1", "x3"), ("xi1", "eta1"),
                ("eta1", "y1"), ("eta1", "y2"), ("eta1", "y3"), ("eta1", "y4"),
                ("eta1", "eta2"), ("xi1", "eta2"),
                ("eta2", "y5"), ("eta2", "y6"), ("eta2", "y7"), ("eta2", "y8"),
            ],
            latents=["xi1", "eta1", "eta2"],
            err_corr=[
                ("y1", "y5"), ("y2", "y6"), ("y2", "y4"),
                ("y3", "y7"), ("y4", "y8"), ("y6", "y8"),
            ],
        ))
        self.union = CausalInference(SEMGraph(
            ebunch=[
                ("yrsmill", "unionsen"), ("age", "laboract"), ("age", "deferenc"),
                ("deferenc", "laboract"), ("deferenc", "unionsen"),
                ("laboract", "unionsen"),
            ],
            latents=[],
            err_corr=[("yrsmill", "age")],
        ))

    def test_scaling_indicators(self):
        ind = self.demo.get_scaling_indicators()
        assert ind["eta1"] in ["y1", "y2", "y3", "y4"]
        assert ind["eta2"] in ["y5", "y6", "y7", "y8"]
        assert ind["xi1"] in ["x1", "x2", "x3"]
        assert self.union.get_scaling_indicators() == {}

    def test_iv_transformations_demo(self):
        scale = {"eta1": "y1", "eta2": "y5", "xi1": "x1"}
        with pytest.raises(ValueError):
            self.demo._iv_transformations("x1", "y1", scale)
        for y in ["y2", "y3", "y4"]:
            g, dep = self.demo._iv_transformations("eta1", y, scale)
            assert dep == y
            assert (".y1", y) in g.edges()
            assert ("eta1", y) not in g.edges()
        g, dep = self.demo._iv_transformations("xi1", "eta1", scale)
        assert dep == "y1"
        assert (".eta1", "y1") in g.edges()
        assert (".x1", "y1") in g.edges()
        assert ("xi1", "eta1") not in g.edges()

    def test_get_ivs_demo(self):
        scale = {"eta1": "y1", "eta2": "y5", "xi1": "x1"}
        assert self.demo.get_ivs("eta1", "y2", scaling_indicators=scale) == {
            "x1", "x2", "x3", "y3", "y7", "y8"}
        assert self.demo.get_ivs("eta1", "y3", scaling_indicators=scale) == {
            "x1", "x2", "x3", "y2", "y4", "y6", "y8"}
        assert self.demo.get_ivs("eta2", "y6", scaling_indicators=scale) == {
            "x1", "x2", "x3", "y3", "y4", "y7"}
        assert self.demo.get_ivs("xi1", "eta1", scaling_indicators=scale) == {
            "x2", "x3"}
        assert self.demo.get_ivs("eta1", "eta2", scaling_indicators=scale) == {
            "x2", "x3", "y2", "y3", "y4"}

    def test_get_ivs_union(self):
        assert self.union.get_ivs("yrsmill", "unionsen", scaling_indicators={}) == set()
        assert self.union.get_ivs("age", "laboract", scaling_indicators={}) == {"yrsmill"}
        assert self.union.get_ivs("age", "deferenc", scaling_indicators={}) == {"yrsmill"}

    def test_get_conditional_ivs_demo_empty(self):
        scale = {"eta1": "y1", "eta2": "y5", "xi1": "x1"}
        for x, y in [("eta1", "y2"), ("eta2", "y6"), ("xi1", "x2"),
                     ("xi1", "eta1"), ("eta1", "eta2")]:
            assert self.demo.get_conditional_ivs(x, y, scaling_indicators=scale) == []

    def test_get_conditional_ivs_union(self):
        assert self.union.get_conditional_ivs("yrsmill", "unionsen") == [
            ("age", {"laboract", "deferenc"})]
        assert self.union.get_conditional_ivs("deferenc", "unionsen") == [
            ("age", {"yrsmill", "laboract"})]
        assert self.union.get_conditional_ivs("laboract", "unionsen") == [
            ("age", {"yrsmill", "deferenc"})]
        assert self.union.get_conditional_ivs("deferenc", "laboract") == []
        assert self.union.get_conditional_ivs("age", "laboract") == [
            ("yrsmill", {"deferenc"})]
        assert self.union.get_conditional_ivs("age", "deferenc") == []

    def test_total_conditional_ivs_union(self):
        assert self.union.get_total_conditional_ivs("deferenc", "unionsen") == []

    def test_conditional_iv_dag_with_latent(self):
        # Van der Zander et al. example: I is an IV for X -> Y given W
        dag = DAG([("i", "x"), ("x", "y"), ("w", "i"), ("u", "w"), ("u", "y")],
                  latents=["u"])
        ci = CausalInference(dag)
        out = ci.get_conditional_ivs("x", "y")
        assert out == [("i", {"w"})]


class TestEstimateATE:
    def test_invalid_estimator_raises(self):
        dag = DAG([("z", "x"), ("z", "y"), ("x", "y")])
        with pytest.raises(ValueError, match="estimator_type"):
            CausalInference(dag).estimate_ate(
                "x", "y", pd.DataFrame({"x": [0.0], "y": [0.0], "z": [0.0]}),
                estimator_type="forest",
            )

    def test_invalid_strategy_raises(self):
        dag = DAG([("z", "x"), ("z", "y"), ("x", "y")])
        with pytest.raises(ValueError, match="estimand_strategy"):
            CausalInference(dag).estimate_ate(
                "x", "y", pd.DataFrame({"x": [0.0], "y": [0.0], "z": [0.0]}),
                estimand_strategy="bogus",
            )

    def test_path_tracing_mediated_effect(self):
        """Chain x -> m -> y: the path-traced ATE is the product of the
        per-edge effects (reference path-tracing semantics)."""
        rng = np.random.default_rng(1)
        n = 40000
        x = rng.normal(size=n)
        m = 1.5 * x + rng.normal(size=n) * 0.3
        y = 2.0 * m + rng.normal(size=n) * 0.3
        data = pd.DataFrame({"x": x, "m": m, "y": y})
        dag = DAG([("x", "m"), ("m", "y")])
        ate = CausalInference(dag).estimate_ate("x", "y", data)
        assert ate == pytest.approx(1.5 * 2.0, abs=0.05)

    def test_strategy_all_and_explicit_set(self):
        rng = np.random.default_rng(0)
        n = 20000
        z = rng.normal(size=n)
        x = 0.8 * z + rng.normal(size=n) * 0.5
        y = 2.0 * x + 1.5 * z + rng.normal(size=n) * 0.5
        data = pd.DataFrame({"x": x, "y": y, "z": z})
        dag = DAG([("z", "x"), ("z", "y"), ("x", "y")])
        ci = CausalInference(dag)
        assert ci.estimate_ate("x", "y", data, estimand_strategy="all") == \
            pytest.approx(2.0, abs=0.05)
        assert ci.estimate_ate(
            "x", "y", data, estimand_strategy=frozenset({"z"})
        ) == pytest.approx(2.0, abs=0.05)


class TestOptimalAdjustment:
    """variant='minimal_variance' implements the O-set of Henckel et al.
    (2019) — the reference stubs it with NotImplementedError."""

    def test_o_set_simple_precision_variable(self):
        # Z is a parent of Y only: minimal set is empty, but adjusting for
        # Z shrinks estimator variance -> O = {Z}
        dag = DAG([("x", "y"), ("z", "y")],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal_variance").identify(dag)
        assert success and set(out.get_role("adjustment")) == {"z"}
        # contrast: the minimal variant picks the empty set
        out_min, ok = Adjustment(variant="minimal").identify(dag)
        assert ok and out_min.get_role("adjustment") == []

    def test_o_set_mediator_parents(self):
        # X -> M -> Y with V -> M and W -> Y: O = pa(cn) \ forb = {V, W}
        dag = DAG([("x", "m"), ("m", "y"), ("v", "m"), ("w", "y")],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal_variance").identify(dag)
        assert success and set(out.get_role("adjustment")) == {"v", "w"}

    def test_o_set_is_valid_adjustment(self):
        dag = DAG([("z", "x"), ("z", "y"), ("x", "m"), ("m", "y"), ("w", "y")],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal_variance").identify(dag)
        assert success
        assert Adjustment().validate(out)

    def test_no_causal_path_fails(self):
        dag = DAG([("y", "x")], roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal_variance").identify(dag)
        assert not success

    def test_latent_in_o_set_fails(self):
        dag = DAG([("x", "y"), ("u", "y")], latents=["u"],
                  roles={"exposure": "x", "outcome": "y"})
        out, success = Adjustment(variant="minimal_variance").identify(dag)
        assert not success

    def test_o_set_reduces_estimator_variance(self):
        # empirical: OLS ATE of X on Y adjusting for the O-set has smaller
        # sampling variance than the (valid) empty minimal set
        rng = np.random.default_rng(0)
        ates_empty, ates_oset = [], []
        for _ in range(120):
            n = 400
            z = rng.normal(size=n)
            x = rng.normal(size=n)
            y = 1.5 * x + 2.0 * z + rng.normal(size=n)
            # ATE via OLS without / with the precision variable z
            Xe = np.column_stack([np.ones(n), x])
            ates_empty.append(np.linalg.lstsq(Xe, y, rcond=None)[0][1])
            Xo = np.column_stack([np.ones(n), x, z])
            ates_oset.append(np.linalg.lstsq(Xo, y, rcond=None)[0][1])
        assert np.var(ates_oset) < 0.5 * np.var(ates_empty)
