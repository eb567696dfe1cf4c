import numpy as np
import pytest

from pgmpy_tpu.factors import DiscreteFactor, TabularCPD, factor_product
from pgmpy_tpu.inference import VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.utils.utils import get_example_model


# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu

def student_bn():
    model = DiscreteBayesianNetwork(
        [("diff", "grade"), ("intel", "grade"), ("grade", "letter"), ("intel", "SAT")]
    )
    model.add_cpds(
        TabularCPD("diff", 2, [[0.6], [0.4]]),
        TabularCPD("intel", 2, [[0.7], [0.3]]),
        TabularCPD(
            "grade", 3,
            [[0.3, 0.05, 0.9, 0.5], [0.4, 0.25, 0.08, 0.3], [0.3, 0.7, 0.02, 0.2]],
            evidence=["intel", "diff"], evidence_card=[2, 2],
        ),
        TabularCPD(
            "letter", 2, [[0.1, 0.4, 0.99], [0.9, 0.6, 0.01]],
            evidence=["grade"], evidence_card=[3],
        ),
        TabularCPD(
            "SAT", 2, [[0.95, 0.2], [0.05, 0.8]],
            evidence=["intel"], evidence_card=[2],
        ),
    )
    return model


def brute_posterior(model, variables, evidence=None):
    """Oracle: full joint from CPD product, conditioned and marginalized."""
    joint = factor_product(*[cpd.to_factor() for cpd in model.get_cpds()])
    if evidence:
        joint = joint.reduce(list(evidence.items()), inplace=False, show_warnings=False)
    joint = joint.marginalize(
        [v for v in joint.variables if v not in variables], inplace=False
    )
    # align axis order to requested order
    out = joint.normalize(inplace=False)
    return out


class TestVEStudent:
    def setup_method(self):
        self.model = student_bn()
        self.infer = VariableElimination(self.model)

    def test_prior_marginal(self):
        res = self.infer.query(["grade"], show_progress=False)
        expected = brute_posterior(self.model, ["grade"])
        assert res == expected

    def test_posterior_with_evidence(self):
        res = self.infer.query(["intel"], evidence={"grade": 0}, show_progress=False)
        expected = brute_posterior(self.model, ["intel"], {"grade": 0})
        assert res == expected

    def test_multi_var_joint(self):
        res = self.infer.query(["intel", "diff"], evidence={"letter": 1}, show_progress=False)
        expected = brute_posterior(self.model, ["intel", "diff"], {"letter": 1})
        assert res == expected

    def test_joint_false(self):
        res = self.infer.query(
            ["intel", "diff"], evidence={"grade": 1}, joint=False, show_progress=False
        )
        for var in ["intel", "diff"]:
            expected = brute_posterior(self.model, [var], {"grade": 1})
            assert res[var] == expected

    def test_classic_path_matches_fused(self):
        for order in ["minfill", "minweight", "minneighbors", "weightedminfill"]:
            res = self.infer.query(
                ["letter"], evidence={"intel": 1}, elimination_order=order, show_progress=False
            )
            expected = brute_posterior(self.model, ["letter"], {"intel": 1})
            assert res == expected, order

    def test_explicit_elimination_order(self):
        res = self.infer.query(
            ["grade"],
            evidence={"SAT": 1},
            elimination_order=["letter", "diff", "intel"],
            show_progress=False,
        )
        expected = brute_posterior(self.model, ["grade"], {"SAT": 1})
        assert res == expected

    def test_map_query(self):
        res = self.infer.map_query(["intel"], evidence={"SAT": 1}, show_progress=False)
        expected = brute_posterior(self.model, ["intel"], {"SAT": 1})
        best = int(np.argmax(np.asarray(expected.values)))
        assert res == {"intel": best}

    def test_map_query_multi(self):
        res = self.infer.map_query(
            ["intel", "diff"], evidence={"grade": 2}, show_progress=False
        )
        expected = brute_posterior(self.model, ["intel", "diff"], {"grade": 2})
        flat = int(np.argmax(np.asarray(expected.values)))
        idx = np.unravel_index(flat, np.asarray(expected.values).shape)
        best = {var: int(i) for var, i in zip(expected.variables, idx)}
        assert res == best

    def test_overlap_error(self):
        with pytest.raises(ValueError):
            self.infer.query(["grade"], evidence={"grade": 0})

    def test_virtual_evidence(self):
        # virtual evidence with likelihood [0.9, 0.1] on intel
        virt = TabularCPD("intel", 2, [[0.9], [0.1]])
        res = self.infer.query(["grade"], virtual_evidence=[virt], show_progress=False)
        # oracle: multiply joint by likelihood on intel
        joint = factor_product(*[cpd.to_factor() for cpd in self.model.get_cpds()])
        lik = DiscreteFactor(["intel"], [2], [0.9, 0.1])
        joint = joint * lik
        expected = joint.marginalize(
            [v for v in joint.variables if v != "grade"], inplace=False
        ).normalize(inplace=False)
        assert res == expected

    def test_state_names_preserved(self):
        model = DiscreteBayesianNetwork([("rain", "grass")])
        model.add_cpds(
            TabularCPD("rain", 2, [[0.8], [0.2]], state_names={"rain": ["no", "yes"]}),
            TabularCPD(
                "grass", 2, [[0.9, 0.1], [0.1, 0.9]],
                evidence=["rain"], evidence_card=[2],
                state_names={"grass": ["dry", "wet"], "rain": ["no", "yes"]},
            ),
        )
        infer = VariableElimination(model)
        res = infer.query(["rain"], evidence={"grass": "wet"}, show_progress=False)
        assert res.state_names["rain"] == ["no", "yes"]
        # P(rain=yes | grass=wet) = .2*.9 / (.2*.9 + .8*.1) = 0.6923
        assert float(np.asarray(res.values)[1]) == pytest.approx(0.69230769, rel=1e-4)

    def test_max_marginal(self):
        # reference semantics (ExactInference.py:459-527): PRUNE to the
        # ancestral graph of the query first (here {diff, intel, grade} —
        # letter/SAT are barren and must NOT be max-reduced), then
        # max-eliminate.  Golden from reference pgmpy v1.0.0.
        val = self.infer.max_marginal(["grade"], show_progress=False)
        assert val == pytest.approx(0.3726235741444867, rel=1e-5)
        val = self.infer.max_marginal(
            ["grade"], evidence={"diff": 0}, show_progress=False
        )
        assert val == pytest.approx(0.3684210526315789, rel=1e-5)

    def test_induced_width(self):
        width = self.infer.induced_width(["diff", "intel", "grade", "letter", "SAT"])
        assert width >= 1


class TestVEAlarm:
    def test_alarm_query_consistency(self):
        model = get_example_model("alarm")
        infer = VariableElimination(model)
        fused = infer.query(
            ["HISTORY"], evidence={"CVP": "LOW", "HR": "HIGH"}, show_progress=False
        )
        staged = infer.query(
            ["HISTORY"],
            evidence={"CVP": "LOW", "HR": "HIGH"},
            elimination_order="minfill",
            show_progress=False,
        )
        assert fused == staged
        assert float(np.sum(np.asarray(fused.values))) == pytest.approx(1.0, rel=1e-5)

    def test_alarm_known_marginal(self):
        model = get_example_model("alarm")
        infer = VariableElimination(model)
        res = infer.query(["HYPOVOLEMIA"], show_progress=False)
        # prior of HYPOVOLEMIA is its root CPD
        np.testing.assert_allclose(np.asarray(res.values), [0.2, 0.8], atol=1e-5)

    def test_alarm_pruning_irrelevant_evidence(self):
        model = get_example_model("alarm")
        infer = VariableElimination(model)
        res1 = infer.query(["HYPOVOLEMIA"], evidence={"MINVOLSET": "LOW"}, show_progress=False)
        # MINVOLSET is d-separated from HYPOVOLEMIA: posterior == prior
        np.testing.assert_allclose(np.asarray(res1.values), [0.2, 0.8], atol=1e-5)
