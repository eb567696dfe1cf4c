"""Deep DiscreteBayesianNetwork semantics tests.

Mirrors the coverage depth of the reference suite
(/root/reference/pgmpy/tests/test_models/test_DiscreteBayesianNetwork.py,
2036 LoC) with an independent oracle: the full joint table enumerated in
plain numpy from each CPD's documented 2-D layout (child rows, parent
configurations as columns with the LAST evidence variable cycling
fastest) — no pgmpy_tpu factor algebra involved.
"""

import itertools

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.models import DiscreteBayesianNetwork, NaiveBayes


# --------------------------------------------------------------------- #
# independent full-joint oracle
# --------------------------------------------------------------------- #
def _cpd_prob(cpd, assignment):
    """P(var=state | parents) straight off the 2-D values layout."""
    values = np.asarray(cpd.get_values(), dtype=np.float64)
    row = cpd.state_names[cpd.variable].index(assignment[cpd.variable])
    evidence = cpd.variables[1:]
    col = 0
    for ev in evidence:  # last evidence cycles fastest
        col = col * len(cpd.state_names[ev]) + cpd.state_names[ev].index(
            assignment[ev]
        )
    return values[row, col]


def _joint_oracle(model):
    """{assignment dict (as tuple of (var,state)) : probability}."""
    nodes = sorted(model.nodes(), key=str)
    states = {n: model.get_cpds(n).state_names[n] for n in nodes}
    joint = {}
    for combo in itertools.product(*(states[n] for n in nodes)):
        assignment = dict(zip(nodes, combo))
        p = 1.0
        for n in nodes:
            p *= _cpd_prob(model.get_cpds(n), assignment)
        joint[combo] = p
    return nodes, joint


def _oracle_marginal(model, var, evidence=None):
    nodes, joint = _joint_oracle(model)
    evidence = evidence or {}
    idx = nodes.index(var)
    states = model.get_cpds(var).state_names[var]
    num = np.zeros(len(states))
    for combo, p in joint.items():
        assignment = dict(zip(nodes, combo))
        if all(assignment[k] == v for k, v in evidence.items()):
            num[states.index(combo[idx])] += p
    return num / num.sum()


def _student_model():
    model = DiscreteBayesianNetwork(
        [("diff", "grade"), ("intel", "grade"), ("intel", "sat"),
         ("grade", "letter")]
    )
    cpd_d = TabularCPD("diff", 2, [[0.6], [0.4]],
                       state_names={"diff": ["easy", "hard"]})
    cpd_i = TabularCPD("intel", 2, [[0.7], [0.3]],
                       state_names={"intel": ["low", "high"]})
    cpd_g = TabularCPD(
        "grade", 3,
        [[0.3, 0.05, 0.9, 0.5],
         [0.4, 0.25, 0.08, 0.3],
         [0.3, 0.7, 0.02, 0.2]],
        evidence=["intel", "diff"], evidence_card=[2, 2],
        state_names={"grade": ["A", "B", "C"],
                     "intel": ["low", "high"], "diff": ["easy", "hard"]})
    cpd_s = TabularCPD(
        "sat", 2, [[0.95, 0.2], [0.05, 0.8]],
        evidence=["intel"], evidence_card=[2],
        state_names={"sat": ["bad", "good"], "intel": ["low", "high"]})
    cpd_l = TabularCPD(
        "letter", 2, [[0.1, 0.4, 0.99], [0.9, 0.6, 0.01]],
        evidence=["grade"], evidence_card=[3],
        state_names={"letter": ["weak", "strong"], "grade": ["A", "B", "C"]})
    model.add_cpds(cpd_d, cpd_i, cpd_g, cpd_s, cpd_l)
    return model


class TestJointSemantics:
    def test_joint_sums_to_one(self):
        model = _student_model()
        _, joint = _joint_oracle(model)
        assert abs(sum(joint.values()) - 1.0) < 1e-6

    def test_get_state_probability_full(self):
        model = _student_model()
        nodes, joint = _joint_oracle(model)
        for combo, p in itertools.islice(joint.items(), 0, None, 5):
            got = model.get_state_probability(dict(zip(nodes, combo)))
            assert got == pytest.approx(p, abs=1e-10)

    def test_get_state_probability_partial(self):
        model = _student_model()
        nodes, joint = _joint_oracle(model)
        want = sum(p for combo, p in joint.items()
                   if dict(zip(nodes, combo))["grade"] == "A"
                   and dict(zip(nodes, combo))["sat"] == "good")
        got = model.get_state_probability({"grade": "A", "sat": "good"})
        assert got == pytest.approx(want, abs=1e-7)

    def test_get_state_probability_unknown_state(self):
        model = _student_model()
        with pytest.raises(ValueError):
            model.get_state_probability({"grade": "Z"})

    def test_predict_probability_matches_oracle(self):
        model = _student_model()
        data = pd.DataFrame({
            "diff": ["easy", "hard", "easy"],
            "intel": ["high", "low", "low"],
            "letter": ["strong", "weak", "strong"],
            "sat": ["good", "bad", "bad"],
        })
        out = model.predict_probability(data)
        for i, row in data.iterrows():
            want = _oracle_marginal(model, "grade", row.to_dict())
            for j, st in enumerate(["A", "B", "C"]):
                assert out.loc[i, f"grade_{st}"] == pytest.approx(
                    want[j], abs=1e-5)

    def test_predict_map_matches_oracle(self):
        model = _student_model()
        data = pd.DataFrame({
            "diff": ["easy", "hard"],
            "intel": ["high", "low"],
            "sat": ["good", "bad"],
            "letter": ["strong", "weak"],
        })
        out = model.predict(data)
        states = ["A", "B", "C"]
        for i, row in data.iterrows():
            want = states[int(np.argmax(
                _oracle_marginal(model, "grade", row.to_dict())))]
            assert out.loc[i, "grade"] == want

    def test_predict_rejects_complete_data(self):
        model = _student_model()
        data = pd.DataFrame({n: [model.get_cpds(n).state_names[n][0]]
                             for n in model.nodes()})
        with pytest.raises(ValueError):
            model.predict(data)

    def test_predict_rejects_unknown_column(self):
        model = _student_model()
        with pytest.raises(ValueError):
            model.predict(pd.DataFrame({"nope": ["x"]}))

    def test_simulate_marginals_match_oracle(self):
        model = _student_model()
        df = model.simulate(n_samples=40_000, seed=0, show_progress=False)
        for var in ["grade", "sat", "letter"]:
            want = _oracle_marginal(model, var)
            states = model.get_cpds(var).state_names[var]
            got = df[var].value_counts(normalize=True)
            for j, st in enumerate(states):
                assert got.get(st, 0.0) == pytest.approx(want[j], abs=0.015)

    def test_simulate_with_evidence(self):
        model = _student_model()
        df = model.simulate(n_samples=30_000, evidence={"intel": "high"},
                            seed=1, show_progress=False)
        assert (df["intel"] == "high").all()
        want = _oracle_marginal(model, "sat", {"intel": "high"})
        got = df["sat"].value_counts(normalize=True)
        assert got.get("good", 0.0) == pytest.approx(want[1], abs=0.02)

    def test_simulate_with_do(self):
        model = _student_model()
        df = model.simulate(n_samples=30_000, do={"grade": "A"}, seed=2,
                            show_progress=False)
        assert (df["grade"] == "A").all()
        # under do(grade), intel keeps its prior (edge intel->grade cut)
        got = df["intel"].value_counts(normalize=True)
        assert got.get("high", 0.0) == pytest.approx(0.3, abs=0.02)
        # letter follows P(letter | grade=A)
        got = df["letter"].value_counts(normalize=True)
        assert got.get("strong", 0.0) == pytest.approx(0.9, abs=0.02)


class TestDoOperator:
    def test_do_replaces_cpd_with_marginal(self):
        model = _student_model()
        done = model.do(["grade"])
        assert done.get_parents("grade") == []
        cpd = done.get_cpds("grade")
        # reference semantics (DiscreteBayesianNetwork.py:1347): the CPD is
        # marginalized UNWEIGHTED over its former parents, i.e. the
        # normalized row-sum of the table, not the parent-prior mixture
        table = np.asarray(model.get_cpds("grade").get_values(),
                           dtype=np.float64)
        want = table.sum(axis=1) / table.sum()
        np.testing.assert_allclose(
            np.asarray(cpd.get_values(), dtype=np.float64).ravel(), want,
            atol=1e-6)

    def test_do_keeps_other_cpds(self):
        model = _student_model()
        done = model.do(["sat"])
        np.testing.assert_allclose(
            np.asarray(done.get_cpds("grade").get_values()),
            np.asarray(model.get_cpds("grade").get_values()))

    def test_do_check_model_valid(self):
        model = _student_model()
        assert model.do(["grade"]).check_model()


class TestCheckModel:
    def test_missing_cpd(self):
        model = DiscreteBayesianNetwork([("A", "B")])
        model.add_cpds(TabularCPD("A", 2, [[0.5], [0.5]]))
        with pytest.raises(ValueError):
            model.check_model()

    def test_cardinality_mismatch(self):
        model = DiscreteBayesianNetwork([("A", "B")])
        model.add_cpds(
            TabularCPD("A", 2, [[0.5], [0.5]]),
            TabularCPD("B", 2, [[0.2, 0.4, 0.9], [0.8, 0.6, 0.1]],
                       evidence=["A"], evidence_card=[3]))
        with pytest.raises(ValueError):
            model.check_model()

    def test_unnormalized_cpd(self):
        model = DiscreteBayesianNetwork()
        model.add_node("A")
        bad = TabularCPD("A", 2, [[0.5], [0.5]])
        bad.values = np.array([0.7, 0.5])  # poke an invalid table in
        bad._is_valid_cpd = None
        model.add_cpds(bad)
        model._bump_version()
        with pytest.raises(ValueError):
            model.check_model()

    def test_wrong_evidence_set(self):
        model = DiscreteBayesianNetwork([("A", "B"), ("C", "B")])
        model.add_cpds(
            TabularCPD("A", 2, [[0.5], [0.5]]),
            TabularCPD("C", 2, [[0.5], [0.5]]),
            TabularCPD("B", 2, [[0.2, 0.4], [0.8, 0.6]],
                       evidence=["A"], evidence_card=[2]))
        with pytest.raises(ValueError):
            model.check_model()


class TestGraphMutation:
    def test_remove_node_drops_cpds(self):
        model = _student_model()
        model.remove_node("sat")
        assert model.get_cpds("sat" if "sat" in [c.variable for c in model.cpds]
                              else "intel").variable == "intel"
        assert "sat" not in [c.variable for c in model.cpds]

    def test_remove_node_marginalizes_child_cpd(self):
        model = _student_model()
        table = np.asarray(model.get_cpds("grade").get_values(),
                           dtype=np.float64).reshape(3, 2, 2)
        model.remove_node("intel")
        # reference semantics: grade's CPD is marginalized over intel
        cpd = model.get_cpds("grade")
        assert cpd.variables == ["grade", "diff"]
        np.testing.assert_allclose(
            np.asarray(cpd.get_values(), dtype=np.float64),
            table.sum(axis=1) / table.sum(axis=1).sum(axis=0, keepdims=True),
            atol=1e-6)

    def test_add_edge_cycle_rejected(self):
        model = DiscreteBayesianNetwork([("A", "B"), ("B", "C")])
        with pytest.raises(ValueError):
            model.add_edge("C", "A")

    def test_copy_deep(self):
        model = _student_model()
        clone = model.copy()
        clone.get_cpds("diff").values = np.array([0.1, 0.9])
        assert float(np.asarray(model.get_cpds("diff").values)[0]) == pytest.approx(0.6, abs=1e-6)

    def test_mutation_bumps_version(self):
        model = _student_model()
        v0 = model._version
        model.remove_edge("grade", "letter")
        assert model._version != v0

    def test_get_cardinality(self):
        model = _student_model()
        assert model.get_cardinality("grade") == 3
        card = model.get_cardinality()
        assert card["grade"] == 3 and card["sat"] == 2

    def test_states_property(self):
        model = _student_model()
        assert model.states["grade"] == ["A", "B", "C"]

    def test_get_markov_blanket(self):
        model = _student_model()
        assert set(model.get_markov_blanket("intel")) == {
            "grade", "sat", "diff"}


class TestFit:
    def test_mle_matches_pandas_crosstab(self):
        rng = np.random.default_rng(0)
        data = pd.DataFrame({
            "A": rng.choice(["a0", "a1"], 500),
            "B": rng.choice(["b0", "b1", "b2"], 500),
        })
        model = DiscreteBayesianNetwork([("A", "B")])
        model.fit(data)
        # oracle: conditional frequencies
        tab = pd.crosstab(data["B"], data["A"], normalize="columns")
        got = np.asarray(model.get_cpds("B").get_values())
        for i, b in enumerate(["b0", "b1", "b2"]):
            for j, a in enumerate(["a0", "a1"]):
                assert got[i, j] == pytest.approx(tab.loc[b, a], abs=1e-6)

    def test_mle_unseen_parent_config_uniform(self):
        data = pd.DataFrame({"A": ["a0", "a0"], "B": ["b0", "b1"]})
        model = DiscreteBayesianNetwork([("A", "B")])
        model.fit(data, state_names={"A": ["a0", "a1"], "B": ["b0", "b1"]})
        got = np.asarray(model.get_cpds("B").get_values())
        np.testing.assert_allclose(got[:, 1], [0.5, 0.5])

    def test_fit_update(self):
        rng = np.random.default_rng(1)
        d1 = pd.DataFrame({"A": rng.choice(["a0", "a1"], 100, p=[0.9, 0.1])})
        d2 = pd.DataFrame({"A": rng.choice(["a0", "a1"], 100, p=[0.1, 0.9])})
        model = DiscreteBayesianNetwork()
        model.add_node("A")
        model.fit(d1)
        p_before = float(np.asarray(model.get_cpds("A").values)[0])
        model.fit_update(d2, n_prev_samples=100)
        p_after = float(np.asarray(model.get_cpds("A").values)[0])
        assert p_after < p_before
        assert 0.3 < p_after < 0.7  # roughly pooled

    def test_fit_bayesian_estimator(self):
        from pgmpy_tpu.estimators import BayesianEstimator

        data = pd.DataFrame({"A": ["a0"] * 10})
        model = DiscreteBayesianNetwork()
        model.add_node("A")
        model.fit(data, estimator=BayesianEstimator, prior_type="BDeu",
                  equivalent_sample_size=10,
                  state_names={"A": ["a0", "a1"]})
        vals = np.asarray(model.get_cpds("A").values)
        np.testing.assert_allclose(vals, [15 / 20, 5 / 20])


class TestPersistence:
    @pytest.mark.parametrize("ext", ["bif", "xmlbif", "net", "xdsl"])
    def test_save_load_roundtrip(self, tmp_path, ext):
        model = _student_model()
        path = str(tmp_path / f"student.{ext}")
        model.save(path)
        again = DiscreteBayesianNetwork.load(path)
        assert set(again.edges()) == set(model.edges())
        for node in model.nodes():
            np.testing.assert_allclose(
                np.asarray(again.get_cpds(node).to_factor()
                           .marginalize([], inplace=False).values),
                np.asarray(model.get_cpds(node).to_factor()
                           .marginalize([], inplace=False).values),
                atol=1e-6)

    def test_posterior_survives_roundtrip(self, tmp_path):
        from pgmpy_tpu.inference.ve import VariableElimination

        model = _student_model()
        path = str(tmp_path / "m.bif")
        model.save(path)
        again = DiscreteBayesianNetwork.load(path)
        want = _oracle_marginal(model, "grade", {"sat": "good"})
        phi = VariableElimination(again).query(
            ["grade"], evidence={"sat": "good"}, show_progress=False)
        np.testing.assert_allclose(
            np.asarray(phi.values, dtype=np.float64), want, atol=1e-6)


class TestRandomAndUtility:
    def test_get_random_valid(self):
        model = DiscreteBayesianNetwork.get_random(n_nodes=6, edge_prob=0.5,
                                                   seed=0)
        assert model.check_model()

    def test_get_random_n_states(self):
        model = DiscreteBayesianNetwork.get_random(
            n_nodes=4, edge_prob=0.5, n_states=4, seed=1)
        assert all(c == 4 for c in model.get_cardinality().values())

    def test_get_random_cpds_inplace(self):
        model = DiscreteBayesianNetwork([("A", "B")])
        model.get_random_cpds(n_states=2, inplace=True, seed=2)
        assert model.check_model()

    def test_get_factorized_product(self):
        model = DiscreteBayesianNetwork([("A", "B")])
        s = model.get_factorized_product()
        assert "P(A)" in s and "P(B | A)" in s

    def test_is_imap(self):
        from pgmpy_tpu.factors import JointProbabilityDistribution

        model = DiscreteBayesianNetwork([("diff", "grade"), ("intel", "grade")])
        model.add_cpds(
            TabularCPD("diff", 2, [[0.6], [0.4]]),
            TabularCPD("intel", 2, [[0.7], [0.3]]),
            TabularCPD("grade", 3,
                       [[0.3, 0.05, 0.9, 0.5],
                        [0.4, 0.25, 0.08, 0.3],
                        [0.3, 0.7, 0.02, 0.2]],
                       evidence=["diff", "intel"], evidence_card=[2, 2]))
        vals = []
        for d in range(2):
            for i in range(2):
                for g in range(3):
                    vals.append(0.6 ** (1 - d) * 0.4 ** d
                                * 0.7 ** (1 - i) * 0.3 ** i
                                * np.asarray(model.get_cpds("grade")
                                             .get_values())[g, d * 2 + i])
        jpd = JointProbabilityDistribution(
            ["diff", "intel", "grade"], [2, 2, 3],
            np.array(vals).reshape(2, 2, 3).transpose(0, 1, 2).ravel())
        assert model.is_imap(jpd)


class TestNaiveBayes:
    def test_structure_enforced(self):
        nb = NaiveBayes()
        nb.add_edges_from([("C", "X1"), ("C", "X2")])
        with pytest.raises(ValueError):
            nb.add_edge("X1", "X2")

    def test_fit_and_predict(self):
        rng = np.random.default_rng(3)
        n = 400
        c = rng.choice(["y", "n"], n, p=[0.5, 0.5])
        x = np.where(c == "y",
                     rng.choice(["t", "f"], n, p=[0.9, 0.1]),
                     rng.choice(["t", "f"], n, p=[0.1, 0.9]))
        data = pd.DataFrame({"C": c, "X": x})
        nb = NaiveBayes()
        nb.fit(data, parent_node="C")
        pred = nb.predict(pd.DataFrame({"X": ["t", "f"]}))
        assert pred.loc[0, "C"] == "y" and pred.loc[1, "C"] == "n"


class TestNaiveBayesTrails:
    """r4 code-review regressions: the closed-form active_trail_nodes
    override must not break is_dconnected, and a bare-string observed
    must not be character-split."""

    def _model(self):
        from pgmpy_tpu.models import NaiveBayes

        m = NaiveBayes()
        m.add_edges_from([("cls", "temp"), ("cls", "hum"), ("cls", "wind")])
        return m

    def test_is_dconnected_positional(self):
        m = self._model()
        assert m.is_dconnected("temp", "hum")
        assert not m.is_dconnected("temp", "hum", observed=["cls"])

    def test_string_observed_not_char_split(self):
        m = self._model()
        trails = m.active_trail_nodes("hum", observed="temp")
        assert trails == {"cls", "hum", "wind"}
        blocked = m.active_trail_nodes("hum", observed="cls")
        assert blocked == {"hum"}
