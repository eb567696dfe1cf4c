import numpy as np
import pytest

from pgmpy_tpu.factors import DiscreteFactor, TabularCPD, JointProbabilityDistribution
from pgmpy_tpu.models import (
    ClusterGraph,
    DiscreteBayesianNetwork,
    DiscreteMarkovNetwork,
    FactorGraph,
    JunctionTree,
    MarkovChain,
    NaiveBayes,
)


def student_bn():
    model = DiscreteBayesianNetwork(
        [("diff", "grade"), ("intel", "grade"), ("grade", "letter"), ("intel", "SAT")]
    )
    cpd_d = TabularCPD("diff", 2, [[0.6], [0.4]])
    cpd_i = TabularCPD("intel", 2, [[0.7], [0.3]])
    cpd_g = TabularCPD(
        "grade", 3,
        [[0.3, 0.05, 0.9, 0.5], [0.4, 0.25, 0.08, 0.3], [0.3, 0.7, 0.02, 0.2]],
        evidence=["intel", "diff"], evidence_card=[2, 2],
    )
    cpd_l = TabularCPD(
        "letter", 2, [[0.1, 0.4, 0.99], [0.9, 0.6, 0.01]],
        evidence=["grade"], evidence_card=[3],
    )
    cpd_s = TabularCPD(
        "SAT", 2, [[0.95, 0.2], [0.05, 0.8]],
        evidence=["intel"], evidence_card=[2],
    )
    model.add_cpds(cpd_d, cpd_i, cpd_g, cpd_l, cpd_s)
    return model


class TestDiscreteBayesianNetwork:
    def test_check_model(self):
        assert student_bn().check_model()

    def test_check_model_missing_cpd(self):
        model = DiscreteBayesianNetwork([("a", "b")])
        model.add_cpds(TabularCPD.get_random("a"))
        with pytest.raises(ValueError):
            model.check_model()

    def test_check_model_wrong_parents(self):
        model = DiscreteBayesianNetwork([("a", "b")])
        model.add_cpds(TabularCPD.get_random("a"), TabularCPD.get_random("b"))
        with pytest.raises(ValueError):
            model.check_model()

    def test_cardinality_and_states(self):
        model = student_bn()
        assert model.get_cardinality("grade") == 3
        assert model.states["grade"] == [0, 1, 2]

    def test_add_cpd_replaces(self):
        model = student_bn()
        new_d = TabularCPD("diff", 2, [[0.5], [0.5]])
        model.add_cpds(new_d)
        assert len([c for c in model.get_cpds() if c.variable == "diff"]) == 1
        np.testing.assert_allclose(model.get_cpds("diff").get_values(), [[0.5], [0.5]])

    def test_remove_node_marginalizes_children(self):
        model = student_bn()
        model.remove_node("diff")
        g = model.get_cpds("grade")
        assert g.variables == ["grade", "intel"]
        np.testing.assert_allclose(g.get_values().sum(axis=0), 1.0, rtol=1e-5)

    def test_to_markov_model(self):
        mm = student_bn().to_markov_model()
        assert isinstance(mm, DiscreteMarkovNetwork)
        assert mm.has_edge("diff", "intel")  # moral edge
        assert len(mm.factors) == 5

    def test_to_junction_tree_covers_all(self):
        jt = student_bn().to_junction_tree()
        covered = set()
        for clique in jt.nodes():
            covered |= set(clique)
        assert covered == {"diff", "intel", "grade", "letter", "SAT"}
        jt.check_model()

    def test_do_operator(self):
        model = student_bn()
        intervened = model.do(["grade"])
        assert intervened.get_parents("grade") == []
        cpd = intervened.get_cpds("grade")
        np.testing.assert_allclose(cpd.get_values().sum(), 1.0, rtol=1e-5)

    def test_get_state_probability_full(self):
        model = student_bn()
        p = model.get_state_probability(
            {"diff": 0, "intel": 1, "grade": 0, "letter": 0, "SAT": 1}
        )
        expected = 0.6 * 0.3 * 0.9 * 0.1 * 0.8
        assert p == pytest.approx(expected, rel=1e-5)

    def test_get_random_valid(self):
        model = DiscreteBayesianNetwork.get_random(n_nodes=6, edge_prob=0.4, seed=0)
        assert model.check_model()

    def test_is_imap(self):
        model = DiscreteBayesianNetwork([("diff", "grade"), ("intel", "grade")])
        model.add_cpds(
            TabularCPD("diff", 2, [[0.2], [0.8]]),
            TabularCPD("intel", 3, [[0.5], [0.3], [0.2]]),
            TabularCPD(
                "grade", 3,
                [[0.1] * 6, [0.1] * 6, [0.8] * 6],
                evidence=["diff", "intel"], evidence_card=[2, 3],
            ),
        )
        joint = (
            model.get_cpds("diff").to_factor()
            * model.get_cpds("intel").to_factor()
            * model.get_cpds("grade").to_factor()
        )
        jpd = JointProbabilityDistribution(
            joint.variables, joint.cardinality, np.asarray(joint.values)
        )
        assert model.is_imap(jpd)

    def test_markov_blanket(self):
        model = student_bn()
        assert set(model.get_markov_blanket("intel")) == {"grade", "SAT", "diff"}


class TestMarkovNetwork:
    def make_grid(self):
        mn = DiscreteMarkovNetwork(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        )
        rng = np.random.default_rng(0)
        for edge in mn.edges():
            mn.add_factors(DiscreteFactor(list(edge), [2, 2], rng.random(4)))
        return mn

    def test_check_model(self):
        assert self.make_grid().check_model()

    def test_triangulate_is_chordal(self):
        tri = self.make_grid().triangulate()
        assert tri.is_triangulated()

    def test_junction_tree_structure(self):
        jt = self.make_grid().to_junction_tree()
        assert isinstance(jt, JunctionTree)
        jt.check_model()
        # running intersection: JT on 4-cycle has 2 cliques of size 3
        assert all(len(c) == 3 for c in jt.nodes())

    def test_jt_preserves_joint(self):
        """Product of JT clique potentials == product of original factors."""
        mn = self.make_grid()
        from pgmpy_tpu.factors import factor_product

        original = factor_product(*mn.factors)
        jt = mn.to_junction_tree()
        jt_prod = factor_product(*jt.factors)
        assert original == jt_prod

    def test_partition_function(self):
        mn = self.make_grid()
        from pgmpy_tpu.factors import factor_product

        z = float(np.sum(np.asarray(factor_product(*mn.factors).values)))
        assert mn.get_partition_function() == pytest.approx(z, rel=1e-5)

    def test_markov_blanket_and_local_independencies(self):
        mn = self.make_grid()
        assert set(mn.markov_blanket("a")) == {"b", "d"}
        ind = mn.get_local_independencies()
        assert len(ind.get_assertions()) > 0

    def test_factor_var_not_in_model(self):
        mn = DiscreteMarkovNetwork([("a", "b")])
        with pytest.raises(ValueError):
            mn.add_factors(DiscreteFactor(["x"], [2], [1, 1]))

    def test_to_bayesian_model_is_dag(self):
        import networkx as nx

        bm = self.make_grid().to_bayesian_model()
        assert nx.is_directed_acyclic_graph(bm)
        assert set(bm.nodes()) == {"a", "b", "c", "d"}


class TestFactorGraph:
    def make_fg(self):
        fg = FactorGraph()
        fg.add_nodes_from(["a", "b", "c"])
        phi1 = DiscreteFactor(["a", "b"], [2, 2], np.random.default_rng(0).random(4))
        phi2 = DiscreteFactor(["b", "c"], [2, 2], np.random.default_rng(1).random(4))
        fg.add_factors(phi1, phi2)
        fg.add_edges_from([("a", phi1), ("b", phi1), ("b", phi2), ("c", phi2)])
        return fg

    def test_check_model(self):
        assert self.make_fg().check_model()

    def test_variable_and_factor_nodes(self):
        fg = self.make_fg()
        assert set(fg.get_variable_nodes()) == {"a", "b", "c"}
        assert len(fg.get_factor_nodes()) == 2

    def test_to_markov_model(self):
        mm = self.make_fg().to_markov_model()
        assert set(mm.nodes()) == {"a", "b", "c"}
        assert len(mm.factors) == 2

    def test_point_mass_message(self):
        fg = self.make_fg()
        np.testing.assert_allclose(fg.get_point_mass_message("a", 1), [0, 1])
        np.testing.assert_allclose(fg.get_uniform_message("a"), [0.5, 0.5])


class TestClusterGraphJT:
    def test_cluster_graph(self):
        cg = ClusterGraph()
        cg.add_nodes_from([("a", "b"), ("b", "c")])
        cg.add_edge(("a", "b"), ("b", "c"))
        phi1 = DiscreteFactor(["a", "b"], [2, 2], [1, 2, 3, 4])
        phi2 = DiscreteFactor(["b", "c"], [2, 2], [1, 1, 2, 2])
        cg.add_factors(phi1, phi2)
        assert cg.check_model()
        assert cg.get_factors(("a", "b")) == phi1

    def test_jt_rejects_cycle(self):
        jt = JunctionTree()
        jt.add_nodes_from([("a", "b"), ("b", "c"), ("c", "a")])
        jt.add_edge(("a", "b"), ("b", "c"))
        jt.add_edge(("b", "c"), ("c", "a"))
        with pytest.raises(ValueError):
            jt.add_edge(("c", "a"), ("a", "b"))


class TestMarkovChain:
    def test_sample_shape_and_stationary(self):
        mc = MarkovChain(["x"], [2])
        mc.add_transition_model("x", np.array([[0.9, 0.1], [0.2, 0.8]]))
        mc.set_start_state([("x", 0)])
        df = mc.sample(size=2000, seed=0)
        assert df.shape == (2000, 1)
        # stationary distribution of this kernel is (2/3, 1/3)
        assert df["x"].mean() == pytest.approx(1 / 3, abs=0.06)

    def test_invalid_transition(self):
        mc = MarkovChain(["x"], [2])
        with pytest.raises(ValueError):
            mc.add_transition_model("x", np.array([[0.9, 0.3], [0.2, 0.8]]))

    def test_copy(self):
        mc = MarkovChain(["x"], [2])
        mc.add_transition_model("x", np.array([[0.5, 0.5], [0.5, 0.5]]))
        cp = mc.copy()
        assert cp.transition_models == mc.transition_models


class TestNaiveBayes:
    def test_star_topology(self):
        nb = NaiveBayes(feature_vars=["f1", "f2"], dependent_var="y")
        assert set(nb.edges()) == {("y", "f1"), ("y", "f2")}
        with pytest.raises(ValueError):
            nb.add_edge("f1", "f2")

    def test_local_independencies(self):
        nb = NaiveBayes(feature_vars=["f1", "f2"], dependent_var="y")
        ind = nb.local_independencies("f1")
        assert len(ind.get_assertions()) == 1
