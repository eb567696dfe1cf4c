import numpy as np
import pytest

from pgmpy_tpu.factors import (
    DiscreteFactor,
    TabularCPD,
    factor_divide,
    factor_product,
    factor_sum_product,
)


# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu

def phi_xyz():
    return DiscreteFactor(["x1", "x2", "x3"], [2, 2, 2], np.arange(8))


class TestDiscreteFactorInit:
    def test_shape_and_order(self):
        phi = phi_xyz()
        assert phi.variables == ["x1", "x2", "x3"]
        assert phi.values.shape == (2, 2, 2)
        # right-most variable cycles fastest (C order)
        assert float(np.asarray(phi.values)[0, 0, 1]) == 1.0
        assert float(np.asarray(phi.values)[1, 0, 0]) == 4.0

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            DiscreteFactor(["x1", "x2"], [2, 2], np.arange(6))

    def test_string_variables_rejected(self):
        with pytest.raises(TypeError):
            DiscreteFactor("x1", [2], np.arange(2))

    def test_duplicate_variables(self):
        with pytest.raises(ValueError):
            DiscreteFactor(["x1", "x1"], [2, 2], np.arange(4))

    def test_state_names(self):
        phi = DiscreteFactor(
            ["speed"], [3], [0.2, 0.3, 0.5], state_names={"speed": ["low", "med", "high"]}
        )
        assert phi.get_state_no("speed", "high") == 2
        assert phi.get_state_names("speed", 0) == "low"
        assert phi.get_value(speed="med") == pytest.approx(0.3)


class TestReductions:
    def test_marginalize(self):
        phi = phi_xyz()
        phi.marginalize(["x1"])
        assert phi.variables == ["x2", "x3"]
        np.testing.assert_allclose(np.asarray(phi.values), [[4, 6], [8, 10]])

    def test_marginalize_two(self):
        phi = phi_xyz().marginalize(["x1", "x3"], inplace=False)
        np.testing.assert_allclose(np.asarray(phi.values), [1 + 4 + 5, 2 + 3 + 6 + 7])

    def test_maximize(self):
        phi = phi_xyz()
        out = phi.maximize(["x3"], inplace=False)
        np.testing.assert_allclose(np.asarray(out.values), [[1, 3], [5, 7]])

    def test_normalize(self):
        phi = phi_xyz().normalize(inplace=False)
        assert float(np.sum(np.asarray(phi.values))) == pytest.approx(1.0)

    def test_reduce_by_index(self):
        phi = phi_xyz()
        phi.reduce([("x1", 1)], show_warnings=False)
        assert phi.variables == ["x2", "x3"]
        np.testing.assert_allclose(np.asarray(phi.values), [[4, 5], [6, 7]])

    def test_reduce_by_name(self):
        phi = DiscreteFactor(
            ["a", "b"], [2, 2], np.arange(4), state_names={"a": ["no", "yes"], "b": ["no", "yes"]}
        )
        out = phi.reduce([("b", "yes")], inplace=False)
        np.testing.assert_allclose(np.asarray(out.values), [1, 3])

    def test_reduce_unknown_var(self):
        with pytest.raises(ValueError):
            phi_xyz().reduce([("x9", 0)])


class TestBinaryOps:
    def test_product_disjoint(self):
        phi1 = DiscreteFactor(["a"], [2], [1.0, 2.0])
        phi2 = DiscreteFactor(["b"], [3], [1.0, 2.0, 3.0])
        out = phi1 * phi2
        assert out.variables == ["a", "b"]
        np.testing.assert_allclose(np.asarray(out.values), [[1, 2, 3], [2, 4, 6]])

    def test_product_shared(self):
        phi1 = DiscreteFactor(["x1", "x2"], [2, 2], [1, 2, 3, 4])
        phi2 = DiscreteFactor(["x2", "x3"], [2, 2], [1, 10, 100, 1000])
        out = phi1.product(phi2, inplace=False)
        assert out.variables == ["x1", "x2", "x3"]
        expected = np.array(
            [[[1 * 1, 1 * 10], [2 * 100, 2 * 1000]], [[3 * 1, 3 * 10], [4 * 100, 4 * 1000]]]
        )
        np.testing.assert_allclose(np.asarray(out.values), expected)

    def test_product_cardinality_mismatch(self):
        phi1 = DiscreteFactor(["x1"], [2], [1, 2])
        phi2 = DiscreteFactor(["x1"], [3], [1, 2, 3])
        with pytest.raises(ValueError):
            phi1 * phi2

    def test_scalar_product(self):
        out = phi_xyz() * 2
        np.testing.assert_allclose(np.asarray(out.values).ravel(), 2 * np.arange(8))

    def test_sum(self):
        phi1 = DiscreteFactor(["a"], [2], [1.0, 2.0])
        phi2 = DiscreteFactor(["a"], [2], [10.0, 20.0])
        np.testing.assert_allclose(np.asarray((phi1 + phi2).values), [11, 22])

    def test_divide(self):
        phi1 = DiscreteFactor(["a", "b"], [2, 2], [2, 4, 6, 8])
        phi2 = DiscreteFactor(["a"], [2], [2, 4])
        out = factor_divide(phi1, phi2)
        np.testing.assert_allclose(np.asarray(out.values), [[1, 2], [1.5, 2]])

    def test_divide_zero_by_zero(self):
        phi1 = DiscreteFactor(["a"], [2], [0.0, 4.0])
        phi2 = DiscreteFactor(["a"], [2], [0.0, 2.0])
        out = phi1 / phi2
        np.testing.assert_allclose(np.asarray(out.values), [0.0, 2.0])

    def test_divide_superset_scope_raises(self):
        phi1 = DiscreteFactor(["a"], [2], [1, 2])
        phi2 = DiscreteFactor(["a", "b"], [2, 2], [1, 2, 3, 4])
        with pytest.raises(ValueError):
            phi1 / phi2


class TestSumProduct:
    def test_matches_pairwise(self):
        rng = np.random.default_rng(0)
        phi1 = DiscreteFactor(["a", "b"], [2, 3], rng.random(6))
        phi2 = DiscreteFactor(["b", "c"], [3, 2], rng.random(6))
        phi3 = DiscreteFactor(["c", "d"], [2, 2], rng.random(4))
        fused = factor_sum_product(["a", "d"], [phi1, phi2, phi3])
        stepwise = factor_product(phi1, phi2, phi3).marginalize(["b", "c"], inplace=False)
        assert fused == stepwise

    def test_output_order(self):
        phi1 = DiscreteFactor(["a", "b"], [2, 2], np.arange(4))
        out = factor_sum_product(["b", "a"], [phi1])
        assert out.variables == ["b", "a"]
        np.testing.assert_allclose(np.asarray(out.values), [[0, 2], [1, 3]])


class TestEquality:
    def test_eq_permuted(self):
        phi1 = DiscreteFactor(["a", "b"], [2, 3], np.arange(6))
        phi2 = DiscreteFactor(["b", "a"], [3, 2], np.asarray(phi1.values).transpose(1, 0))
        assert phi1 == phi2

    def test_neq_values(self):
        phi1 = DiscreteFactor(["a"], [2], [1, 2])
        phi2 = DiscreteFactor(["a"], [2], [1, 3])
        assert phi1 != phi2

    def test_identity_factor(self):
        ident = phi_xyz().identity_factor()
        np.testing.assert_allclose(np.asarray(ident.values), 1.0)


class TestMisc:
    def test_assignment(self):
        phi = phi_xyz()
        [assign] = phi.assignment([5])
        assert [(s.var, s.state) for s in assign] == [("x1", 1), ("x2", 0), ("x3", 1)]

    def test_copy_independent(self):
        phi = phi_xyz()
        cp = phi.copy()
        cp.marginalize(["x1"])
        assert phi.variables == ["x1", "x2", "x3"]

    def test_str_runs(self):
        assert "phi" in str(phi_xyz())

    def test_sample(self):
        phi = DiscreteFactor(["a"], [2], [0.0, 1.0])
        df = phi.sample(10, seed=0)
        assert (df["a"] == 1).all()


class TestTabularCPD:
    def test_basic(self):
        cpd = TabularCPD(
            "grade", 3, [[0.1, 0.1], [0.1, 0.1], [0.8, 0.8]],
            evidence=["intel"], evidence_card=[2],
        )
        assert cpd.variables == ["grade", "intel"]
        np.testing.assert_allclose(cpd.get_values(), [[0.1, 0.1], [0.1, 0.1], [0.8, 0.8]])

    def test_normalize_columns(self):
        cpd = TabularCPD(
            "g", 2, [[0.7, 0.2, 0.6, 0.2], [0.4, 0.4, 0.4, 0.8]],
            evidence=["i", "d"], evidence_card=[2, 2],
        )
        cpd.normalize()
        np.testing.assert_allclose(
            cpd.get_values(),
            [[0.63636364, 0.33333333, 0.6, 0.2], [0.36363636, 0.66666667, 0.4, 0.8]],
            rtol=1e-5,
        )

    def test_marginalize_keeps_conditional(self):
        cpd = TabularCPD(
            "g", 2, [[0.7, 0.6, 0.6, 0.2], [0.3, 0.4, 0.4, 0.8]],
            evidence=["i", "d"], evidence_card=[2, 2],
        )
        cpd.marginalize(["d"])
        np.testing.assert_allclose(cpd.get_values(), [[0.65, 0.4], [0.35, 0.6]], rtol=1e-5)

    def test_reduce(self):
        cpd = TabularCPD(
            "g", 2, [[0.7, 0.6, 0.6, 0.2], [0.3, 0.4, 0.4, 0.8]],
            evidence=["i", "d"], evidence_card=[2, 2],
        )
        cpd.reduce([("d", 0)], show_warnings=False)
        np.testing.assert_allclose(cpd.get_values(), [[0.7, 0.6], [0.3, 0.4]], rtol=1e-5)

    def test_reduce_on_variable_raises(self):
        cpd = TabularCPD.get_random("a", evidence=["b"])
        with pytest.raises(ValueError):
            cpd.reduce([("a", 0)])

    def test_to_factor(self):
        cpd = TabularCPD.get_random("a", evidence=["b"], seed=1)
        phi = cpd.to_factor()
        assert isinstance(phi, DiscreteFactor)
        assert phi.variables == ["a", "b"]

    def test_reorder_parents(self):
        cpd = TabularCPD(
            "g", 3,
            [[0.1, 0.1, 0.0, 0.4, 0.2, 0.1],
             [0.3, 0.2, 0.1, 0.4, 0.3, 0.2],
             [0.6, 0.7, 0.9, 0.2, 0.5, 0.7]],
            evidence=["diff", "intel"], evidence_card=[2, 3],
        )
        vals = cpd.reorder_parents(["intel", "diff"])
        assert cpd.variables == ["g", "intel", "diff"]
        np.testing.assert_allclose(
            vals,
            [[0.1, 0.4, 0.1, 0.2, 0.0, 0.1],
             [0.3, 0.4, 0.2, 0.3, 0.1, 0.2],
             [0.6, 0.2, 0.7, 0.5, 0.9, 0.7]],
            rtol=1e-5,
        )

    def test_get_random_columns_normalized(self):
        cpd = TabularCPD.get_random("a", evidence=["b", "c"], cardinality={"a": 3, "b": 2, "c": 2}, seed=0)
        np.testing.assert_allclose(cpd.get_values().sum(axis=0), 1.0, rtol=1e-5)

    def test_get_evidence(self):
        cpd = TabularCPD.get_random("a", evidence=["b", "c"])
        assert cpd.get_evidence() == ["c", "b"]

    def test_uniform(self):
        cpd = TabularCPD.get_uniform("a", cardinality={"a": 4})
        np.testing.assert_allclose(cpd.get_values(), 0.25)
