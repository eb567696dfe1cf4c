"""Deep factor goldens: hand-computed / independently-computed assertions in
the style of the reference's 3,650-line factor suite
(``/root/reference/pgmpy/tests/test_factors/test_discrete/test_Factor.py``),
rewritten as parametrized pytest checks against numpy oracles.
"""

import numpy as np
import pytest

from pgmpy_tpu.factors import (
    DiscreteFactor,
    FactorSet,
    TabularCPD,
    factor_product,
    factor_sum_product,
)
from pgmpy_tpu.factors.discrete import State


# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu

def phi_xyz():
    """phi(x1, x2, x3) with cards (2, 3, 2) and values 0..11."""
    return DiscreteFactor(["x1", "x2", "x3"], [2, 3, 2], np.arange(12))


def A(factor):
    return np.asarray(factor.values, dtype=np.float64)


# ---------------------------------------------------------------------- #
# construction
# ---------------------------------------------------------------------- #
class TestFactorInit:
    def test_values_shape(self):
        phi = phi_xyz()
        assert phi.values.shape == (2, 3, 2)
        np.testing.assert_allclose(A(phi).ravel(), np.arange(12))

    def test_nd_values_accepted(self):
        phi = DiscreteFactor(["a", "b"], [2, 2], np.arange(4).reshape(2, 2))
        np.testing.assert_allclose(A(phi), [[0, 1], [2, 3]])

    def test_string_variables_raises(self):
        with pytest.raises(TypeError):
            DiscreteFactor("abc", [2, 3, 2], np.arange(12))

    def test_duplicate_variables_raises(self):
        with pytest.raises(ValueError):
            DiscreteFactor(["x1", "x1"], [2, 2], np.arange(4))

    def test_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            DiscreteFactor(["x1", "x2"], [2, 2], np.arange(5))

    def test_cardinality_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            DiscreteFactor(["x1", "x2"], [2], np.arange(4))

    def test_default_state_names(self):
        phi = phi_xyz()
        assert phi.state_names["x1"] == [0, 1]
        assert phi.state_names["x2"] == [0, 1, 2]

    def test_custom_state_names(self):
        phi = DiscreteFactor(
            ["speed"], [3], [0.2, 0.3, 0.5],
            state_names={"speed": ["low", "med", "high"]},
        )
        assert phi.get_value(speed="med") == pytest.approx(0.3)

    def test_scope(self):
        assert phi_xyz().scope() == ["x1", "x2", "x3"]

    def test_get_cardinality(self):
        phi = phi_xyz()
        assert phi.get_cardinality(["x1", "x3"]) == {"x1": 2, "x3": 2}
        assert phi.get_cardinality(["x2"]) == {"x2": 3}

    def test_get_cardinality_unknown_var_raises(self):
        with pytest.raises(ValueError):
            phi_xyz().get_cardinality(["bogus"])

    def test_get_cardinality_string_raises(self):
        with pytest.raises(TypeError):
            phi_xyz().get_cardinality("x1")


class TestFactorIndexing:
    def test_get_value(self):
        phi = phi_xyz()
        # C-order: value at (x1=1, x2=2, x3=0) = 1*6 + 2*2 + 0 = 10
        assert phi.get_value(x1=1, x2=2, x3=0) == 10

    def test_get_value_missing_var_raises(self):
        with pytest.raises(ValueError):
            phi_xyz().get_value(x1=0, x2=0)

    def test_set_value(self):
        phi = phi_xyz()
        phi.set_value(99.0, x1=0, x2=1, x3=1)
        assert phi.get_value(x1=0, x2=1, x3=1) == 99.0
        assert phi.get_value(x1=0, x2=1, x3=0) == 2

    def test_assignment(self):
        phi = DiscreteFactor(["a", "b"], [2, 2], np.arange(4))
        out = phi.assignment([0, 3])
        assert out[0] == [State("a", 0), State("b", 0)]
        assert out[1] == [State("a", 1), State("b", 1)]

    def test_assignment_out_of_range(self):
        with pytest.raises(IndexError):
            phi_xyz().assignment([12])

    def test_identity_factor(self):
        ident = phi_xyz().identity_factor()
        assert ident.scope() == ["x1", "x2", "x3"]
        np.testing.assert_allclose(A(ident), 1.0)


# ---------------------------------------------------------------------- #
# reductions
# ---------------------------------------------------------------------- #
class TestMarginalize:
    def test_single(self):
        phi = phi_xyz()
        phi.marginalize(["x1"])
        np.testing.assert_allclose(A(phi), np.arange(12).reshape(2, 3, 2).sum(0))
        assert phi.scope() == ["x2", "x3"]

    def test_multiple(self):
        phi = phi_xyz()
        phi.marginalize(["x1", "x3"])
        np.testing.assert_allclose(
            A(phi), np.arange(12).reshape(2, 3, 2).sum(axis=(0, 2))
        )

    def test_not_inplace(self):
        phi = phi_xyz()
        out = phi.marginalize(["x2"], inplace=False)
        assert phi.scope() == ["x1", "x2", "x3"]
        np.testing.assert_allclose(A(out), np.arange(12).reshape(2, 3, 2).sum(1))

    def test_unknown_var_raises(self):
        with pytest.raises(ValueError):
            phi_xyz().marginalize(["x5"])

    def test_string_arg_raises(self):
        with pytest.raises(TypeError):
            phi_xyz().marginalize("x1")

    def test_state_names_dropped(self):
        phi = phi_xyz()
        phi.marginalize(["x1"])
        assert "x1" not in phi.state_names


class TestMaximize:
    def test_single(self):
        phi = phi_xyz()
        phi.maximize(["x2"])
        np.testing.assert_allclose(A(phi), np.arange(12).reshape(2, 3, 2).max(1))
        assert phi.scope() == ["x1", "x3"]

    def test_hand_computed(self):
        phi = DiscreteFactor(
            ["x1", "x2"], [3, 2], [0.25, 0.35, 0.08, 0.16, 0.05, 0.11]
        )
        phi.maximize(["x1"])
        np.testing.assert_allclose(A(phi), [0.25, 0.35], atol=1e-6)

    def test_not_inplace(self):
        phi = phi_xyz()
        out = phi.maximize(["x1", "x3"], inplace=False)
        np.testing.assert_allclose(
            A(out), np.arange(12).reshape(2, 3, 2).max(axis=(0, 2))
        )

    def test_unknown_var_raises(self):
        with pytest.raises(ValueError):
            phi_xyz().maximize(["bogus"])


class TestNormalize:
    def test_inplace(self):
        phi = phi_xyz()
        phi.normalize()
        np.testing.assert_allclose(A(phi).sum(), 1.0, atol=1e-6)
        np.testing.assert_allclose(A(phi).ravel(), np.arange(12) / 66.0, atol=1e-6)

    def test_not_inplace(self):
        phi = phi_xyz()
        out = phi.normalize(inplace=False)
        np.testing.assert_allclose(A(phi).ravel(), np.arange(12))
        np.testing.assert_allclose(A(out).sum(), 1.0, atol=1e-6)


class TestReduce:
    def test_single_by_number(self):
        phi = phi_xyz()
        phi.reduce([("x1", 1)], show_warnings=False)
        np.testing.assert_allclose(A(phi), np.arange(12).reshape(2, 3, 2)[1])
        assert phi.scope() == ["x2", "x3"]

    def test_multiple(self):
        phi = phi_xyz()
        phi.reduce([("x1", 0), ("x3", 1)], show_warnings=False)
        np.testing.assert_allclose(A(phi), np.arange(12).reshape(2, 3, 2)[0, :, 1])
        assert phi.scope() == ["x2"]

    def test_by_state_name(self):
        phi = DiscreteFactor(
            ["g"], [3], [0.2, 0.3, 0.5], state_names={"g": ["a", "b", "c"]}
        )
        phi.reduce([("g", "b")])
        assert float(A(phi)) == pytest.approx(0.3)

    def test_not_inplace(self):
        phi = phi_xyz()
        out = phi.reduce([("x2", 2)], inplace=False, show_warnings=False)
        assert phi.scope() == ["x1", "x2", "x3"]
        np.testing.assert_allclose(A(out), np.arange(12).reshape(2, 3, 2)[:, 2, :])

    def test_unknown_var_raises(self):
        with pytest.raises(ValueError):
            phi_xyz().reduce([("x9", 0)])

    def test_invalid_state_raises(self):
        with pytest.raises(ValueError):
            phi_xyz().reduce([("x1", 7)], show_warnings=False)

    def test_string_arg_raises(self):
        with pytest.raises(TypeError):
            phi_xyz().reduce("x1")

    def test_bare_strings_raise(self):
        with pytest.raises(TypeError):
            phi_xyz().reduce(["x1"])


# ---------------------------------------------------------------------- #
# binary ops
# ---------------------------------------------------------------------- #
class TestProduct:
    def test_disjoint_scopes_outer(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x2"], [3], [1.0, 10.0, 100.0])
        out = a * b
        assert out.scope() == ["x1", "x2"]
        np.testing.assert_allclose(A(out), np.outer([1, 2], [1, 10, 100]))

    def test_left_operand_axis_order_kept(self):
        a = DiscreteFactor(["x2", "x1"], [3, 2], np.arange(6))
        b = DiscreteFactor(["x1"], [2], [10.0, 100.0])
        out = a * b
        assert out.scope() == ["x2", "x1"]
        np.testing.assert_allclose(
            A(out), np.arange(6).reshape(3, 2) * np.array([10.0, 100.0])
        )

    def test_shared_var_elementwise(self):
        a = DiscreteFactor(["x1", "x2"], [2, 2], np.arange(4))
        b = DiscreteFactor(["x2", "x3"], [2, 2], np.arange(4))
        out = a * b
        assert out.scope() == ["x1", "x2", "x3"]
        expected = np.einsum("ij,jk->ijk", np.arange(4).reshape(2, 2),
                             np.arange(4).reshape(2, 2))
        np.testing.assert_allclose(A(out), expected)

    def test_commutative_up_to_axis_order(self):
        a = DiscreteFactor(["x1", "x2"], [2, 3], np.arange(6))
        b = DiscreteFactor(["x3", "x2"], [2, 3], np.arange(6) + 1.0)
        assert (a * b) == (b * a)

    def test_scalar_multiply(self):
        phi = phi_xyz()
        out = phi * 2
        np.testing.assert_allclose(A(out).ravel(), np.arange(12) * 2)

    def test_cardinality_conflict_raises(self):
        a = DiscreteFactor(["x1"], [2], [1, 2])
        b = DiscreteFactor(["x1"], [3], [1, 2, 3])
        with pytest.raises(ValueError):
            a.product(b, inplace=False)

    def test_inplace(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x2"], [2], [3.0, 4.0])
        a.product(b)
        assert a.scope() == ["x1", "x2"]

    def test_state_names_merged(self):
        a = DiscreteFactor(["x1"], [2], [1, 2], state_names={"x1": ["p", "q"]})
        b = DiscreteFactor(["x2"], [2], [3, 4], state_names={"x2": ["r", "s"]})
        out = a * b
        assert out.state_names == {"x1": ["p", "q"], "x2": ["r", "s"]}

    def test_free_function_many(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x2"], [2], [3.0, 4.0])
        c = DiscreteFactor(["x1", "x3"], [2, 2], np.arange(4))
        out = factor_product(a, b, c)
        expected = np.einsum(
            "i,j,ik->ijk", [1.0, 2.0], [3.0, 4.0], np.arange(4).reshape(2, 2)
        )
        axes = [out.variables.index(v) for v in ["x1", "x2", "x3"]]
        np.testing.assert_allclose(np.transpose(A(out), np.argsort(axes)), expected)

    def test_free_function_non_factor_raises(self):
        with pytest.raises(TypeError):
            factor_product(phi_xyz(), 3)


class TestSumProduct:
    def test_matches_manual_einsum(self):
        a = DiscreteFactor(["x1", "x2"], [2, 3], np.arange(6) + 1.0)
        b = DiscreteFactor(["x2", "x3"], [3, 2], np.arange(6) + 2.0)
        out = factor_sum_product(["x1", "x3"], [a, b])
        expected = np.einsum(
            "ij,jk->ik", np.arange(6).reshape(2, 3) + 1.0,
            np.arange(6).reshape(3, 2) + 2.0,
        )
        np.testing.assert_allclose(A(out), expected, rtol=1e-6)

    def test_output_var_not_present_raises(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        with pytest.raises(ValueError):
            factor_sum_product(["zz"], [a])


class TestSumAndDivide:
    def test_sum(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x1"], [2], [10.0, 20.0])
        out = a + b
        np.testing.assert_allclose(A(out), [11.0, 22.0])

    def test_sum_broadcast(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x2"], [2], [10.0, 20.0])
        out = a + b
        np.testing.assert_allclose(A(out), [[11.0, 21.0], [12.0, 22.0]])

    def test_divide_subset_scope(self):
        a = DiscreteFactor(["x1", "x2"], [2, 2], [2.0, 4.0, 6.0, 8.0])
        b = DiscreteFactor(["x1"], [2], [2.0, 4.0])
        out = a / b
        np.testing.assert_allclose(A(out), [[1.0, 2.0], [1.5, 2.0]])

    def test_divide_zero_by_zero_is_zero(self):
        a = DiscreteFactor(["x1"], [2], [0.0, 4.0])
        b = DiscreteFactor(["x1"], [2], [0.0, 2.0])
        out = a / b
        np.testing.assert_allclose(A(out), [0.0, 2.0])

    def test_divide_superset_scope_raises(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x1", "x2"], [2, 2], np.arange(4))
        with pytest.raises(ValueError):
            a / b

    def test_divide_scalar_raises(self):
        with pytest.raises(TypeError):
            phi_xyz() / 2


class TestEquality:
    def test_equal_after_axis_permutation(self):
        a = DiscreteFactor(["x1", "x2"], [2, 3], np.arange(6))
        b = DiscreteFactor(["x2", "x1"], [3, 2], np.arange(6).reshape(2, 3).T.ravel())
        assert a == b

    def test_equal_after_state_name_permutation(self):
        a = DiscreteFactor(["g"], [2], [0.3, 0.7], state_names={"g": ["hi", "lo"]})
        b = DiscreteFactor(["g"], [2], [0.7, 0.3], state_names={"g": ["lo", "hi"]})
        assert a == b

    def test_not_equal_values(self):
        a = DiscreteFactor(["x1"], [2], [1, 2])
        b = DiscreteFactor(["x1"], [2], [1, 3])
        assert a != b

    def test_not_equal_scope(self):
        a = DiscreteFactor(["x1"], [2], [1, 2])
        b = DiscreteFactor(["x2"], [2], [1, 2])
        assert a != b

    def test_not_equal_cardinality(self):
        a = DiscreteFactor(["x1", "x2"], [2, 2], np.arange(4))
        b = DiscreteFactor(["x1", "x2"], [4, 1], np.arange(4))
        assert a != b

    def test_not_factor(self):
        assert phi_xyz() != "a string"

    def test_hash_consistent(self):
        a = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        b = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        assert hash(a) == hash(b)


class TestCopySample:
    def test_copy_independent(self):
        phi = phi_xyz()
        cp = phi.copy()
        cp.set_value(99, x1=0, x2=0, x3=0)
        assert phi.get_value(x1=0, x2=0, x3=0) == 0
        assert cp.get_value(x1=0, x2=0, x3=0) == 99

    def test_copy_preserves_state_names(self):
        phi = DiscreteFactor(["g"], [2], [1, 2], state_names={"g": ["u", "v"]})
        assert phi.copy().state_names == {"g": ["u", "v"]}

    def test_sample_distribution(self):
        phi = DiscreteFactor(["x"], [2], [0.2, 0.8])
        df = phi.sample(20000, seed=0)
        freq = (df["x"] == 1).mean()
        assert freq == pytest.approx(0.8, abs=0.02)


# ---------------------------------------------------------------------- #
# TabularCPD
# ---------------------------------------------------------------------- #
class TestTabularCPD:
    def make_grade(self):
        return TabularCPD(
            "grade", 3,
            [[0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
             [0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
             [0.8, 0.8, 0.8, 0.8, 0.8, 0.8]],
            evidence=["intel", "diff"], evidence_card=[3, 2],
        )

    def test_variables_layout(self):
        cpd = self.make_grade()
        assert cpd.variable == "grade"
        assert cpd.variable_card == 3
        assert cpd.variables == ["grade", "intel", "diff"]
        assert list(cpd.cardinality) == [3, 3, 2]

    def test_get_values_shape(self):
        cpd = self.make_grade()
        assert cpd.get_values().shape == (3, 6)
        np.testing.assert_allclose(cpd.get_values()[2], 0.8)

    def test_values_nd_layout_last_evidence_fastest(self):
        cpd = TabularCPD(
            "b", 2, [[0.1, 0.2, 0.3, 0.4], [0.9, 0.8, 0.7, 0.6]],
            evidence=["p", "q"], evidence_card=[2, 2],
        )
        # column order cycles q fastest: col 1 = (p=0, q=1)
        assert cpd.get_value(b=0, p=0, q=1) == pytest.approx(0.2)
        assert cpd.get_value(b=0, p=1, q=0) == pytest.approx(0.3)

    def test_non_integer_card_raises(self):
        with pytest.raises(TypeError):
            TabularCPD("a", 2.5, [[0.5], [0.5]])

    def test_1d_values_raises(self):
        with pytest.raises(TypeError):
            TabularCPD("a", 2, [0.5, 0.5])

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            TabularCPD("a", 2, [[0.5, 0.5]])

    def test_evidence_without_card_raises(self):
        with pytest.raises(ValueError):
            TabularCPD("a", 2, [[0.5, 0.5], [0.5, 0.5]], evidence=["b"])

    def test_evidence_card_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            TabularCPD(
                "a", 2, [[0.5, 0.5], [0.5, 0.5]],
                evidence=["b"], evidence_card=[2, 2],
            )

    def test_string_evidence_raises(self):
        with pytest.raises(TypeError):
            TabularCPD("a", 2, [[0.5, 0.5], [0.5, 0.5]], evidence="b", evidence_card=[2])

    def test_normalize_columns(self):
        cpd = TabularCPD(
            "a", 2, [[1.0, 2.0], [3.0, 2.0]], evidence=["b"], evidence_card=[2]
        )
        cpd.normalize()
        np.testing.assert_allclose(cpd.get_values().sum(axis=0), 1.0, atol=1e-6)
        np.testing.assert_allclose(cpd.get_values()[0], [0.25, 0.5], atol=1e-6)

    def test_marginalize_renormalizes(self):
        cpd = self.make_grade()
        cpd.marginalize(["diff"])
        assert cpd.variables == ["grade", "intel"]
        np.testing.assert_allclose(cpd.get_values().sum(axis=0), 1.0, atol=1e-6)

    def test_marginalize_own_variable_raises(self):
        with pytest.raises(ValueError):
            self.make_grade().marginalize(["grade"])

    def test_reduce_renormalizes(self):
        cpd = self.make_grade()
        cpd.reduce([("diff", 0)], show_warnings=False)
        assert cpd.variables == ["grade", "intel"]
        np.testing.assert_allclose(cpd.get_values().sum(axis=0), 1.0, atol=1e-6)

    def test_reduce_own_variable_raises(self):
        with pytest.raises(ValueError):
            self.make_grade().reduce([("grade", 0)])

    def test_to_factor_roundtrip_values(self):
        cpd = self.make_grade()
        phi = cpd.to_factor()
        assert isinstance(phi, DiscreteFactor)
        assert not isinstance(phi, TabularCPD)
        np.testing.assert_allclose(
            A(phi).reshape(3, 6), cpd.get_values()
        )

    def test_reorder_parents(self):
        cpd = TabularCPD(
            "y", 2, [[0.1, 0.2, 0.3, 0.4], [0.9, 0.8, 0.7, 0.6]],
            evidence=["p", "q"], evidence_card=[2, 2],
        )
        before = {(p, q): cpd.get_value(y=0, p=p, q=q) for p in (0, 1) for q in (0, 1)}
        cpd.reorder_parents(["q", "p"])
        assert cpd.variables == ["y", "q", "p"]
        for (p, q), val in before.items():
            assert cpd.get_value(y=0, p=p, q=q) == pytest.approx(val)

    def test_reorder_parents_invalid_raises(self):
        cpd = self.make_grade()
        with pytest.raises(ValueError):
            cpd.reorder_parents(["intel", "bogus"])

    def test_get_evidence_reversed(self):
        assert self.make_grade().get_evidence() == ["diff", "intel"]

    def test_copy_independent(self):
        cpd = self.make_grade()
        cp = cpd.copy()
        cp.normalize()
        cp.set_value(0.0, grade=0, intel=0, diff=0)
        assert cpd.get_value(grade=0, intel=0, diff=0) == pytest.approx(0.1)

    def test_get_random_columns_normalized(self):
        cpd = TabularCPD.get_random(
            "x", evidence=["y"], cardinality={"x": 3, "y": 4}, seed=7
        )
        assert cpd.get_values().shape == (3, 4)
        np.testing.assert_allclose(cpd.get_values().sum(axis=0), 1.0, atol=1e-5)

    def test_get_random_missing_card_raises(self):
        with pytest.raises(ValueError):
            TabularCPD.get_random("x", evidence=["y"], cardinality={"x": 2})

    def test_get_uniform(self):
        cpd = TabularCPD.get_uniform("x", evidence=["y"], cardinality={"x": 4, "y": 2})
        np.testing.assert_allclose(cpd.get_values(), 0.25)

    def test_is_valid_cpd(self):
        assert self.make_grade().is_valid_cpd()
        bad = TabularCPD.__new__(TabularCPD)
        # construct an invalid one via direct factor init
        invalid = TabularCPD("a", 2, [[0.5], [0.6]])
        assert not invalid.is_valid_cpd()

    def test_to_dataframe(self):
        df = self.make_grade().to_dataframe()
        assert df.shape == (6, 3)
        np.testing.assert_allclose(df.to_numpy().sum(axis=1), 1.0, atol=1e-6)

    def test_repr_contains_structure(self):
        assert "P(grade:3 | intel:3, diff:2)" in repr(self.make_grade())


class TestFactorSet:
    def test_product_is_union(self):
        phi1 = DiscreteFactor(["x1"], [2], [1, 2])
        phi2 = DiscreteFactor(["x2"], [2], [3, 4])
        phi3 = DiscreteFactor(["x3"], [2], [5, 6])
        fs = FactorSet(phi1, phi2) * FactorSet(phi3)
        assert len(fs.get_factors()) == 3

    def test_divide(self):
        phi1 = DiscreteFactor(["x1"], [2], [1.0, 2.0])
        phi2 = DiscreteFactor(["x2"], [2], [3.0, 4.0])
        out = FactorSet(phi1) / FactorSet(phi2)
        assert len(out.get_factors()) == 2

    def test_marginalize(self):
        phi1 = DiscreteFactor(["x1", "x2"], [2, 2], np.arange(4))
        fs = FactorSet(phi1)
        fs.marginalize(["x1"])
        (phi,) = fs.get_factors()
        assert phi.scope() == ["x2"]
