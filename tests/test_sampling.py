import numpy as np
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.inference import VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.sampling import BayesianModelSampling, GibbsSampling

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


def marginal_of(df, var, card, weights=None):
    counts = np.zeros(card)
    codes = df[var].cat.codes if hasattr(df[var], "cat") else df[var]
    if weights is None:
        for c in range(card):
            counts[c] = (codes == c).sum()
    else:
        for c in range(card):
            counts[c] = weights[codes == c].sum()
    return counts / counts.sum()


class TestForwardSampling:
    def setup_method(self):
        self.model = student_bn()
        self.sampler = BayesianModelSampling(self.model)
        self.ve = VariableElimination(self.model)

    def test_forward_marginals_match_exact(self):
        df = self.sampler.forward_sample(size=30000, seed=0)
        assert df.shape == (30000, 5)
        for var in ["grade", "letter"]:
            exact = np.asarray(self.ve.query([var], show_progress=False).values)
            emp = marginal_of(df, var, len(exact))
            np.testing.assert_allclose(emp, exact, atol=0.02)

    def test_rejection_sample_posterior(self):
        df = self.sampler.rejection_sample(
            evidence=[("grade", 0)], size=5000, seed=0
        )
        assert (df["grade"].cat.codes == 0).all()
        exact = np.asarray(
            self.ve.query(["intel"], evidence={"grade": 0}, show_progress=False).values
        )
        emp = marginal_of(df, "intel", 2)
        np.testing.assert_allclose(emp, exact, atol=0.03)

    def test_likelihood_weighted_posterior(self):
        df = self.sampler.likelihood_weighted_sample(
            evidence=[("letter", 1)], size=30000, seed=0
        )
        assert "_weight" in df.columns
        exact = np.asarray(
            self.ve.query(["diff"], evidence={"letter": 1}, show_progress=False).values
        )
        emp = marginal_of(df, "diff", 2, weights=df["_weight"].to_numpy())
        np.testing.assert_allclose(emp, exact, atol=0.03)

    def test_state_names_in_output(self):
        model = DiscreteBayesianNetwork([("rain", "grass")])
        model.add_cpds(
            TabularCPD("rain", 2, [[0.8], [0.2]], state_names={"rain": ["no", "yes"]}),
            TabularCPD(
                "grass", 2, [[0.9, 0.1], [0.1, 0.9]],
                evidence=["rain"], evidence_card=[2],
                state_names={"grass": ["dry", "wet"], "rain": ["no", "yes"]},
            ),
        )
        df = BayesianModelSampling(model).forward_sample(size=100, seed=0)
        assert set(df["rain"].unique()) <= {"no", "yes"}

    def test_bad_evidence_state(self):
        with pytest.raises(ValueError):
            self.sampler.rejection_sample(evidence=[("grade", "bogus")], size=10)

    def test_partial_samples(self):
        import pandas as pd

        partial = pd.DataFrame({"diff": [1] * 50})
        df = self.sampler.forward_sample(size=50, seed=0, partial_samples=partial)
        assert (df["diff"].cat.codes == 1).all()


class TestSimulate:
    def test_simulate_basic(self):
        df = student_bn().simulate(n_samples=500, seed=0, show_progress=False)
        assert df.shape == (500, 5)

    def test_simulate_do(self):
        model = student_bn()
        df = model.simulate(n_samples=4000, do={"grade": 1}, seed=0, show_progress=False)
        assert (df["grade"].cat.codes == 1).all()
        # under do(grade), letter follows P(letter | grade=1)
        emp = marginal_of(df, "letter", 2)
        np.testing.assert_allclose(emp, [0.4, 0.6], atol=0.03)
        # and intel is unaffected (prior)
        emp_i = marginal_of(df, "intel", 2)
        np.testing.assert_allclose(emp_i, [0.7, 0.3], atol=0.03)

    def test_simulate_evidence(self):
        model = student_bn()
        df = model.simulate(
            n_samples=3000, evidence={"grade": 0}, seed=0, show_progress=False
        )
        ve = VariableElimination(model)
        exact = np.asarray(ve.query(["intel"], evidence={"grade": 0}, show_progress=False).values)
        emp = marginal_of(df, "intel", 2)
        np.testing.assert_allclose(emp, exact, atol=0.03)

    def test_simulate_virtual_evidence(self):
        model = student_bn()
        virt = TabularCPD("intel", 2, [[0.9], [0.1]])
        df = model.simulate(
            n_samples=5000, virtual_evidence=[virt], seed=0, show_progress=False
        )
        ve = VariableElimination(model)
        exact = np.asarray(ve.query(["intel"], virtual_evidence=[virt], show_progress=False).values)
        emp = marginal_of(df, "intel", 2)
        np.testing.assert_allclose(emp, exact, atol=0.03)

    def test_simulate_missingness(self):
        model = student_bn()
        miss = TabularCPD("grade*", 2, [[0.7], [0.3]])
        df = model.simulate(n_samples=2000, missing_prob=miss, seed=0, show_progress=False)
        frac_missing = df["grade"].isna().mean()
        assert frac_missing == pytest.approx(0.3, abs=0.04)

    def test_simulate_latents_dropped(self):
        model = student_bn()
        model.latents = {"intel"}
        df = model.simulate(n_samples=50, seed=0, show_progress=False)
        assert "intel" not in df.columns
        df2 = model.simulate(n_samples=50, seed=0, include_latents=True, show_progress=False)
        assert "intel" in df2.columns


class TestGibbs:
    def test_gibbs_marginals(self):
        model = student_bn()
        gibbs = GibbsSampling(model)
        traj = np.asarray(gibbs.sample_chains(n_chains=64, size=300, seed=0))
        # discard burn-in, pool chains
        pooled = traj[100:].reshape(-1, len(gibbs.variables))
        ve = VariableElimination(model)
        for var in ["grade", "SAT"]:
            i = gibbs.variables.index(var)
            card = gibbs.cardinalities[var]
            counts = np.bincount(pooled[:, i], minlength=card).astype(float)
            emp = counts / counts.sum()
            exact = np.asarray(ve.query([var], show_progress=False).values)
            np.testing.assert_allclose(emp, exact, atol=0.02)

    def test_gibbs_single_chain_api(self):
        model = student_bn()
        gibbs = GibbsSampling(model)
        df = gibbs.sample(size=50, seed=0)
        assert df.shape == (50, 5)

    def test_gibbs_generate_sample(self):
        model = student_bn()
        gibbs = GibbsSampling(model)
        states = list(gibbs.generate_sample(size=3, seed=0))
        assert len(states) == 3
        assert len(states[0]) == 5


class TestCacheInvalidation:
    def test_inplace_cpd_mutation_invalidates_compiled_sampler(self):
        """In-place CPD edits (set_value / direct .values assignment) must
        invalidate the model-cached compiled sampler (ADVICE r1)."""
        model = student_bn()
        s1 = BayesianModelSampling(model)
        df = s1.forward_sample(size=20000, seed=0)
        emp_before = marginal_of(df, "diff", 2)
        assert abs(emp_before[0] - 0.6) < 0.02

        cpd = model.get_cpds("diff")
        cpd.values = np.asarray([0.05, 0.95]).reshape(2)  # direct assignment
        s2 = BayesianModelSampling(model)
        assert s2.sampler is not s1.sampler
        df2 = s2.forward_sample(size=20000, seed=0)
        emp_after = marginal_of(df2, "diff", 2)
        assert abs(emp_after[0] - 0.05) < 0.02

    def test_inplace_mutation_invalidates_check_model_cache(self):
        model = student_bn()
        assert model.check_model()
        cpd = model.get_cpds("diff")
        cpd.set_value(0.9, diff=0)  # column no longer sums to 1
        with pytest.raises(ValueError, match="not equal to 1"):
            model.check_model()


class TestGibbsTableLayouts:
    """The oversized-factor fallback (shared flat log table + gather) must
    agree exactly with the default per-variable permuted MXU layout."""

    def test_flat_fallback_matches_mxu_conditionals(self):
        import jax.numpy as jnp

        from pgmpy_tpu.factors import DiscreteFactor
        from pgmpy_tpu.models import DiscreteMarkovNetwork
        from pgmpy_tpu.sampling.gibbs import CompiledGibbs, GibbsSampling

        rng = np.random.default_rng(0)
        mn = DiscreteMarkovNetwork([("a", "b"), ("b", "c")])
        mn.add_factors(
            DiscreteFactor(["a", "b"], [2, 3], rng.random((2, 3)) + 0.1),
            DiscreteFactor(["b", "c"], [3, 2], rng.random((3, 2)) + 0.1),
        )
        orig = CompiledGibbs._DUP_TABLE_MAX
        try:
            CompiledGibbs._DUP_TABLE_MAX = 4  # force every factor flat
            flat = GibbsSampling(mn)._compiled
            assert all(
                s[0] == "flat" for specs in flat._var_specs for s in specs
            )
        finally:
            CompiledGibbs._DUP_TABLE_MAX = orig
        mxu = GibbsSampling(mn)._compiled
        assert any(
            s[0] == "mxu" for specs in mxu._var_specs for s in specs
        )
        states = jnp.asarray(
            rng.integers(0, [2, 3, 2], size=(64, 3)).astype(np.int32)
        )
        for var in ("a", "b", "c"):
            i = mxu.var_index[var]
            a = np.asarray(mxu._conditional_logits(states, i), dtype=np.float64)
            b = np.asarray(flat._conditional_logits(states, i), dtype=np.float64)
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=var)
