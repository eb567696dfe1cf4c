import numpy as np
import pytest

from pgmpy_tpu.factors import LinearGaussianCPD
from pgmpy_tpu.models import LinearGaussianBayesianNetwork
from pgmpy_tpu.sampling import HamiltonianMC, HamiltonianMCDA, NoUTurnSampler


def chain_lgbn():
    """x1 -> x2 -> x3 with known joint (pgmpy docstring example)."""
    model = LinearGaussianBayesianNetwork([("x1", "x2"), ("x2", "x3")])
    model.add_cpds(
        LinearGaussianCPD("x1", [1], 4),
        LinearGaussianCPD("x2", [-5, 0.5], 4, evidence=["x1"]),
        LinearGaussianCPD("x3", [4, -1], 3, evidence=["x2"]),
    )
    return model


class TestLGBN:
    def test_joint_gaussian_closed_form(self):
        variables, mean, cov = chain_lgbn().joint_gaussian()
        assert variables == ["x1", "x2", "x3"]
        np.testing.assert_allclose(mean, [1.0, -4.5, 8.5], atol=1e-5)
        expected_cov = np.array(
            [[16.0, 8.0, -8.0], [8.0, 20.0, -20.0], [-8.0, -20.0, 29.0]]
        )
        np.testing.assert_allclose(cov, expected_cov, atol=1e-4)

    def test_simulate_moments(self):
        df = chain_lgbn().simulate(n_samples=200000, seed=0)
        np.testing.assert_allclose(df.mean(), [1.0, -4.5, 8.5], atol=0.1)
        np.testing.assert_allclose(np.cov(df.T.to_numpy()),
                                   [[16, 8, -8], [8, 20, -20], [-8, -20, 29]], atol=0.5)

    def test_fit_recovers_parameters(self):
        model = chain_lgbn()
        df = model.simulate(n_samples=100000, seed=1)
        learned = LinearGaussianBayesianNetwork([("x1", "x2"), ("x2", "x3")])
        learned.fit(df)
        cpd2 = learned.get_cpds("x2")
        np.testing.assert_allclose(cpd2.beta, [-5, 0.5], atol=0.1)
        assert cpd2.std == pytest.approx(4, abs=0.1)

    def test_log_likelihood_matches_scipy(self):
        from scipy.stats import multivariate_normal

        model = chain_lgbn()
        df = model.simulate(n_samples=100, seed=2)
        variables, mean, cov = model.joint_gaussian()
        expected = multivariate_normal(mean, cov).logpdf(
            df.loc[:, variables].to_numpy()
        ).sum()
        assert model.log_likelihood(df) == pytest.approx(expected, rel=1e-4)

    def test_predict_conditioning(self):
        model = chain_lgbn()
        import pandas as pd

        data = pd.DataFrame({"x1": [1.0], "x2": [-4.5]})
        missing, cond_mean, cond_cov = model.predict(data)
        assert missing == ["x3"]
        # x3 | x2=-4.5 has mean 4 - 1*(-4.5) = 8.5, var 9
        np.testing.assert_allclose(cond_mean[0], [8.5], atol=1e-4)
        np.testing.assert_allclose(cond_cov, [[9.0]], atol=1e-3)

    def test_check_model_wrong_parents(self):
        model = LinearGaussianBayesianNetwork([("a", "b")])
        model.add_cpds(
            LinearGaussianCPD("a", [0], 1), LinearGaussianCPD("b", [0], 1)
        )
        with pytest.raises(ValueError):
            model.check_model()

    def test_get_random(self):
        model = LinearGaussianBayesianNetwork.get_random(n_nodes=6, seed=0)
        assert model.check_model()

    def test_ecoli70_loads(self):
        from pgmpy_tpu.utils.utils import get_example_model

        model = get_example_model("ecoli70")
        assert len(model.nodes()) == 46
        assert model.check_model()
        variables, mean, cov = model.joint_gaussian()
        assert np.all(np.isfinite(mean)) and np.all(np.isfinite(cov))
        # covariance must be symmetric PSD
        np.testing.assert_allclose(cov, cov.T, atol=1e-5)
        assert np.linalg.eigvalsh(cov).min() > 0


class TestHMC:
    def test_hmc_2d_gaussian_moments(self):
        model = LinearGaussianBayesianNetwork([("x1", "x2")])
        model.add_cpds(
            LinearGaussianCPD("x1", [1], 2),
            LinearGaussianCPD("x2", [0, 1.0], 1, evidence=["x1"]),
        )
        hmc = HamiltonianMC(model)
        samples = hmc.sample(
            np.zeros(2), num_samples=1500, trajectory_length=6,
            n_chains=16, seed=0, return_type="array",
        )
        pooled = samples[300:].reshape(-1, 2)
        _, mean, cov = model.joint_gaussian()
        np.testing.assert_allclose(pooled.mean(axis=0), mean, atol=0.25)
        np.testing.assert_allclose(np.cov(pooled.T), cov, atol=0.6)
        assert hmc.acceptance_rate > 0.5

    def test_hmcda_adapts(self):
        model = chain_lgbn()
        hmc = HamiltonianMCDA(model)
        samples = hmc.sample(
            np.zeros(3), num_adapt=100, num_samples=800,
            trajectory_length=8, n_chains=8, seed=0, return_type="array",
        )
        pooled = samples[200:].reshape(-1, 3)
        _, mean, _ = model.joint_gaussian()
        np.testing.assert_allclose(pooled.mean(axis=0), mean, atol=0.4)
        assert 0.3 < hmc.acceptance_rate <= 1.0


class TestNUTS:
    def test_nuts_2d_gaussian(self):
        model = LinearGaussianBayesianNetwork([("x1", "x2")])
        model.add_cpds(
            LinearGaussianCPD("x1", [0], 1),
            LinearGaussianCPD("x2", [0, 0.8], 1, evidence=["x1"]),
        )
        nuts = NoUTurnSampler(model, max_depth=6)
        samples = nuts.sample(np.zeros(2), num_samples=600, seed=0, return_type="array")
        _, mean, cov = model.joint_gaussian()
        np.testing.assert_allclose(samples[100:].mean(axis=0), mean, atol=0.3)
        np.testing.assert_allclose(np.cov(samples[100:].T), cov, atol=0.6)


class TestVectorizedNUTS:
    def test_moments_and_adaptation(self):
        from pgmpy_tpu.sampling import VectorizedNUTS

        model = LinearGaussianBayesianNetwork([("x1", "x2")])
        model.add_cpds(
            LinearGaussianCPD("x1", [1], 2),
            LinearGaussianCPD("x2", [0, 1.0], 1, evidence=["x1"]),
        )
        nuts = VectorizedNUTS(model, max_depth=6)
        samples = nuts.sample(
            np.zeros(2), num_samples=800, num_adapt=200, stepsize=0.1,
            n_chains=32, seed=0,
        )
        pooled = samples[100:].reshape(-1, 2)
        _, mean, cov = model.joint_gaussian()
        np.testing.assert_allclose(pooled.mean(axis=0), mean, atol=0.2)
        np.testing.assert_allclose(np.cov(pooled.T), cov, atol=0.6)
        assert 0.6 < nuts.acceptance_rate <= 1.0

    def test_matches_host_nuts_distribution(self):
        """Compiled and host-recursive NUTS should agree on the posterior."""
        from pgmpy_tpu.sampling import VectorizedNUTS

        model = chain_lgbn()
        vec = VectorizedNUTS(model, max_depth=6)
        s1 = vec.sample(np.zeros(3), num_samples=1200, num_adapt=200, n_chains=16, seed=0)
        p1 = s1[200:].reshape(-1, 3)
        _, mean, cov = model.joint_gaussian()
        np.testing.assert_allclose(p1.mean(axis=0), mean, atol=0.3)
        np.testing.assert_allclose(np.sqrt(np.diag(np.cov(p1.T))), np.sqrt(np.diag(cov)), rtol=0.15)
