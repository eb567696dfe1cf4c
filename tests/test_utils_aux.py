import os
import tempfile

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from pgmpy_tpu.base import DAG
from pgmpy_tpu.config import config
from pgmpy_tpu.utils import (
    KernelTimer,
    cartesian,
    discretize,
    get_dataset_type,
    powerset,
    preprocess_data,
    sample_discrete,
)
from pgmpy_tpu.sampling import load_sampler_state, save_sampler_state


class TestMathext:
    def test_cartesian(self):
        out = cartesian([np.array([1, 2]), np.array([3, 4, 5])])
        assert out.shape == (6, 2)
        assert out[0].tolist() == [1, 3]
        assert out[-1].tolist() == [2, 5]

    def test_sample_discrete(self):
        draws = sample_discrete([0, 1], [0.0, 1.0], size=20, seed=0)
        assert (draws == 1).all()

    def test_sample_discrete_rowwise(self):
        weights = np.array([[1.0, 0.0], [0.0, 1.0]])
        draws = sample_discrete([5, 7], weights, seed=0)
        assert draws.tolist() == [5, 7]

    def test_powerset(self):
        assert len(list(powerset([1, 2, 3]))) == 8


class TestDataUtils:
    def test_get_dataset_type(self):
        assert get_dataset_type(pd.DataFrame({"a": [1, 2]})) == "discrete"
        assert get_dataset_type(pd.DataFrame({"a": [1.5, 2.5]})) == "continuous"
        assert get_dataset_type(pd.DataFrame({"a": [1, 2], "b": [0.5, 1.5]})) == "mixed"

    def test_preprocess_data(self):
        codes, variables, names = preprocess_data(
            pd.DataFrame({"a": ["x", "y", "x"]})
        )
        assert variables == ["a"]
        assert codes.tolist() == [[0], [1], [0]]

    def test_discretize(self):
        df = discretize(pd.DataFrame({"a": np.linspace(0, 1, 100)}), cardinality=4)
        assert df["a"].nunique() == 4


class TestConfig:
    def test_backend_is_jax(self):
        assert config.BACKEND == "jax"
        config.set_backend("numpy")  # warns, does not switch
        assert config.BACKEND == "jax"

    def test_bad_backend(self):
        with pytest.raises(ValueError):
            config.set_backend("mxnet")

    def test_show_progress(self):
        config.set_show_progress(False)
        assert not config.SHOW_PROGRESS
        config.set_show_progress(True)


class TestProfiling:
    def test_kernel_timer(self):
        timer = KernelTimer()
        best, result = timer.timeit(
            "matmul", lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)), repeat=3
        )
        assert best > 0
        summary = timer.summary()
        assert summary["matmul"]["calls"] == 3


class TestCheckpoint:
    def test_roundtrip(self):
        states = {"chains": jnp.arange(12).reshape(3, 4), "logw": jnp.ones(3)}
        key = jax.random.PRNGKey(7)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "state.npz")
            save_sampler_state(path, states, key, step=42, extra={"note": 1})
            loaded, key2, step, extra = load_sampler_state(path, treedef_like=states)
        assert step == 42
        np.testing.assert_array_equal(np.asarray(loaded["chains"]), np.arange(12).reshape(3, 4))
        np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))
        assert int(extra["note"]) == 1


class TestEdgeStrengthValidate:
    def test_edge_strength(self):
        rng = np.random.default_rng(0)
        n = 3000
        x = rng.normal(size=n)
        z = rng.normal(size=n)
        y = 0.8 * x + 0.1 * z + rng.normal(size=n) * 0.5
        data = pd.DataFrame({"x": x, "z": z, "y": y})
        dag = DAG([("x", "y"), ("z", "y")])
        strengths = dag.edge_strength(data)
        assert strengths[("x", "y")] > strengths[("z", "y")]
        assert 0 <= strengths[("z", "y")] <= 1


class TestReviewRegressions:
    """Regressions for the round-1 code-review findings."""

    def _student(self):
        from pgmpy_tpu.models import DiscreteBayesianNetwork
        from pgmpy_tpu.factors import TabularCPD

        m = DiscreteBayesianNetwork([("A", "B")])
        m.add_cpds(
            TabularCPD("A", 2, [[0.4], [0.6]]),
            TabularCPD("B", 2, [[0.9, 0.2], [0.1, 0.8]], evidence=["A"], evidence_card=[2]),
        )
        return m

    def test_map_query_default_variables(self):
        from pgmpy_tpu.inference import BeliefPropagation, VariableElimination

        m = self._student()
        out = VariableElimination(m).map_query(evidence={"A": 1}, show_progress=False)
        assert out == {"B": 1}
        out_bp = BeliefPropagation(m).map_query(evidence={"A": 1}, show_progress=False)
        assert out_bp == {"B": 1}
        # no evidence: full MAP over all variables
        full = VariableElimination(m).map_query(show_progress=False)
        assert set(full) == {"A", "B"}

    def test_weighted_false_ignores_weight_column(self):
        from pgmpy_tpu.estimators import MaximumLikelihoodEstimator

        df = pd.DataFrame({"A": [0, 0, 1, 1], "B": [0, 1, 0, 1], "_weight": [10.0, 1, 1, 1]})
        m = self._student()
        est = MaximumLikelihoodEstimator(m, df)
        unweighted = est.estimate_cpd("A", weighted=False).get_values().ravel()
        np.testing.assert_allclose(unweighted, [0.5, 0.5], atol=1e-6)
        weighted = est.estimate_cpd("A", weighted=True).get_values().ravel()
        np.testing.assert_allclose(weighted, [11 / 13, 2 / 13], atol=1e-6)

    def test_remove_edge_invalidates_check(self):
        m = self._student()
        assert m.check_model()
        m.remove_edge("A", "B")
        with pytest.raises(ValueError):
            m.check_model()

    def test_set_value_invalidates_validity(self):
        from pgmpy_tpu.factors import TabularCPD

        cpd = TabularCPD("A", 2, [[0.9], [0.1]])
        assert cpd.is_valid_cpd()
        cpd.set_value(0.9, A=1)
        assert not cpd.is_valid_cpd()

    def test_em_handles_nan_rows(self):
        from pgmpy_tpu.estimators import ExpectationMaximization
        from pgmpy_tpu.models import DiscreteBayesianNetwork

        rng = np.random.default_rng(0)
        n = 1500
        z = rng.random(n) < 0.4
        x = np.where(z, rng.random(n) < 0.9, rng.random(n) < 0.1).astype(float)
        y = np.where(z, rng.random(n) < 0.85, rng.random(n) < 0.15).astype(float)
        x[:50] = np.nan  # missing observations must not bias the E-step
        data = pd.DataFrame({"x": x, "y": y})
        model = DiscreteBayesianNetwork([("z", "x"), ("z", "y")], latents=["z"])
        est = ExpectationMaximization(model, data)
        cpds = est.get_parameters(seed=42, max_iter=40, atol=1e-4, show_progress=False)
        cpd_x = [c for c in cpds if c.variable == "x"][0]
        spread = abs(cpd_x.get_values()[1, 0] - cpd_x.get_values()[1, 1])
        assert spread > 0.5
