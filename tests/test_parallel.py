import numpy as np
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.inference import VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.parallel import (
    get_mesh,
    sharded_gibbs_marginals,
    sharded_sample_marginals,
)


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


class TestMesh:
    def test_mesh_has_8_virtual_devices(self):
        mesh = get_mesh()
        assert mesh.devices.size == 8

    def test_sharded_forward_marginals(self):
        model = student_bn()
        ve = VariableElimination(model)
        marginals = sharded_sample_marginals(model, 40000, seed=0)
        for var in ["grade", "letter"]:
            exact = np.asarray(ve.query([var], show_progress=False).values)
            np.testing.assert_allclose(marginals[var], exact, atol=0.02)

    def test_sharded_lw_marginals_with_evidence(self):
        model = student_bn()
        ve = VariableElimination(model)
        marginals = sharded_sample_marginals(
            model, 80000, evidence={"letter": 1}, seed=0
        )
        exact = np.asarray(
            ve.query(["diff"], evidence={"letter": 1}, show_progress=False).values
        )
        np.testing.assert_allclose(marginals["diff"], exact, atol=0.03)

    def test_sharded_gibbs_marginals(self):
        model = student_bn()
        ve = VariableElimination(model)
        marginals = sharded_gibbs_marginals(
            model, n_chains=256, n_sweeps=200, burn_in=100, seed=0
        )
        for var in ["grade", "SAT"]:
            exact = np.asarray(ve.query([var], show_progress=False).values)
            np.testing.assert_allclose(marginals[var], exact, atol=0.025)

    def test_device_count_invariance(self):
        """Same total samples on 2 vs 8 devices gives consistent answers."""
        model = student_bn()
        m8 = sharded_sample_marginals(model, 16000, mesh=get_mesh(8), seed=0)
        m2 = sharded_sample_marginals(model, 16000, mesh=get_mesh(2), seed=0)
        for var in m8:
            np.testing.assert_allclose(m8[var], m2[var], atol=0.03)


class TestShardedNUTS:
    def test_moments_match_closed_form(self):
        from pgmpy_tpu.factors import LinearGaussianCPD
        from pgmpy_tpu.models import LinearGaussianBayesianNetwork
        from pgmpy_tpu.parallel import sharded_nuts_moments

        model = LinearGaussianBayesianNetwork([("x1", "x2")])
        model.add_cpds(
            LinearGaussianCPD("x1", [1], 2),
            LinearGaussianCPD("x2", [0, 1.0], 1, evidence=["x1"]),
        )
        moments = sharded_nuts_moments(
            model, n_chains=64, num_samples=400, num_adapt=150,
            stepsize=0.2, max_depth=5, seed=0,
        )
        _, mean, cov = model.to_joint_gaussian()
        std = np.sqrt(np.diag(cov))
        for i, (var, (m, s)) in enumerate(moments.items()):
            assert abs(m - mean[i]) < 0.25, var
            assert abs(s - std[i]) / std[i] < 0.15, var
