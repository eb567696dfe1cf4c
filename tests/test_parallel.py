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


class TestShardedQueryBatch:
    def test_matches_single_device_and_device_count_invariant(self):
        """The headline batched-inference path gives IDENTICAL answers on a
        2-device and an 8-device mesh, matching the unsharded query_batch."""
        from pgmpy_tpu.parallel import sharded_query_batch

        model = student_bn()
        infer = VariableElimination(model)
        n = 13  # not divisible by either device count
        evidence = {"grade": [i % 3 for i in range(n)],
                    "SAT": [i % 2 for i in range(n)]}
        ref_values, ref_names = infer.query_batch(["intel", "diff"], evidence)
        ref_values = np.asarray(ref_values)

        for n_dev in (2, 8):
            mesh = get_mesh(n_devices=n_dev)
            values, names = sharded_query_batch(
                model, ["intel", "diff"], evidence, mesh=mesh
            )
            assert names == ref_names
            np.testing.assert_allclose(values, ref_values, atol=1e-6,
                                       err_msg=f"n_dev={n_dev}")

    def test_bp_calibration_invariant_to_mesh_presence(self):
        """Calibrated clique beliefs are identical whether or not a mesh is
        active (the replicated program is mesh-independent)."""
        from pgmpy_tpu.inference.bp import BeliefPropagation

        model = student_bn()
        bp1 = BeliefPropagation(model)
        bp1.calibrate()
        beliefs1 = {c: np.asarray(f.values) for c, f in bp1.get_clique_beliefs().items()}

        with get_mesh(n_devices=2):
            bp2 = BeliefPropagation(model)
            bp2.calibrate()
            beliefs2 = {c: np.asarray(f.values) for c, f in bp2.get_clique_beliefs().items()}
        assert beliefs1.keys() == beliefs2.keys()
        for c in beliefs1:
            np.testing.assert_allclose(beliefs1[c], beliefs2[c], atol=1e-6)

    def test_dryrun_multichip(self):
        """The driver-facing dryrun covers calibration + sharded query +
        sampling + Gibbs + NUTS on the full virtual mesh."""
        import __graft_entry__ as graft

        graft.dryrun_multichip(8)
