import numpy as np
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.inference import DBNInference, VariableElimination
from pgmpy_tpu.models import DynamicBayesianNetwork
from pgmpy_tpu.sampling.smc import ParticleFilter


def weather_dbn():
    """Classic umbrella-ish 2-TBN: rain_t -> rain_{t+1}, rain -> umbrella."""
    dbn = DynamicBayesianNetwork()
    dbn.add_edges_from(
        [(("rain", 0), ("umbrella", 0)), (("rain", 0), ("rain", 1))]
    )
    cpd_rain0 = TabularCPD(("rain", 0), 2, [[0.5], [0.5]])
    cpd_umb0 = TabularCPD(
        ("umbrella", 0), 2, [[0.8, 0.1], [0.2, 0.9]],
        evidence=[("rain", 0)], evidence_card=[2],
    )
    cpd_rain1 = TabularCPD(
        ("rain", 1), 2, [[0.7, 0.3], [0.3, 0.7]],
        evidence=[("rain", 0)], evidence_card=[2],
    )
    cpd_umb1 = TabularCPD(
        ("umbrella", 1), 2, [[0.8, 0.1], [0.2, 0.9]],
        evidence=[("rain", 1)], evidence_card=[2],
    )
    dbn.add_cpds(cpd_rain0, cpd_umb0, cpd_rain1, cpd_umb1)
    return dbn


class TestDBNStructure:
    def test_nodes_and_slices(self):
        dbn = weather_dbn()
        assert set(dbn._nodes()) == {"rain", "umbrella"}
        assert set(dbn.get_interface_nodes(0)) == {("rain", 0)}
        assert (("rain", 0), ("rain", 1)) in dbn.get_inter_edges()
        assert dbn.check_model()

    def test_intra_edges_mirrored(self):
        dbn = weather_dbn()
        assert dbn.has_edge(("rain", 1), ("umbrella", 1))

    def test_get_constant_bn(self):
        bn = weather_dbn().get_constant_bn()
        assert set(bn.nodes()) == {"rain_0", "umbrella_0", "rain_1", "umbrella_1"}
        assert bn.check_model()

    def test_simulate_shape(self):
        df = weather_dbn().simulate(n_samples=200, n_time_slices=3, seed=0, show_progress=False)
        assert ("rain", 2) in df.columns
        assert df.shape[0] == 200

    def test_fit_roundtrip(self):
        dbn = weather_dbn()
        df = dbn.simulate(n_samples=8000, n_time_slices=4, seed=0, show_progress=False)
        learned = DynamicBayesianNetwork(
            [(("rain", 0), ("umbrella", 0)), (("rain", 0), ("rain", 1))]
        )
        learned.fit(df)
        cpd = learned.get_cpds(("rain", 1))
        vals = cpd.get_values()
        # transition matrix approx [[0.7, 0.3], [0.3, 0.7]]
        np.testing.assert_allclose(vals, [[0.7, 0.3], [0.3, 0.7]], atol=0.05)


class TestDBNInference:
    def oracle(self, dbn, var, evidence, n_slices):
        """Unrolled-VE oracle."""
        infer = DBNInference(dbn)
        bn = infer._unrolled(n_slices)
        ve = VariableElimination(bn)
        str_ev = {f"{k[0]}_{k[1]}": v for k, v in evidence.items()}
        return np.asarray(
            ve.query([f"{var[0]}_{var[1]}"], evidence=str_ev, show_progress=False).values
        )

    def test_forward_filtering_matches_unrolled(self):
        dbn = weather_dbn()
        infer = DBNInference(dbn)
        evidence = {("umbrella", 0): 1, ("umbrella", 1): 1, ("umbrella", 2): 0}
        res = infer.forward_inference([("rain", 2)], evidence=evidence)
        expected = self.oracle(dbn, ("rain", 2), evidence, 3)
        np.testing.assert_allclose(
            np.asarray(res[("rain", 2)].values), expected, atol=1e-5
        )

    def test_forward_no_evidence(self):
        dbn = weather_dbn()
        infer = DBNInference(dbn)
        res = infer.forward_inference([("rain", 1)])
        np.testing.assert_allclose(np.asarray(res[("rain", 1)].values), [0.5, 0.5], atol=1e-5)

    def test_backward_smoothing(self):
        dbn = weather_dbn()
        infer = DBNInference(dbn)
        evidence = {("umbrella", 1): 1}
        res = infer.query([("rain", 0)], evidence=evidence)
        expected = self.oracle(dbn, ("rain", 0), evidence, 2)
        np.testing.assert_allclose(
            np.asarray(res[("rain", 0)].values), expected, atol=1e-5
        )


class TestParticleFilter:
    def test_filtering_close_to_exact(self):
        dbn = weather_dbn()
        pf = ParticleFilter(dbn, n_particles=8192)
        evidence = {("umbrella", 1): 1, ("umbrella", 2): 1}
        marginals, particles, ess = pf.filter(evidence=evidence, n_time_slices=3, seed=0)
        infer = DBNInference(dbn)
        exact = infer.forward_inference([("rain", 2)], evidence=evidence)
        np.testing.assert_allclose(
            marginals[("rain", 2)],
            np.asarray(exact[("rain", 2)].values),
            atol=0.03,
        )
        assert particles.shape == (8192, 2)
        assert np.all(ess > 0)


class TestForwardScan:
    def test_scan_matches_eager_filtering(self):
        dbn = weather_dbn()
        infer = DBNInference(dbn)
        evidence = {("umbrella", 1): 1, ("umbrella", 2): 1, ("umbrella", 3): 0}
        scan_out = infer.forward_scan(["rain"], evidence=evidence, n_time_slices=4)
        for t in [1, 2, 3]:
            eager = infer.forward_inference([("rain", t)], evidence={
                k: v for k, v in evidence.items() if k[1] <= t
            })
            np.testing.assert_allclose(
                scan_out[("rain", t)],
                np.asarray(eager[("rain", t)].values),
                atol=1e-5,
                err_msg=f"slice {t}",
            )

    def test_scan_long_horizon(self):
        dbn = weather_dbn()
        infer = DBNInference(dbn)
        out = infer.forward_scan(["rain"], evidence={}, n_time_slices=200)
        # no-evidence chain converges to the stationary distribution (0.5, 0.5)
        np.testing.assert_allclose(out[("rain", 199)], [0.5, 0.5], atol=1e-4)
