"""Tests for the long-tail components: NoisyOR, Mplp, FG-BP, SEM,
FunctionalBN, ADMG/MAG, MirrorDescent, ExpertInLoop, prediction."""

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.base import ADMG, DAG, MAG
from pgmpy_tpu.factors import (
    DiscreteFactor,
    FunctionalCPD,
    NoisyORCPD,
    TabularCPD,
)
from pgmpy_tpu.factors.distributions import Normal
from pgmpy_tpu.inference import (
    BeliefPropagationWithMessagePassing,
    Mplp,
    VariableElimination,
)
from pgmpy_tpu.models import (
    DiscreteBayesianNetwork,
    DiscreteMarkovNetwork,
    FactorGraph,
    FunctionalBayesianNetwork,
    SEM,
    SEMGraph,
)


class TestNoisyOR:
    def test_table(self):
        cpd = NoisyORCPD("y", [0.8, 0.6], evidence=["a", "b"])
        vals = cpd.get_values()
        # both parents True (state 0): P(True) = 1 - 0.2*0.4 = 0.92
        assert vals[0, 0] == pytest.approx(0.92)
        # only a True: 0.8 ; only b True: 0.6 ; none: 0
        assert vals[0, 1] == pytest.approx(0.8)
        assert vals[0, 2] == pytest.approx(0.6)
        assert vals[0, 3] == pytest.approx(0.0)

    def test_validation(self):
        with pytest.raises(ValueError):
            NoisyORCPD("y", [0.5], evidence=["a", "b"])
        with pytest.raises(ValueError):
            NoisyORCPD("y", [1.5, 0.2], evidence=["a", "b"])


class TestMplp:
    def test_map_matches_exact(self):
        rng = np.random.default_rng(0)
        mn = DiscreteMarkovNetwork([("a", "b"), ("b", "c")])
        factors = [
            DiscreteFactor(["a"], [2], rng.random(2) + 0.1),
            DiscreteFactor(["b"], [2], rng.random(2) + 0.1),
            DiscreteFactor(["c"], [2], rng.random(2) + 0.1),
            DiscreteFactor(["a", "b"], [2, 2], rng.random(4) + 0.1),
            DiscreteFactor(["b", "c"], [2, 2], rng.random(4) + 0.1),
        ]
        mn.add_factors(*factors)
        mplp = Mplp(mn)
        result = mplp.map_query()
        # brute-force MAP
        from pgmpy_tpu.factors import factor_product

        joint = factor_product(*factors)
        flat = int(np.argmax(np.asarray(joint.values)))
        idx = np.unravel_index(flat, np.asarray(joint.values).shape)
        expected = {var: int(i) for var, i in zip(joint.variables, idx)}
        assert result == expected
        assert mplp.get_integrality_gap() < 0.01


class TestFactorGraphBP:
    def test_tree_marginals_exact(self):
        rng = np.random.default_rng(0)
        fg = FactorGraph()
        fg.add_nodes_from(["a", "b", "c"])
        phi1 = DiscreteFactor(["a", "b"], [2, 2], rng.random(4) + 0.1)
        phi2 = DiscreteFactor(["b", "c"], [2, 2], rng.random(4) + 0.1)
        fg.add_factors(phi1, phi2)
        fg.add_edges_from([("a", phi1), ("b", phi1), ("b", phi2), ("c", phi2)])
        bp = BeliefPropagationWithMessagePassing(fg)
        res = bp.query(["a", "c"])
        from pgmpy_tpu.factors import factor_product

        joint = factor_product(phi1, phi2)
        for var in ["a", "c"]:
            expected = joint.marginalize(
                [v for v in joint.variables if v != var], inplace=False
            ).normalize(inplace=False)
            assert res[var] == expected

    def test_with_evidence(self):
        rng = np.random.default_rng(1)
        fg = FactorGraph()
        fg.add_nodes_from(["a", "b"])
        phi = DiscreteFactor(["a", "b"], [2, 2], rng.random(4) + 0.1)
        fg.add_factors(phi)
        fg.add_edges_from([("a", phi), ("b", phi)])
        bp = BeliefPropagationWithMessagePassing(fg)
        res = bp.query(["a"], evidence={"b": 1})
        expected = phi.reduce([("b", 1)], inplace=False).normalize(inplace=False)
        assert res["a"] == expected


class TestSEM:
    def test_semgraph_structure(self):
        sem = SEMGraph(
            ebunch=[("x", "y"), ("z", "x"), ("z", "y")],
            latents=[],
            err_corr=[("x", "y")],
        )
        assert set(sem.observed) == {"x", "y", "z"}
        alg = sem.to_lisrel()
        assert alg.B_mask.sum() == 3
        # err_corr adds 2 off-diagonal entries
        assert alg.S_mask.sum() == 3 + 2

    def test_sem_fit_recovers_coefficients(self):
        rng = np.random.default_rng(0)
        n = 5000
        z = rng.normal(size=n)
        x = 0.7 * z + rng.normal(size=n) * 0.5
        y = 1.5 * x + 0.5 * z + rng.normal(size=n) * 0.5
        data = pd.DataFrame({"x": x, "y": y, "z": z})
        sem = SEM.from_graph(ebunch=[("z", "x"), ("x", "y"), ("z", "y")])
        summary = sem.fit(data, method="ml", max_iter=3000, lr=0.05)
        variables = summary["variables"]
        B = summary["B"]
        ix, iy, iz = (variables.index(v) for v in ["x", "y", "z"])
        assert B[iy, ix] == pytest.approx(1.5, abs=0.1)
        assert B[ix, iz] == pytest.approx(0.7, abs=0.1)

    def test_iv_estimator(self):
        from pgmpy_tpu.estimators.sem_estimator import IVEstimator

        rng = np.random.default_rng(0)
        n = 20000
        i = rng.normal(size=n)
        u = rng.normal(size=n)
        x = 0.8 * i + u + rng.normal(size=n) * 0.3
        y = 2.0 * x + 1.0 * u + rng.normal(size=n) * 0.3
        data = pd.DataFrame({"i": i, "x": x, "y": y})
        dag = DAG([("i", "x"), ("u", "x"), ("u", "y"), ("x", "y")], latents=["u"])
        effect, info = IVEstimator(dag).fit("x", "y", data)
        assert info["ivs"] == ["i"]
        assert effect == pytest.approx(2.0, abs=0.1)


class TestFunctionalBN:
    def test_simulate_and_loglik(self):
        fbn = FunctionalBayesianNetwork([("x", "y")])
        fbn.add_cpds(
            FunctionalCPD("x", lambda p: Normal(0.0, 1.0)),
            FunctionalCPD("y", lambda p: Normal(2.0 * p["x"], 0.5), parents=["x"]),
        )
        df = fbn.simulate(n_samples=2000, seed=0)
        assert df.shape == (2000, 2)
        slope = np.polyfit(df["x"], df["y"], 1)[0]
        assert slope == pytest.approx(2.0, abs=0.1)
        assert np.isfinite(fbn.log_likelihood(df.iloc[:50]))

    def test_fit_mle(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        n = 3000
        x = rng.normal(size=n)
        y = 1.7 * x + rng.normal(size=n) * 0.5
        data = pd.DataFrame({"x": x, "y": y})
        fbn = FunctionalBayesianNetwork([("x", "y")])

        def make_cpds(params):
            return {
                "x": lambda pv: Normal(params["mu_x"], jnp.exp(params["log_sx"])),
                "y": lambda pv: Normal(
                    params["slope"] * pv["x"], jnp.exp(params["log_sy"])
                ),
            }

        params = fbn.fit(
            data, make_cpds,
            init_params={"mu_x": 0.0, "log_sx": 0.0, "slope": 0.0, "log_sy": 0.0},
            max_iter=1500,
        )
        assert float(params["slope"]) == pytest.approx(1.7, abs=0.05)


class TestADMGMAG:
    def test_admg_districts_and_msep(self):
        admg = ADMG(
            directed_ebunch=[("x", "y")],
            bidirected_ebunch=[("y", "z")],
        )
        assert admg.district("y") == frozenset({"y", "z"})
        # x and z are m-connected through y? x -> y <-> z : collider at y
        assert admg.is_mseparated("x", "z", [])
        assert not admg.is_mseparated("x", "z", ["y"])

    def test_mag_ancestral_and_maximal(self):
        mag = MAG(directed_ebunch=[("a", "b")], bidirected_ebunch=[("b", "c")])
        assert mag.is_ancestral()
        # b -> m -> c with b <-> c: b is an ancestor of its spouse c
        bad = MAG(directed_ebunch=[("b", "m"), ("m", "c")],
                  bidirected_ebunch=[("b", "c")])
        assert not bad.is_ancestral()


class TestMirrorDescent:
    def test_fits_marginals(self):
        from pgmpy_tpu.estimators import MirrorDescentEstimator

        rng = np.random.default_rng(0)
        data = pd.DataFrame(
            {"a": rng.integers(0, 2, 2000), "b": rng.integers(0, 2, 2000)}
        )
        data["b"] = np.where(rng.random(2000) < 0.8, data["a"], data["b"])
        mn = DiscreteMarkovNetwork([("a", "b")])
        mn.add_factors(DiscreteFactor(["a", "b"], [2, 2], np.ones(4)))
        est = MirrorDescentEstimator(mn, data)
        jt = est.estimate(iterations=300, show_progress=False)
        bp = est.belief_propagation
        clique = next(iter(bp.clique_beliefs))
        model_marg = np.asarray(
            bp.clique_beliefs[clique].normalize(inplace=False).values
        )
        emp = est.observed_marginals[tuple(clique)]
        emp_vals = np.asarray(emp.values, dtype=np.float64)
        emp_vals = emp_vals / emp_vals.sum()
        perm = [bp.clique_beliefs[clique].variables.index(v) for v in emp.variables]
        np.testing.assert_allclose(
            np.transpose(model_marg, np.argsort(perm)), emp_vals, atol=0.05
        )


    def test_l1_variant_and_multiclique(self):
        from pgmpy_tpu.estimators import MirrorDescentEstimator
        from pgmpy_tpu.models import JunctionTree

        rng = np.random.default_rng(1)
        df = pd.DataFrame({k: rng.integers(0, 2, 3000) for k in "abc"})
        df["b"] = np.where(rng.random(3000) < 0.7, df["a"], df["b"])
        df["c"] = np.where(rng.random(3000) < 0.6, df["b"], df["c"])
        jt = JunctionTree()
        jt.add_edge(("a", "b"), ("b", "c"))
        jt.add_factors(
            DiscreteFactor(["a", "b"], [2, 2], np.ones(4)),
            DiscreteFactor(["b", "c"], [2, 2], np.ones(4)),
        )
        est = MirrorDescentEstimator(jt, data=df)
        est.estimate(metric="L1", iterations=400, show_progress=False)
        bp = est.belief_propagation
        for clique, belief in bp.clique_beliefs.items():
            model_marg = np.asarray(belief.normalize(inplace=False).values,
                                    dtype=np.float64)
            emp = est.observed_marginals[tuple(clique)]
            emp_vals = np.asarray(emp.values, dtype=np.float64)
            emp_vals = emp_vals / emp_vals.sum()
            perm = [belief.variables.index(v) for v in emp.variables]
            np.testing.assert_allclose(
                np.transpose(model_marg, np.argsort(perm)), emp_vals,
                atol=0.08)

    def test_program_not_rebuilt_per_iteration(self):
        # the calibration program must compile ONCE (r3 perf fix): patch
        # the executor factory and count invocations
        from unittest import mock

        from pgmpy_tpu.estimators import MirrorDescentEstimator
        from pgmpy_tpu.inference.bp import JunctionTreeProgram

        rng = np.random.default_rng(2)
        data = pd.DataFrame(
            {"a": rng.integers(0, 2, 500), "b": rng.integers(0, 2, 500)}
        )
        mn = DiscreteMarkovNetwork([("a", "b")])
        mn.add_factors(DiscreteFactor(["a", "b"], [2, 2], np.ones(4)))
        est = MirrorDescentEstimator(mn, data)
        with mock.patch.object(
            JunctionTreeProgram, "executor",
            side_effect=JunctionTreeProgram.executor, autospec=True,
        ) as spy:
            est.estimate(iterations=25, show_progress=False)
        # once for the loop + once for the final calibrated BP
        assert spy.call_count <= 3


class TestExpertInLoop:
    def test_with_callback(self):
        from pgmpy_tpu.estimators import ExpertInLoop

        rng = np.random.default_rng(0)
        n = 3000
        a = rng.normal(size=n)
        b = 1.2 * a + rng.normal(size=n) * 0.4
        data = pd.DataFrame({"a": a, "b": b})
        calls = []

        def orient(u, v, desc):
            calls.append((u, v))
            return ("a", "b")

        dag = ExpertInLoop(data).estimate(orient_fn=orient)
        assert ("a", "b") in dag.edges()
        assert calls


class TestPrediction:
    def test_naive_adjustment_regressor(self):
        from pgmpy_tpu.prediction import NaiveAdjustmentRegressor

        rng = np.random.default_rng(0)
        n = 10000
        z = rng.normal(size=n)
        x = 0.8 * z + rng.normal(size=n) * 0.5
        y = 2.0 * x + 1.5 * z + rng.normal(size=n) * 0.5
        data = pd.DataFrame({"x": x, "z": z})
        target = pd.Series(y)
        graph = DAG(
            [("z", "x"), ("z", "y"), ("x", "y")],
            roles={"exposure": "x", "outcome": "y", "adjustment": ["z"]},
        )
        reg = NaiveAdjustmentRegressor(causal_graph=graph)
        reg.fit(data, target)
        assert reg.feature_columns_ == ["x", "z"]
        # the exposure coefficient recovers the true causal effect
        assert reg.estimator_.coef_[0] == pytest.approx(2.0, abs=0.05)
        assert reg.score(data, target) > 0.8
        assert reg.explanation_.startswith("NaiveAdjustmentRegressor(exposure=x")
        # roles only — no re-derivation: adjustment comes from the graph role
        assert reg.adjustment_vars_ == ["z"]
        preds = reg.predict(data)
        assert preds.shape == (n,)


class TestMplpTightening:
    def test_frustrated_cycle_needs_triplets(self):
        """Anti-ferromagnetic 3-cycle: plain pairwise LP is loose (dual=3w),
        triplet tightening closes the gap to the true MAP value (2w)."""
        w = 1.0
        disagree = np.exp(np.array([[0.0, w], [w, 0.0]]))
        mn = DiscreteMarkovNetwork([("a", "b"), ("b", "c"), ("a", "c")])
        for edge in [("a", "b"), ("b", "c"), ("a", "c")]:
            mn.add_factors(DiscreteFactor(list(edge), [2, 2], disagree.ravel()))
        mplp = Mplp(mn)
        result = mplp.map_query(tighten_triplet=True)
        # optimal: exactly one agreeing edge -> value 2w
        from pgmpy_tpu.factors import factor_product

        joint = factor_product(*mn.factors)
        best = float(np.max(np.log(np.asarray(joint.values))))
        got = mplp.best_decoded_value
        assert got == pytest.approx(best, abs=1e-6)
        assert mplp.get_integrality_gap() < 1e-3

    def test_plain_mplp_loose_without_tightening(self):
        w = 1.0
        disagree = np.exp(np.array([[0.0, w], [w, 0.0]]))
        mn = DiscreteMarkovNetwork([("a", "b"), ("b", "c"), ("a", "c")])
        for edge in [("a", "b"), ("b", "c"), ("a", "c")]:
            mn.add_factors(DiscreteFactor(list(edge), [2, 2], disagree.ravel()))
        mplp = Mplp(mn)
        mplp.map_query(tighten_triplet=False)
        # the pairwise relaxation keeps a gap of about w
        assert mplp.get_integrality_gap() > 0.5
