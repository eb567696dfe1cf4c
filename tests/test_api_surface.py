"""Tests for reference-parity API surface added after the systematic
method-level audit against the reference classes."""

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.factors import DiscreteFactor, FactorDict, TabularCPD
from pgmpy_tpu.factors.continuous import LinearGaussianCPD
from pgmpy_tpu.inference import ApproxInference, Mplp
from pgmpy_tpu.inference.fg_bp import BeliefPropagationWithMessagePassing
from pgmpy_tpu.models import DiscreteBayesianNetwork, DiscreteMarkovNetwork, FactorGraph
from pgmpy_tpu.sampling import BayesianModelInference, BayesianModelSampling, GibbsSampling


def _model():
    model = DiscreteBayesianNetwork([("A", "C"), ("B", "C")])
    model.add_cpds(
        TabularCPD("A", 2, [[0.3], [0.7]]),
        TabularCPD("B", 3, [[0.2], [0.5], [0.3]]),
        TabularCPD("C", 2,
                   [[0.1, 0.2, 0.3, 0.4, 0.5, 0.6],
                    [0.9, 0.8, 0.7, 0.6, 0.5, 0.4]],
                   evidence=["A", "B"], evidence_card=[2, 3]))
    return model


class TestPreComputeReduce:
    def test_reduce_values(self):
        inference = BayesianModelInference(_model())
        cached = inference.pre_compute_reduce("C")
        # evidence order is REVERSED (B, A) per the reference
        # combination (b=1, a=0) -> column a=0,b=1 of the 2-D layout
        np.testing.assert_allclose(cached[(1, 0)], [0.2, 0.8])
        np.testing.assert_allclose(cached[(2, 1)], [0.6, 0.4])
        assert len(cached) == 6

    def test_reduce_maps(self):
        inference = BayesianModelInference(_model())
        state_to_index, index_to_weight = inference.pre_compute_reduce_maps("C")
        assert len(state_to_index) == 6
        for sc, idx in state_to_index.items():
            a, b = sc  # evidence order (A, B) here: non-latent parents
            col = a * 3 + b
            want = np.array([[0.1, 0.2, 0.3, 0.4, 0.5, 0.6],
                             [0.9, 0.8, 0.7, 0.6, 0.5, 0.4]])[:, col]
            np.testing.assert_allclose(index_to_weight[idx], want)

    def test_sampling_class_delegates(self):
        s = BayesianModelSampling(_model())
        assert len(s.pre_compute_reduce("C")) == 6


class TestApproxMapQuery:
    def test_matches_exact_argmax(self):
        model = _model()
        got = ApproxInference(model).map_query(
            ["A", "B"], n_samples=30_000, seed=0, show_progress=False)
        # exact: argmax of P(A)P(B)
        assert got == {"A": 1, "B": 1}


class TestFGBPMessages:
    def test_variable_node_message(self):
        fg = FactorGraph()
        fg.add_nodes_from(["a"])
        f = DiscreteFactor(["a"], [2], [1.0, 1.0])
        fg.add_factors(f)
        fg.add_edges_from([("a", f)])
        bp = BeliefPropagationWithMessagePassing(fg)
        out = bp.calc_variable_node_message("a", [np.array([0.2, 0.8]),
                                                 np.array([0.5, 0.5])])
        np.testing.assert_allclose(out, [0.2, 0.8])
        out1 = bp.calc_variable_node_message("a", [np.array([0.3, 0.7])])
        np.testing.assert_allclose(out1, [0.3, 0.7])

    def test_factor_node_message(self):
        f = DiscreteFactor(["a", "b"], [2, 2], [1.0, 2.0, 3.0, 4.0])
        msg = BeliefPropagationWithMessagePassing.calc_factor_node_message(
            f, [np.array([0.5, 0.5])], "b")
        # sum_a f(a,b) * m(a) -> [0.5*1+0.5*3, 0.5*2+0.5*4] = [2, 3] -> /5
        np.testing.assert_allclose(msg, [0.4, 0.6])


class TestMplpSurface:
    def _mn(self):
        mn = DiscreteMarkovNetwork([("a", "b"), ("b", "c"), ("a", "c")])
        for u, v in mn.edges():
            mn.add_factors(DiscreteFactor([u, v], [2, 2], [1.0, 2.0, 3.0, 4.0]))
        return mn

    def test_find_triangles(self):
        mplp = Mplp(self._mn())
        tris = mplp.find_triangles()
        assert sorted(map(sorted, tris)) == [["a", "b", "c"]]

    def test_query_raises(self):
        with pytest.raises(NotImplementedError):
            Mplp(self._mn()).query()

    def test_cluster_inner_class(self):
        f = DiscreteFactor(["a", "b"], [2, 2], [1.0, 2.0, 3.0, 4.0])
        cluster = Mplp.Cluster([frozenset(["a"])], f)
        assert cluster.cluster_variables == frozenset(["a", "b"])


class TestGibbsChainSurface:
    def test_inherits_markov_chain(self):
        from pgmpy_tpu.models import MarkovChain

        gibbs = GibbsSampling(_model())
        assert isinstance(gibbs, MarkovChain)
        assert hasattr(gibbs, "add_transition_model")
        assert hasattr(gibbs, "prob_from_sample")

    def test_is_stationarity_runs(self):
        gibbs = GibbsSampling(_model())
        sample = gibbs.sample(size=600, seed=0)
        assert gibbs.is_stationarity(sample=sample) in (True, False)


class TestSEMInitValues:
    def test_shapes_and_methods(self):
        from pgmpy_tpu.estimators.sem_estimator import SEMEstimator
        from pgmpy_tpu.models import SEMGraph

        g = SEMGraph(ebunch=[("x", "y")], err_var={"x": 1.0, "y": 1.0})
        est = SEMEstimator(g)
        data = pd.DataFrame({"x": np.random.default_rng(0).normal(size=50),
                             "y": np.random.default_rng(1).normal(size=50)})
        for method in ("random", "std"):
            B, zeta = est.get_init_values(data, method=method, seed=0)
            n = len(est.alg.variables)
            assert B.shape == (n, n) and zeta.shape == (n, n)
        with pytest.raises(NotImplementedError):
            est.get_init_values(data, method="iv")


class TestSmallSurface:
    def test_factor_dict_get_factors(self):
        f = DiscreteFactor(["a"], [2], [0.5, 0.5])
        fd = FactorDict({("a",): f})
        assert fd.get_factors() == {f}

    def test_lgcpd_is_valid(self):
        assert LinearGaussianCPD("x", [0.0], 1.0).is_valid_cpd()

    def test_independencies_factorized_product_stub(self):
        from pgmpy_tpu.independencies import Independencies

        assert Independencies().get_factorized_product() is None

    def test_writer_write_alias(self, tmp_path):
        from pgmpy_tpu.readwrite import BIFWriter

        model = _model()
        path = str(tmp_path / "m.bif")
        BIFWriter(model).write(path)
        from pgmpy_tpu.readwrite import BIFReader

        assert set(BIFReader(path=path).get_variables()) == {"A", "B", "C"}

    def test_bif_writer_introspection(self):
        from pgmpy_tpu.readwrite import BIFWriter

        w = BIFWriter(_model())
        assert w.get_variables() == ["A", "B", "C"]
        assert w.get_parents()["C"] == ["A", "B"]
        assert w.get_states()["B"] == ["0", "1", "2"]
        assert w.get_cpds()["A"].shape == (2, 1)

    def test_uai_writer_introspection(self):
        from pgmpy_tpu.readwrite import UAIWriter

        w = UAIWriter(_model())
        assert w.get_nodes() == {"A": "2", "B": "3", "C": "2"}
        # canonical var order is (card, name)-sorted: A=0, C=1, B=2; the
        # scope lists reversed evidence [B, A] then the child C
        assert w.get_functions()[2] == [2, 0, 1]
        assert len(w.get_tables()[2]) == 12

    def test_xbn_writer_setters(self):
        from pgmpy_tpu.readwrite import XBNReader, XBNWriter

        w = XBNWriter(_model())
        w.set_bnmodel_name("renamed")
        w.set_analysisnotebook(NAME="nb2")
        again = XBNReader(string=str(w))
        assert again.get_bnmodel_name() == "renamed"
        assert again.get_analysisnotebook_values()["NAME"] == "nb2"

    def test_pomdpx_section_strings(self):
        from pgmpy_tpu.readwrite import PomdpXWriter

        data = {
            "description": "t", "discount": 0.9,
            "variables": {"StateVar": [
                {"vnamePrev": "s0", "vnameCurr": "s1",
                 "ValueEnum": ["a", "b"], "fullyObs": True}],
                "ObsVar": [], "ActionVar": [], "RewardVar": []},
            "initial_state_belief": [
                {"Var": "s0", "Parent": ["null"], "Type": "TBL",
                 "Parameter": [{"Instance": ["-"],
                                "ProbTable": ["0.5", "0.5"]}]}],
            "state_transition_function": [], "obs_function": [],
            "reward_function": [],
        }
        w = PomdpXWriter(data)
        assert "<Variable>" in w.get_variables()
        assert "InitialStateBelief" in w.add_initial_belief()
        assert w.add_obs_function() == ""


class TestRound2SurfaceAdditions:
    """Residual reference-surface items closed in the round-2 audit."""

    def test_state_namedtuple(self):
        from pgmpy_tpu.utils import State

        s = State("a", 1)
        assert s.var == "a" and s.state == 1
        assert tuple(s) == ("a", 1)

    def test_manual_pairwise_orient(self, monkeypatch):
        from pgmpy_tpu.utils import manual_pairwise_orient

        answers = iter(["1", "2", "3"])
        monkeypatch.setattr("builtins.input", lambda *_: next(answers))
        assert manual_pairwise_orient("x", "y") == ("x", "y")
        assert manual_pairwise_orient("x", "y") == ("y", "x")
        assert manual_pairwise_orient("x", "y") is None

    def test_llm_pairwise_orient_injectable_transport(self):
        # litellm-shaped adapter: transport injectable, 1/2 answer parsed
        from types import SimpleNamespace

        from pgmpy_tpu.utils import llm_pairwise_orient

        prompts = []

        def fake_completion(model, messages):
            prompts.append(messages[0]["content"])
            return SimpleNamespace(
                choices=[SimpleNamespace(message=SimpleNamespace(content="2"))]
            )

        out = llm_pairwise_orient(
            "x", "y", {"x": "var x", "y": "var y"},
            completion_fn=fake_completion,
        )
        assert out == ("y", "x")
        assert "var x" in prompts[0] and "var y" in prompts[0]
        # without a transport and without litellm installed -> ImportError
        with pytest.raises(ImportError):
            llm_pairwise_orient("x", "y", {"x": "a", "y": "b"})

    def test_functional_bn_inherits_discrete_surface(self):
        from pgmpy_tpu.models import (
            DiscreteBayesianNetwork,
            FunctionalBayesianNetwork,
        )

        fbn = FunctionalBayesianNetwork([("a", "b")])
        assert isinstance(fbn, DiscreteBayesianNetwork)
        for attr in (
            "fit_update", "get_cardinality", "predict", "save", "load",
            "states", "to_junction_tree", "to_markov_model", "is_imap",
        ):
            assert hasattr(fbn, attr)

    def test_semalg_set_params_generate_samples(self):
        from pgmpy_tpu.models import SEM

        # x -> y with coefficient 0.8, unit error variances
        sem = SEM.from_graph(ebunch=[("x", "y", 0.8)], latents=[])
        alg = sem.to_lisrel()
        n = len(alg.variables)
        B = np.zeros((n, n))
        ix, iy = alg.variables.index("x"), alg.variables.index("y")
        B[iy, ix] = 0.8
        S = np.eye(n)
        alg.set_params(B, S)
        df = alg.generate_samples(n_samples=20000, seed=7)
        assert set(df.columns) == {"x", "y"}
        # implied cov: var(x)=1, cov(x,y)=0.8, var(y)=0.8^2+1
        cov = np.cov(df["x"], df["y"])
        np.testing.assert_allclose(cov[0, 0], 1.0, atol=0.05)
        np.testing.assert_allclose(cov[0, 1], 0.8, atol=0.05)
        np.testing.assert_allclose(cov[1, 1], 1.64, atol=0.08)

    def test_semalg_generate_samples_requires_params(self):
        from pgmpy_tpu.models.sem import SEMAlg

        alg = SEMAlg(
            ["x"], np.zeros((1, 1)), None, np.eye(1), None, ["x"]
        )
        with pytest.raises(ValueError, match="not been specified"):
            alg.generate_samples()

    def test_bif_blocks_and_templates(self):
        from pgmpy_tpu.readwrite import BIFReader, BIFWriter

        w = BIFWriter(_model())
        text = w.get_string()
        templates = w.BIF_templates()
        assert len(templates) == 6
        r = BIFReader(string=text)
        vblocks = list(r.variable_block())
        pblocks = list(r.probability_block())
        assert len(vblocks) == len(r.get_variables())
        assert len(pblocks) == len(r.get_variables())
        assert all(b.startswith("variable") for b in vblocks)
        assert r.get_variable_grammar() is not None
        assert r.get_probability_grammar() is not None

    def test_net_templates_and_net_cpd(self):
        from pgmpy_tpu.readwrite import NETReader, NETWriter

        w = NETWriter(_model())
        assert len(w.NET_templates()) == 4
        data = w.net_cpd(_model().nodes().__iter__().__next__())
        assert data.startswith("(") and data.endswith(")")
        r = NETReader(string=w.get_string())
        assert r.get_variable_grammar() is not None
        assert r.get_probability_grammar() is not None

    def test_uai_get_grammar(self):
        from pgmpy_tpu.readwrite import UAIReader, UAIWriter

        w = UAIWriter(_model())
        r = UAIReader(string=w.get_string())
        assert r.get_grammar().findall("a b  c") == ["a", "b", "c"]

    def test_xml_indent_roundtrip(self):
        from pgmpy_tpu.readwrite import (
            XBNReader,
            XBNWriter,
            XMLBIFReader,
            XMLBIFWriter,
        )

        m = _model()
        xml_text = str(XMLBIFWriter(m, prettyprint=True))
        assert "\n  " in xml_text  # actually indented
        m2 = XMLBIFReader(string=xml_text).get_model()
        assert set(m2.edges()) == set(m.edges())
        xbn_text = str(XBNWriter(m, prettyprint=True))
        m3 = XBNReader(string=xbn_text).get_model()
        assert set(m3.edges()) == set(m.edges())
