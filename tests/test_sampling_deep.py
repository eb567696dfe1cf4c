"""Deep sampling tests: statistical parity against independent oracles.

Mirrors the reference sampling suite depth
(/root/reference/pgmpy/tests/test_sampling/test_Sampling.py, 659 LoC):
forward/rejection/likelihood-weighted marginals against the brute-force
joint enumeration oracle, hand-computed LW weights, Markov-chain
stationary distributions against the transition-matrix eigenvector, and
Gibbs mixing against exact conditionals.
"""

import itertools

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.models import DiscreteBayesianNetwork, MarkovChain
from pgmpy_tpu.sampling import BayesianModelSampling, GibbsSampling


def _wet_grass():
    model = DiscreteBayesianNetwork(
        [("cloudy", "sprinkler"), ("cloudy", "rain"),
         ("sprinkler", "wet"), ("rain", "wet")])
    model.add_cpds(
        TabularCPD("cloudy", 2, [[0.5], [0.5]],
                   state_names={"cloudy": ["yes", "no"]}),
        TabularCPD("sprinkler", 2, [[0.1, 0.5], [0.9, 0.5]],
                   evidence=["cloudy"], evidence_card=[2],
                   state_names={"sprinkler": ["on", "off"],
                                "cloudy": ["yes", "no"]}),
        TabularCPD("rain", 2, [[0.8, 0.2], [0.2, 0.8]],
                   evidence=["cloudy"], evidence_card=[2],
                   state_names={"rain": ["yes", "no"],
                                "cloudy": ["yes", "no"]}),
        TabularCPD("wet", 2,
                   [[0.99, 0.9, 0.9, 0.01], [0.01, 0.1, 0.1, 0.99]],
                   evidence=["sprinkler", "rain"], evidence_card=[2, 2],
                   state_names={"wet": ["yes", "no"],
                                "sprinkler": ["on", "off"],
                                "rain": ["yes", "no"]}))
    return model


def _oracle_joint(model):
    nodes = sorted(model.nodes(), key=str)
    states = {n: model.get_cpds(n).state_names[n] for n in nodes}
    joint = {}
    for combo in itertools.product(*(states[n] for n in nodes)):
        assignment = dict(zip(nodes, combo))
        p = 1.0
        for n in nodes:
            cpd = model.get_cpds(n)
            vals = np.asarray(cpd.get_values(), dtype=np.float64)
            row = cpd.state_names[n].index(assignment[n])
            col = 0
            for ev in cpd.variables[1:]:
                col = col * len(cpd.state_names[ev]) + \
                    cpd.state_names[ev].index(assignment[ev])
            p *= vals[row, col]
        joint[combo] = p
    return nodes, joint


def _oracle_conditional(model, var, evidence):
    nodes, joint = _oracle_joint(model)
    states = model.get_cpds(var).state_names[var]
    out = np.zeros(len(states))
    for combo, p in joint.items():
        assignment = dict(zip(nodes, combo))
        if all(assignment[k] == v for k, v in evidence.items()):
            out[states.index(assignment[var])] += p
    return out / out.sum()


class TestForwardSampling:
    def test_marginals(self):
        model = _wet_grass()
        df = BayesianModelSampling(model).forward_sample(
            size=50_000, seed=0, show_progress=False)
        for var in model.nodes():
            want = _oracle_conditional(model, var, {})
            got = df[var].value_counts(normalize=True)
            states = model.get_cpds(var).state_names[var]
            for j, s in enumerate(states):
                assert got.get(s, 0.0) == pytest.approx(want[j], abs=0.01)

    def test_pairwise_joint(self):
        model = _wet_grass()
        df = BayesianModelSampling(model).forward_sample(
            size=50_000, seed=1, show_progress=False)
        # joint P(sprinkler=on, rain=yes) = sum_c P(c)P(s|c)P(r|c)
        want = 0.5 * 0.1 * 0.8 + 0.5 * 0.5 * 0.2
        got = ((df["sprinkler"] == "on") & (df["rain"] == "yes")).mean()
        assert got == pytest.approx(want, abs=0.01)

    def test_seed_reproducible(self):
        model = _wet_grass()
        s = BayesianModelSampling(model)
        a = s.forward_sample(size=100, seed=42, show_progress=False)
        b = s.forward_sample(size=100, seed=42, show_progress=False)
        pd.testing.assert_frame_equal(a, b)

    def test_partial_samples_respected(self):
        model = _wet_grass()
        s = BayesianModelSampling(model)
        partial = pd.DataFrame({"cloudy": ["yes"] * 2000})
        df = s.forward_sample(size=2000, seed=3, show_progress=False,
                              partial_samples=partial)
        assert (df["cloudy"] == "yes").all()
        want = _oracle_conditional(model, "rain", {"cloudy": "yes"})
        got = (df["rain"] == "yes").mean()
        assert got == pytest.approx(want[0], abs=0.03)


class TestRejectionSampling:
    def test_conditional_marginals(self):
        from pgmpy_tpu.factors import State

        model = _wet_grass()
        df = BayesianModelSampling(model).rejection_sample(
            evidence=[State("wet", "yes")], size=20_000, seed=4,
            show_progress=False)
        assert len(df) == 20_000
        want = _oracle_conditional(model, "rain", {"wet": "yes"})
        got = (df["rain"] == "yes").mean()
        assert got == pytest.approx(want[0], abs=0.015)

    def test_evidence_exact_in_output(self):
        from pgmpy_tpu.factors import State

        model = _wet_grass()
        df = BayesianModelSampling(model).rejection_sample(
            evidence=[State("sprinkler", "on"), State("rain", "no")],
            size=5_000, seed=5, show_progress=False)
        assert (df["sprinkler"] == "on").all()
        assert (df["rain"] == "no").all()


class TestLikelihoodWeighted:
    def test_weights_are_evidence_likelihood(self):
        from pgmpy_tpu.factors import State

        model = _wet_grass()
        df = BayesianModelSampling(model).likelihood_weighted_sample(
            evidence=[State("wet", "yes")], size=5_000, seed=6,
            show_progress=False)
        # weight of each row must equal P(wet=yes | sprinkler, rain) exactly
        table = {("on", "yes"): 0.99, ("on", "no"): 0.9,
                 ("off", "yes"): 0.9, ("off", "no"): 0.01}
        for _, row in df.head(200).iterrows():
            want = table[(row["sprinkler"], row["rain"])]
            assert row["_weight"] == pytest.approx(want, rel=1e-5)

    def test_weighted_estimate_matches_posterior(self):
        from pgmpy_tpu.factors import State

        model = _wet_grass()
        df = BayesianModelSampling(model).likelihood_weighted_sample(
            evidence=[State("wet", "yes")], size=60_000, seed=7,
            show_progress=False)
        w = df["_weight"].to_numpy()
        got = w[(df["rain"] == "yes").to_numpy()].sum() / w.sum()
        want = _oracle_conditional(model, "rain", {"wet": "yes"})[0]
        assert got == pytest.approx(want, abs=0.01)

    def test_root_evidence_weight(self):
        from pgmpy_tpu.factors import State

        model = _wet_grass()
        df = BayesianModelSampling(model).likelihood_weighted_sample(
            evidence=[State("cloudy", "yes")], size=100, seed=8,
            show_progress=False)
        np.testing.assert_allclose(df["_weight"], 0.5, rtol=1e-5)
        assert (df["cloudy"] == "yes").all()


class TestGibbs:
    def test_marginals_match_exact(self):
        model = _wet_grass()
        gibbs = GibbsSampling(model)
        chains = np.asarray(gibbs.sample_chains(
            n_chains=2000, size=60, seed=9))
        # discard burn-in sweeps, pool the rest
        tail = chains[:, 30:, :]
        var_order = gibbs.variables
        for var in ["rain", "wet"]:
            i = var_order.index(var)
            want = _oracle_conditional(model, var, {})
            got = (tail[:, :, i] == 0).mean()
            assert got == pytest.approx(want[0], abs=0.02)

    def test_sample_dataframe_shape(self):
        model = _wet_grass()
        gibbs = GibbsSampling(model)
        df = gibbs.sample(size=50, seed=10)
        assert len(df) == 50
        assert set(df.columns) == set(model.nodes())

    def test_generate_sample_iterator(self):
        model = _wet_grass()
        gibbs = GibbsSampling(model)
        out = list(gibbs.generate_sample(size=5, seed=11))
        assert len(out) == 5


class TestMarkovChain:
    def test_stationary_matches_eigenvector(self):
        chain = MarkovChain(["X"], [3])
        T = {  # column-stochastic dict form {from: {to: p}}
            0: {0: 0.5, 1: 0.4, 2: 0.1},
            1: {0: 0.2, 1: 0.5, 2: 0.3},
            2: {0: 0.3, 1: 0.3, 2: 0.4},
        }
        chain.add_transition_model("X", T)
        chain.set_start_state([("X", 0)])
        df = chain.sample(size=30_000, seed=12)
        # oracle: left eigenvector of the transition matrix
        M = np.array([[T[i][j] for j in range(3)] for i in range(3)])
        vals, vecs = np.linalg.eig(M.T)
        pi = np.real(vecs[:, np.argmax(np.real(vals))])
        pi = pi / pi.sum()
        counts = df["X"].value_counts(normalize=True)
        for j in range(3):
            assert counts.get(j, 0.0) == pytest.approx(pi[j], abs=0.02)

    def test_is_stationarity(self):
        chain = MarkovChain(["X"], [2])
        chain.add_transition_model("X", {0: {0: 0.5, 1: 0.5},
                                         1: {0: 0.5, 1: 0.5}})
        chain.set_start_state([("X", 0)])
        assert chain.is_stationarity()

    def test_multi_variable_chain(self):
        chain = MarkovChain(["A", "B"], [2, 2])
        chain.add_transition_model("A", {0: {0: 0.9, 1: 0.1},
                                         1: {0: 0.1, 1: 0.9}})
        chain.add_transition_model("B", {0: {0: 0.5, 1: 0.5},
                                         1: {0: 0.5, 1: 0.5}})
        chain.set_start_state([("A", 0), ("B", 1)])
        df = chain.sample(size=100, seed=13)
        assert list(df.columns) == ["A", "B"]
        assert len(df) == 100
        assert df.loc[0, "A"] == 0 and df.loc[0, "B"] == 1

    def test_prob_from_sample(self):
        chain = MarkovChain(["X"], [2])
        chain.add_transition_model("X", {0: {0: 0.3, 1: 0.7},
                                         1: {0: 0.7, 1: 0.3}})
        chain.set_start_state([("X", 0)])
        probs = chain.prob_from_sample([("X", 0)])
        assert 0 <= np.mean(probs) <= 1


class TestSimulateExtras:
    def test_virtual_evidence_tilts_marginal(self):
        model = _wet_grass()
        virt = TabularCPD("rain", 2, [[0.95], [0.05]],
                          state_names={"rain": ["yes", "no"]})
        base = model.simulate(n_samples=30_000, seed=14, show_progress=False)
        tilted = model.simulate(n_samples=30_000, seed=14,
                                virtual_evidence=[virt],
                                show_progress=False)
        assert ((tilted["rain"] == "yes").mean()
                > (base["rain"] == "yes").mean() + 0.1)

    def test_missing_prob_mechanism(self):
        # MNAR mechanism: wet values go missing with p=0.3 regardless of
        # value (reference missingness API: a `wet*` CPD with 2 states)
        model = _wet_grass()
        miss = TabularCPD(
            "wet*", 2, [[0.7, 0.7], [0.3, 0.3]],
            evidence=["wet"], evidence_card=[2],
            state_names={"wet*": [0, 1], "wet": ["yes", "no"]})
        df = model.simulate(n_samples=8_000, seed=15, missing_prob=miss,
                            show_progress=False)
        frac = df["wet"].isna().mean()
        assert frac == pytest.approx(0.3, abs=0.03)
        assert not df["rain"].isna().any()

    def test_missing_prob_return_full(self):
        model = _wet_grass()
        miss = TabularCPD(
            "wet*", 2, [[0.5, 0.5], [0.5, 0.5]],
            evidence=["wet"], evidence_card=[2],
            state_names={"wet*": [0, 1], "wet": ["yes", "no"]})
        # reference semantics: return_full adds a `wet_full` column holding
        # the pre-masking values (ref DiscreteBayesianNetwork.py:1690-1693)
        df = model.simulate(
            n_samples=2_000, seed=16, missing_prob=miss,
            show_progress=False, return_full=True)
        assert not df["wet_full"].isna().any()
        assert df["wet"].isna().any()
        present = ~df["wet"].isna()
        assert (df.loc[present, "wet"] == df.loc[present, "wet_full"]).all()

    def test_include_latents(self):
        model = _wet_grass()
        model.latents = {"cloudy"}
        df = model.simulate(n_samples=10, seed=16, show_progress=False)
        assert "cloudy" not in df.columns
        df = model.simulate(n_samples=10, seed=16, include_latents=True,
                            show_progress=False)
        assert "cloudy" in df.columns
