"""Differential goldens v5: model-fit metrics, 2-TBN DBN fitting, NoisyOR
construction, and independence-set machinery.  Golden values were produced
by RUNNING the reference pgmpy (``tools/gen_goldens_v5.py``) on the shared
deterministic inputs in ``tests/_golden_data.py``.
"""

import json
import os

import numpy as np
import pytest

from _golden_data import (
    DBN_2TBN_EDGES,
    GAUSSIAN_FRAME_EDGES,
    INDEPENDENCE_GRAPHS,
    standalone_dbn_frame,
    standalone_gaussian_frame,
    standalone_sample,
)

from pgmpy_tpu.base import DAG
from pgmpy_tpu.factors import NoisyORCPD
from pgmpy_tpu.independencies import Independencies
from pgmpy_tpu.metrics import SHD, log_likelihood_score, structure_score
from pgmpy_tpu.models import (
    DynamicBayesianNetwork,
    LinearGaussianBayesianNetwork,
)
from pgmpy_tpu.utils import get_example_model

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "reference_goldens_v5.json"))
)


def norm_assertions(independencies):
    out = []
    for a in independencies.get_assertions():
        e1 = sorted(str(x) for x in a.event1)
        e2 = sorted(str(x) for x in a.event2)
        out.append(canon_triple([e1, e2, sorted(str(x) for x in a.event3)]))
    return sorted(out)


def canon_triple(triple):
    """(X perp Y | Z) == (Y perp X | Z): order the pair canonically."""
    e1, e2, e3 = triple
    return sorted([e1, e2]) + [e3]


def canon_golden(triples):
    return sorted(canon_triple(t) for t in triples)


class TestMetricsParity:
    @pytest.mark.parametrize("name", ["asia", "cancer"])
    def test_discrete_metrics(self, name):
        g = GOLDENS["metrics"][name]
        model = get_example_model(name)
        df = standalone_sample(model, g["n_rows"], seed=g["data_seed"])
        assert log_likelihood_score(model, df) == pytest.approx(
            g["log_likelihood_score"], rel=1e-6
        )
        for method in ["k2", "bdeu", "bds", "bic-d", "aic-d"]:
            assert structure_score(
                model, df, scoring_method=method
            ) == pytest.approx(g[f"structure_score_{method}"], rel=1e-9), method

    def test_gaussian_structure_score(self):
        g = GOLDENS["metrics"]["gaussian_frame"]
        df = standalone_gaussian_frame(2000, seed=2027)
        model = LinearGaussianBayesianNetwork(GAUSSIAN_FRAME_EDGES)
        for method in ["ll-g", "bic-g", "aic-g"]:
            assert structure_score(
                model, df, scoring_method=method
            ) == pytest.approx(g[f"structure_score_{method}"], rel=1e-9), method

    def test_shd(self):
        for case in GOLDENS["metrics"]["shd"]:
            nodes = sorted({n for e in case["true"] + case["est"] for n in e})
            t = DAG()
            t.add_nodes_from(nodes)
            t.add_edges_from(map(tuple, case["true"]))
            e = DAG()
            e.add_nodes_from(nodes)
            e.add_edges_from(map(tuple, case["est"]))
            assert int(SHD(t, e)) == case["shd"]


class TestDBNFitParity:
    def test_fit_cpds(self):
        g = GOLDENS["dbn_fit"]
        df = standalone_dbn_frame(g["n_rows"], g["n_slices"], seed=g["seed"])
        dbn = DynamicBayesianNetwork(DBN_2TBN_EDGES)
        dbn.fit(df)
        ours = {
            (str(c.variable[0]), int(c.variable[1])): c for c in dbn.get_cpds()
        }
        assert len(ours) == len(g["cpds"])
        for gc in g["cpds"]:
            cpd = ours[tuple(gc["variable"])]
            ev_ours = [(str(v[0]), int(v[1])) for v in cpd.variables[1:]]
            ev_gold = [tuple(v) for v in gc["evidence"]]
            assert sorted(map(str, ev_ours)) == sorted(map(str, ev_gold))
            arr = np.asarray(gc["values_2d"], dtype=np.float64)
            card = arr.shape[0]
            g_cards = [
                len(gc["state_names"][str(tuple(v))]) for v in gc["evidence"]
            ]
            full = arr.reshape([card] + g_cards)
            perm = [0] + [1 + ev_gold.index(e) for e in ev_ours]
            full = np.transpose(full, perm)
            # state orders: integer data, both libraries sort numerically
            assert np.allclose(
                np.asarray(cpd.get_values(), dtype=np.float64),
                full.reshape(card, -1),
                atol=1e-9,
            ), gc["variable"]


class TestNoisyORParity:
    def test_values(self):
        for case in GOLDENS["noisy_or"]:
            cpd = NoisyORCPD(
                case["variable"], case["prob_values"], evidence=case["evidence"]
            )
            assert np.allclose(
                np.asarray(cpd.get_values(), dtype=np.float64),
                case["values_2d"],
                atol=1e-12,
            )
            for v in cpd.variables:
                assert [str(s) for s in cpd.state_names[v]] == case[
                    "state_names"
                ][str(v)]


class TestIndependenciesParity:
    @pytest.mark.parametrize("name", sorted(INDEPENDENCE_GRAPHS))
    def test_dag_independencies(self, name):
        g = GOLDENS["independencies"][name]
        dag = DAG(INDEPENDENCE_GRAPHS[name])
        # the reference iterates node pairs from a python set, so WHICH
        # minimal separator each assertion carries is hash-order dependent
        # (verified with PYTHONHASHSEED sweeps), and the semi-graphoid
        # closure is too weak to prove the variants equivalent.  Robust
        # parity: both sides must cover exactly the same variable pairs,
        # and every golden separator must be a true d-separator (checked
        # against our d-separation oracle).
        ours = dag.get_independencies()
        our_pairs = {
            frozenset([*map(str, a.event1), *map(str, a.event2)])
            for a in ours.get_assertions()
        }
        gold_pairs = {frozenset(t[0] + t[1]) for t in g["get_independencies"]}
        assert our_pairs == gold_pairs
        for e1, e2, e3 in g["get_independencies"]:
            assert not dag.is_dconnected(e1[0], e2[0], observed=e3)
        for a in ours.get_assertions():
            assert not dag.is_dconnected(
                next(iter(a.event1)), next(iter(a.event2)), observed=list(a.event3)
            )
        assert norm_assertions(
            dag.local_independencies(sorted(dag.nodes(), key=str))
        ) == canon_golden(g["local_independencies"])

    def test_closure_entails(self):
        g = GOLDENS["independencies"]
        closure = Independencies(["X", ["Y", "W"]]).closure()
        assert norm_assertions(closure) == canon_golden(g["closure_example"])
        assert (
            Independencies(["X", ["Y", "W"]]).entails(Independencies(["X", "Y"]))
            == g["entails"]["case1"]
        )
        assert (
            Independencies(["X", "Y"]).entails(Independencies(["X", ["Y", "W"]]))
            == g["entails"]["case2"]
        )
