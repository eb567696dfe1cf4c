"""Structure learning at zoo scale: recovery quality on real networks
(the reference's test_PC.py/test_HillClimbSearch.py run on bigger graphs
than the 3-node chain; this mirrors that depth with F1/SHD thresholds).
"""

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.estimators import PC, HillClimbSearch, MmhcEstimator, TreeSearch
from pgmpy_tpu.metrics import SHD
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.utils import get_example_model


def _skeleton_f1(true_model, learned_edges):
    truth = {frozenset(e) for e in true_model.edges()}
    got = {frozenset(e) for e in learned_edges}
    tp = len(truth & got)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(truth), 1)
    return 2 * precision * recall / max(precision + recall, 1e-12)


@pytest.fixture(scope="module")
def sachs_data():
    model = get_example_model("sachs")
    return model, model.simulate(n_samples=10_000, seed=0, show_progress=False)


class TestStructureRecoveryZoo:
    def test_pc_skeleton_sachs(self, sachs_data):
        model, df = sachs_data
        skel, _ = PC(df).build_skeleton(
            ci_test="chi_square", significance_level=0.01
        )
        f1 = _skeleton_f1(model, skel.edges())
        assert f1 > 0.75, f1

    def test_pc_stable_orientation_sachs(self, sachs_data):
        model, df = sachs_data
        learned = PC(df).estimate(
            variant="stable", ci_test="chi_square",
            significance_level=0.01, return_type="dag", show_progress=False,
        )
        # CPDAG-insensitive measure: undirected skeleton overlap
        f1 = _skeleton_f1(model, learned.edges())
        assert f1 > 0.75, f1

    def test_hillclimb_bic_sachs(self, sachs_data):
        model, df = sachs_data
        learned = HillClimbSearch(df).estimate(
            scoring_method="bic-d", show_progress=False
        )
        f1 = _skeleton_f1(model, learned.edges())
        assert f1 > 0.75, f1
        # directional closeness: SHD comfortably below the empty-graph SHD
        learned_bn = DiscreteBayesianNetwork(learned.edges())
        for n in model.nodes():
            learned_bn.add_node(n)
        assert SHD(model, learned_bn) < len(model.edges())

    def test_mmhc_cancer(self):
        model = get_example_model("cancer")
        df = model.simulate(n_samples=8_000, seed=1, show_progress=False)
        learned = MmhcEstimator(df).estimate(significance_level=0.01)
        f1 = _skeleton_f1(model, learned.edges())
        assert f1 >= 0.6, f1

    def test_tan_tree_search(self):
        # TAN: class variable points at every feature; feature tree learned
        rng = np.random.default_rng(2)
        n = 6000
        c = rng.integers(0, 2, n)
        x1 = (c + rng.integers(0, 2, n)) % 2
        x2 = (x1 + rng.integers(0, 2, n)) % 2
        df = pd.DataFrame({"C": c, "X1": x1, "X2": x2}).astype(str)
        tan = TreeSearch(df, root_node="X1").estimate(
            estimator_type="tan", class_node="C", show_progress=False
        )
        edges = set(tan.edges())
        assert ("C", "X1") in edges and ("C", "X2") in edges
        assert ("X1", "X2") in edges

    def test_pc_sepsets_give_independencies(self, sachs_data):
        model, df = sachs_data
        skel, sepsets = PC(df).build_skeleton(
            ci_test="chi_square", significance_level=0.01
        )
        # every recorded sepset must actually d-separate in the true model
        # for a large fraction of pairs (sampling noise allows a few misses)
        checked, correct = 0, 0
        for (u, v), Z in sepsets.items():
            checked += 1
            if not model.is_dconnected(u, v, observed=list(Z)):
                correct += 1
        assert checked > 0
        assert correct / checked > 0.7, (correct, checked)
