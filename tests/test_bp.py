import numpy as np
import pytest

from pgmpy_tpu.factors import DiscreteFactor, TabularCPD, factor_product
from pgmpy_tpu.inference import BeliefPropagation, VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork, DiscreteMarkovNetwork
from pgmpy_tpu.utils.utils import get_example_model


# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu

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


class TestCalibration:
    def test_clique_beliefs_are_marginals(self):
        model = student_bn()
        bp = BeliefPropagation(model)
        bp.calibrate()
        joint = factor_product(*[cpd.to_factor() for cpd in model.get_cpds()])
        for clique, belief in bp.get_clique_beliefs().items():
            expected = joint.marginalize(
                [v for v in joint.variables if v not in clique], inplace=False
            ).normalize(inplace=False)
            assert belief.normalize(inplace=False) == expected, clique

    def test_sepset_beliefs_consistent(self):
        bp = BeliefPropagation(student_bn())
        bp.calibrate()
        for edge, sepset_belief in bp.get_sepset_beliefs().items():
            c1, c2 = tuple(edge)
            sep = set(c1) & set(c2)
            m1 = bp.clique_beliefs[c1].marginalize(
                list(set(c1) - sep), inplace=False
            ).normalize(inplace=False)
            m2 = bp.clique_beliefs[c2].marginalize(
                list(set(c2) - sep), inplace=False
            ).normalize(inplace=False)
            assert m1 == m2

    def test_markov_model_calibration(self):
        mn = DiscreteMarkovNetwork([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
        rng = np.random.default_rng(0)
        for edge in mn.edges():
            mn.add_factors(DiscreteFactor(list(edge), [2, 2], rng.random(4)))
        bp = BeliefPropagation(mn)
        bp.calibrate()
        joint = factor_product(*mn.factors)
        for clique, belief in bp.get_clique_beliefs().items():
            expected = joint.marginalize(
                [v for v in joint.variables if v not in clique], inplace=False
            ).normalize(inplace=False)
            assert belief.normalize(inplace=False) == expected


class TestBPQueries:
    def setup_method(self):
        self.model = student_bn()
        self.bp = BeliefPropagation(self.model)
        self.ve = VariableElimination(self.model)

    def test_query_matches_ve(self):
        for variables, evidence in [
            (["grade"], None),
            (["intel"], {"grade": 0}),
            (["letter", "SAT"], {"diff": 1}),
            (["diff"], {"letter": 0, "SAT": 1}),
        ]:
            res_bp = self.bp.query(variables, evidence=evidence, show_progress=False)
            res_ve = self.ve.query(variables, evidence=evidence, show_progress=False)
            assert res_bp == res_ve, (variables, evidence)

    def test_query_joint_false(self):
        res = self.bp.query(["intel", "diff"], evidence={"grade": 1}, joint=False, show_progress=False)
        for var in ["intel", "diff"]:
            expected = self.ve.query([var], evidence={"grade": 1}, show_progress=False)
            assert res[var].normalize(inplace=False) == expected

    def test_map_query_matches_ve(self):
        assert self.bp.map_query(
            ["intel"], evidence={"SAT": 1}, show_progress=False
        ) == self.ve.map_query(["intel"], evidence={"SAT": 1}, show_progress=False)

    def test_query_overlap_raises(self):
        with pytest.raises(ValueError):
            self.bp.query(["grade"], evidence={"grade": 0})

    def test_virtual_evidence_matches_ve(self):
        virt = TabularCPD("intel", 2, [[0.9], [0.1]])
        res_bp = self.bp.query(["grade"], virtual_evidence=[virt], show_progress=False)
        res_ve = self.ve.query(["grade"], virtual_evidence=[virt], show_progress=False)
        assert res_bp == res_ve


class TestBPAlarm:
    def test_alarm_parity_with_ve(self):
        model = get_example_model("alarm")
        bp = BeliefPropagation(model)
        ve = VariableElimination(model)
        res_bp = bp.query(["HISTORY"], evidence={"CVP": "LOW", "HR": "HIGH"}, show_progress=False)
        res_ve = ve.query(["HISTORY"], evidence={"CVP": "LOW", "HR": "HIGH"}, show_progress=False)
        assert res_bp == res_ve

    def test_alarm_full_calibration(self):
        model = get_example_model("alarm")
        bp = BeliefPropagation(model)
        bp.calibrate()
        assert len(bp.get_clique_beliefs()) == len(bp.junction_tree.nodes())
        # spot check one marginal vs VE
        ve = VariableElimination(model)
        clique = next(iter(bp.get_clique_beliefs()))
        var = clique[0]
        marg_bp = (
            bp.get_clique_beliefs()[clique]
            .marginalize([v for v in clique if v != var], inplace=False)
            .normalize(inplace=False)
        )
        marg_ve = ve.query([var], show_progress=False)
        assert marg_bp == marg_ve


class TestCalibrationNumerics:
    def test_insurance_no_nan_beliefs(self):
        # regression: the 1e-38 zero-division guard is SUBNORMAL in f32 and
        # XLA flushes it to 0, turning 0/0 guards into NaN on networks with
        # deterministic zeros (insurance); clamps must use config.TINY
        from pgmpy_tpu.utils import get_example_model

        model = get_example_model("insurance")
        bp = BeliefPropagation(model)
        bp.calibrate()
        for clique, factor in bp.get_clique_beliefs().items():
            values = np.asarray(factor.values)
            assert np.isfinite(values).all(), clique
            # calibrated BN clique beliefs are joint marginals: sum to 1
            np.testing.assert_allclose(values.sum(), 1.0, atol=1e-3)

    def test_tiny_constant_survives_xla(self):
        import jax
        import jax.numpy as jnp

        from pgmpy_tpu.config import TINY

        clamped = jax.jit(lambda x: jnp.maximum(x, TINY))(
            jnp.asarray(0.0, jnp.float32)
        )
        assert float(clamped) > 0.0


class TestMonolithicUpgrade:
    """The background monolithic-program hot-swap (r4 perf lever) must
    produce the same calibrated beliefs as the chunked pipeline."""

    def test_upgrade_swaps_and_matches(self):
        import numpy as np

        from pgmpy_tpu.inference.bp import BeliefPropagation, JunctionTreeProgram
        from pgmpy_tpu.utils import get_example_model

        model = get_example_model("alarm")
        old_chunk = JunctionTreeProgram.CHUNK
        old_thresh = JunctionTreeProgram.UPGRADE_THRESHOLD
        try:
            JunctionTreeProgram.CHUNK = 7  # force many segments
            JunctionTreeProgram.UPGRADE_THRESHOLD = 1  # force the upgrade
            bp = BeliefPropagation(model)
            prog = bp._program
            # executor() RETURNS the chunked build even though the swap may
            # land in _fns at any time afterwards
            chunked_fn = prog.executor("marginalize")
            arrays = [f.values for f in bp._input_factors]
            chunked_beliefs, _ = chunked_fn(arrays)
            prog.wait_for_upgrade("marginalize", timeout=300)
            # the monolithic program must actually have swapped in — a
            # silently-failed background compile would otherwise make this
            # test compare chunked against chunked
            mono_fn = prog.executor("marginalize")
            assert mono_fn is not chunked_fn
            mono_beliefs, _ = mono_fn(arrays)
            assert len(chunked_beliefs) == len(mono_beliefs)
            for a, b in zip(chunked_beliefs, mono_beliefs):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
                )
        finally:
            JunctionTreeProgram.CHUNK = old_chunk
            JunctionTreeProgram.UPGRADE_THRESHOLD = old_thresh


class TestBPQueryBatch:
    def test_matches_per_row_query_and_ve(self):
        import numpy as np

        from pgmpy_tpu.inference import VariableElimination
        from pgmpy_tpu.inference.bp import BeliefPropagation
        from pgmpy_tpu.utils import get_example_model

        model = get_example_model("asia")
        bp = BeliefPropagation(model)
        ve = VariableElimination(model)
        rows = {
            "asia": ["yes", "no", "yes", "no"],
            "smoke": ["no", "no", "yes", "yes"],
        }
        values, names = bp.query_batch(["dysp", "xray"], rows)
        values = np.asarray(values)
        assert values.shape[0] == 4
        ve_values, ve_names = ve.query_batch(["dysp", "xray"], rows)
        np.testing.assert_allclose(values, np.asarray(ve_values), atol=2e-5)
        assert names == ve_names
        for i in range(4):
            single = bp.query(
                ["dysp", "xray"],
                evidence={"asia": rows["asia"][i], "smoke": rows["smoke"][i]},
            )
            np.testing.assert_allclose(
                values[i], np.asarray(single.values), atol=2e-5
            )

    def test_requires_evidence(self):
        import pytest as _pytest

        from pgmpy_tpu.inference.bp import BeliefPropagation
        from pgmpy_tpu.utils import get_example_model

        bp = BeliefPropagation(get_example_model("cancer"))
        with _pytest.raises(ValueError):
            bp.query_batch(["Smoker"], {})


class TestCliqueMerge:
    """Clique agglomeration (``bp._merge_cliques``): fewer messages, same
    posteriors, junction-tree property preserved."""

    def _programs(self, model):
        from pgmpy_tpu.inference.bp import JunctionTreeProgram

        factors = [c.to_factor() for c in model.get_cpds()]
        cards = {
            v: int(c)
            for f in factors
            for v, c in zip(f.variables, f.cardinality)
        }
        scopes = [list(f.variables) for f in factors]
        p0 = JunctionTreeProgram.from_factors(
            scopes, cards, normalize_messages=False, merge=False)
        p1 = JunctionTreeProgram.from_factors(
            scopes, cards, normalize_messages=False, merge=True)
        return factors, p0, p1

    def test_merged_calibration_matches_unmerged_on_alarm(self):
        model = get_example_model("alarm")
        factors, p0, p1 = self._programs(model)
        assert len(p1.cliques) < len(p0.cliques)
        assert len(p1.messages) < len(p0.messages)
        arrays = [f.values for f in factors]
        b0, _ = p0.executor("marginalize", one_shot=True)(arrays)
        b1, _ = p1.executor("marginalize", one_shot=True)(arrays)

        def marginal(program, beliefs, var):
            ci = next(
                i for i, c in enumerate(program.cliques) if var in c)
            arr = np.asarray(beliefs[ci], dtype=np.float64)
            axes = tuple(
                k for k, v in enumerate(program.cliques[ci]) if v != var)
            m = arr.sum(axis=axes)
            return m / m.sum()

        for var in model.nodes():
            np.testing.assert_allclose(
                marginal(p1, b1, var), marginal(p0, b0, var), atol=1e-5,
                err_msg=var)

    def test_merged_tree_keeps_junction_property(self):
        import networkx as nx

        model = get_example_model("alarm")
        _, _, p1 = self._programs(model)
        tree = nx.Graph()
        tree.add_nodes_from(p1.cliques)
        for edge_key in p1.edge_ids:
            tree.add_edge(*tuple(edge_key))
        assert nx.is_forest(tree)
        variables = {v for c in p1.cliques for v in c}
        for var in variables:
            containing = [c for c in p1.cliques if var in c]
            sub = tree.subgraph(containing)
            assert nx.is_connected(sub), f"running intersection broken: {var}"

    def test_merge_respects_table_cap_and_budget(self):
        import numpy as np

        from pgmpy_tpu.inference.bp import JunctionTreeProgram, _merge_cliques

        model = get_example_model("alarm")
        factors = [c.to_factor() for c in model.get_cpds()]
        cards = {
            v: int(c)
            for f in factors
            for v, c in zip(f.variables, f.cardinality)
        }
        scopes = [list(f.variables) for f in factors]
        base = JunctionTreeProgram.from_factors(scopes, cards, merge=False)
        base_elems = sum(int(np.prod(s)) for s in base.clique_shapes)
        tree_edges = [tuple(edge_key) for edge_key in base.edge_ids]
        cap, ratio = 256, 1.2
        cliques, edges = _merge_cliques(
            list(base.cliques), tree_edges, cards,
            max_table=cap, budget_ratio=ratio)
        sizes = [
            int(np.prod([cards[v] for v in c])) for c in cliques
        ]
        grown = [
            s for c, s in zip(cliques, sizes) if c not in set(base.cliques)
        ]
        assert all(s <= cap for s in grown), "merged table exceeds cap"
        assert sum(sizes) <= ratio * base_elems + 1
