"""Deep VE/BP goldens in the style of the reference's 1,381-line exact-
inference suite (``test_inference/test_ExactInference.py``): every answer is
checked against an INDEPENDENT brute-force enumeration of the full joint
computed with plain numpy.
"""

import itertools

import numpy as np
import pytest

from pgmpy_tpu.factors import DiscreteFactor, TabularCPD
from pgmpy_tpu.inference import BeliefPropagation, VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork


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


def asia_like_bn():
    """8-node chest-clinic-shaped network with random (seeded) CPDs."""
    model = DiscreteBayesianNetwork(
        [
            ("asia", "tub"), ("smoke", "lung"), ("smoke", "bronc"),
            ("tub", "either"), ("lung", "either"), ("either", "xray"),
            ("either", "dysp"), ("bronc", "dysp"),
        ]
    )
    model.get_random_cpds(inplace=True, seed=42)
    return model


def brute_force_joint(model):
    """(variables, joint array) by direct enumeration — the oracle."""
    variables = sorted(model.nodes(), key=str)
    cards = {v: model.get_cardinality(v) for v in variables}
    shape = tuple(cards[v] for v in variables)
    joint = np.zeros(shape)
    cpds = {c.variable: c for c in model.get_cpds()}
    values = {v: np.asarray(cpds[v].values, dtype=np.float64) for v in variables}
    for assignment in itertools.product(*[range(cards[v]) for v in variables]):
        state = dict(zip(variables, assignment))
        p = 1.0
        for v in variables:
            cpd = cpds[v]
            idx = tuple(state[u] for u in cpd.variables)
            p *= values[v][idx]
        joint[assignment] = p
    return variables, joint


def brute_posterior(model, query, evidence=None):
    """P(query | evidence) by enumeration; query is a list, returns the
    joint over `query` in that order."""
    variables, joint = brute_force_joint(model)
    evidence = evidence or {}
    index = []
    for v in variables:
        if v in evidence:
            index.append(evidence[v])
        else:
            index.append(slice(None))
    sub = joint[tuple(index)]
    kept = [v for v in variables if v not in evidence]
    sum_axes = tuple(i for i, v in enumerate(kept) if v not in query)
    marg = sub.sum(axis=sum_axes) if sum_axes else sub
    remaining = [v for v in kept if v in query]
    perm = [remaining.index(q) for q in query]
    marg = np.transpose(marg, perm)
    return marg / marg.sum()


STUDENT_VARS = ["diff", "grade", "intel", "letter", "SAT"]


class TestVEAgainstEnumeration:
    def setup_method(self):
        self.model = student_bn()
        self.infer = VariableElimination(self.model)

    @pytest.mark.parametrize("var", STUDENT_VARS)
    def test_prior_marginals(self, var):
        got = np.asarray(
            self.infer.query([var], show_progress=False).values, np.float64
        )
        np.testing.assert_allclose(got, brute_posterior(self.model, [var]), atol=1e-5)

    @pytest.mark.parametrize("var,evidence", [
        ("grade", {"diff": 0}),
        ("grade", {"diff": 1, "intel": 0}),
        ("intel", {"letter": 1}),
        ("intel", {"letter": 0, "SAT": 1}),
        ("diff", {"grade": 2}),
        ("letter", {"intel": 1}),
        ("SAT", {"grade": 0, "letter": 1}),
        ("diff", {"SAT": 0, "letter": 0, "grade": 1}),
    ])
    def test_posteriors(self, var, evidence):
        got = np.asarray(
            self.infer.query([var], evidence=evidence, show_progress=False).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, [var], evidence), atol=1e-5
        )

    @pytest.mark.parametrize("query", [
        ["diff", "grade"],
        ["grade", "letter"],
        ["intel", "SAT", "letter"],
    ])
    def test_joint_queries(self, query):
        got = np.asarray(
            self.infer.query(query, show_progress=False).values, np.float64
        )
        np.testing.assert_allclose(got, brute_posterior(self.model, query), atol=1e-5)

    def test_joint_query_with_evidence(self):
        got = np.asarray(
            self.infer.query(
                ["diff", "intel"], evidence={"grade": 1}, show_progress=False
            ).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, ["diff", "intel"], {"grade": 1}),
            atol=1e-5,
        )

    def test_joint_false_returns_dict_of_marginals(self):
        out = self.infer.query(
            ["diff", "intel"], evidence={"grade": 0}, joint=False, show_progress=False
        )
        assert set(out.keys()) == {"diff", "intel"}
        for var in out:
            np.testing.assert_allclose(
                np.asarray(out[var].values, np.float64),
                brute_posterior(self.model, [var], {"grade": 0}),
                atol=1e-5,
            )

    @pytest.mark.parametrize("order", [
        "minfill", "minneighbors", "minweight", "weightedminfill",
    ])
    def test_all_heuristic_orders_agree(self, order):
        got = np.asarray(
            self.infer.query(
                ["intel"], evidence={"letter": 0}, elimination_order=order,
                show_progress=False,
            ).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, ["intel"], {"letter": 0}), atol=1e-5
        )

    def test_explicit_elimination_order(self):
        got = np.asarray(
            self.infer.query(
                ["grade"], evidence={"SAT": 1},
                elimination_order=["letter", "diff", "intel"],
                show_progress=False,
            ).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, ["grade"], {"SAT": 1}), atol=1e-5
        )

    def test_explicit_order_with_query_var_raises(self):
        with pytest.raises(ValueError):
            self.infer.query(
                ["grade"], elimination_order=["grade", "diff", "intel", "letter", "SAT"],
                show_progress=False,
            )

    def test_explicit_order_incomplete_raises(self):
        with pytest.raises(ValueError):
            self.infer.query(
                ["grade"], evidence={"SAT": 1}, elimination_order=["letter"],
                show_progress=False,
            )

    def test_query_evidence_overlap_raises(self):
        with pytest.raises(ValueError):
            self.infer.query(["grade"], evidence={"grade": 0}, show_progress=False)

    def test_state_name_evidence(self):
        model = DiscreteBayesianNetwork([("rain", "grass")])
        model.add_cpds(
            TabularCPD("rain", 2, [[0.8], [0.2]],
                       state_names={"rain": ["no", "yes"]}),
            TabularCPD("grass", 2, [[0.9, 0.1], [0.1, 0.9]],
                       evidence=["rain"], evidence_card=[2],
                       state_names={"grass": ["dry", "wet"], "rain": ["no", "yes"]}),
        )
        infer = VariableElimination(model)
        got = np.asarray(
            infer.query(["rain"], evidence={"grass": "wet"}, show_progress=False).values,
            np.float64,
        )
        # P(rain|wet) = [0.8*0.1, 0.2*0.9] / 0.26
        np.testing.assert_allclose(got, [0.08 / 0.26, 0.18 / 0.26], atol=1e-5)

    def test_map_query_matches_enumeration(self):
        post = brute_posterior(self.model, ["diff", "intel"], {"grade": 0})
        best = np.unravel_index(post.argmax(), post.shape)
        got = self.infer.map_query(
            ["diff", "intel"], evidence={"grade": 0}, show_progress=False
        )
        assert (got["diff"], got["intel"]) == best

    def test_map_query_all_variables(self):
        got = self.infer.map_query(evidence={"grade": 0}, show_progress=False)
        assert set(got.keys()) == set(STUDENT_VARS) - {"grade"}

    def test_max_marginal(self):
        # reference semantics: the model is pruned to the ancestral graph of
        # the query BEFORE max-elimination, so the barren letter/SAT CPDs are
        # dropped (summed to 1), not max-reduced.  Oracle: enumerate the
        # pruned joint P(diff, intel, grade) directly.
        pruned = np.einsum(
            "d,i,gid->dig",
            np.array([0.6, 0.4]),
            np.array([0.7, 0.3]),
            np.array(
                [[0.3, 0.05, 0.9, 0.5], [0.4, 0.25, 0.08, 0.3], [0.3, 0.7, 0.02, 0.2]]
            ).reshape(3, 2, 2),
        )
        max_marg = pruned.max(axis=(0, 1))  # max over diff, intel
        expected = max_marg.max() / max_marg.sum()
        assert self.infer.max_marginal(
            ["grade"], show_progress=False
        ) == pytest.approx(expected, abs=1e-6)
        # golden from reference pgmpy v1.0.0 on this exact model
        assert expected == pytest.approx(0.3726235741444867, abs=1e-12)

    def test_max_marginal_with_evidence(self):
        got = self.infer.max_marginal(
            ["grade"], evidence={"diff": 0}, show_progress=False
        )
        # golden from reference pgmpy v1.0.0
        assert got == pytest.approx(0.3684210526315789, rel=1e-5)

    def test_induced_width(self):
        width = self.infer.induced_width(
            ["diff", "grade", "intel", "letter", "SAT"]
        )
        assert width >= 2

    def test_induced_graph_contains_moral_edges(self):
        graph = self.infer.induced_graph(
            ["diff", "grade", "intel", "letter", "SAT"]
        )
        assert graph.has_edge("diff", "intel")  # moral edge (common child)

    def test_induced_graph_wrong_order_raises(self):
        with pytest.raises(ValueError):
            self.infer.induced_graph(["diff", "grade"])

    def test_virtual_evidence(self):
        # manual construction: binary likelihood child of intel
        likelihood = TabularCPD("intel", 2, [[0.3], [0.7]])
        got = np.asarray(
            self.infer.query(
                ["grade"], virtual_evidence=[likelihood], show_progress=False
            ).values,
            np.float64,
        )
        # oracle: reweight the joint by the likelihood of intel
        variables, joint = brute_force_joint(self.model)
        i_intel = variables.index("intel")
        weights = np.array([0.3, 0.7])
        shape = [1] * joint.ndim
        shape[i_intel] = 2
        weighted = joint * weights.reshape(shape)
        marg = weighted.sum(axis=tuple(
            i for i, v in enumerate(variables) if v != "grade"
        ))
        np.testing.assert_allclose(got, marg / marg.sum(), atol=1e-5)


class TestVELargerNetwork:
    def setup_method(self):
        self.model = asia_like_bn()
        self.infer = VariableElimination(self.model)

    @pytest.mark.parametrize("var", ["xray", "dysp", "either", "lung"])
    def test_prior_marginals(self, var):
        got = np.asarray(
            self.infer.query([var], show_progress=False).values, np.float64
        )
        np.testing.assert_allclose(got, brute_posterior(self.model, [var]), atol=1e-5)

    @pytest.mark.parametrize("var,evidence", [
        ("lung", {"xray": 1}),
        ("tub", {"dysp": 0, "smoke": 1}),
        ("bronc", {"xray": 0, "asia": 1}),
        ("smoke", {"either": 1, "dysp": 1}),
    ])
    def test_posteriors(self, var, evidence):
        got = np.asarray(
            self.infer.query([var], evidence=evidence, show_progress=False).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, [var], evidence), atol=1e-5
        )

    def test_compiled_program_reused_across_value_changes(self):
        cache = self.model.__dict__.get("_ve_program_cache")
        self.infer.query(["lung"], evidence={"xray": 0}, show_progress=False)
        self.infer.query(["lung"], evidence={"xray": 1}, show_progress=False)
        cache = self.model.__dict__["_ve_program_cache"]
        assert len(cache[1]) == 1  # one signature -> one compiled program


class TestBPAgainstEnumeration:
    def setup_method(self):
        self.model = student_bn()
        self.bp = BeliefPropagation(self.model)

    def test_calibrated_clique_beliefs_are_joint_marginals(self):
        self.bp.calibrate()
        variables, joint = brute_force_joint(self.model)
        for clique, belief in self.bp.get_clique_beliefs().items():
            marg = joint.sum(axis=tuple(
                i for i, v in enumerate(variables) if v not in clique
            ))
            got = np.asarray(belief.values, np.float64)
            got = got / got.sum()
            # align axis order
            kept = [v for v in variables if v in clique]
            perm = [kept.index(v) for v in belief.variables]
            np.testing.assert_allclose(
                got, np.transpose(marg / marg.sum(), perm), atol=1e-5,
                err_msg=str(clique),
            )

    def test_sepset_beliefs_consistent(self):
        self.bp.calibrate()
        for edge, sepset_belief in self.bp.get_sepset_beliefs().items():
            if sepset_belief is None:
                continue
            c1, c2 = tuple(edge)
            b1 = self.bp.get_clique_beliefs()[c1]
            marg = b1.marginalize(
                [v for v in c1 if v not in sepset_belief.variables], inplace=False
            ).normalize(inplace=False)
            assert marg == sepset_belief.normalize(inplace=False)

    @pytest.mark.parametrize("var,evidence", [
        ("grade", None),
        ("intel", {"letter": 0}),
        ("diff", {"SAT": 1, "letter": 1}),
        ("letter", {"diff": 0, "intel": 1}),
    ])
    def test_bp_query_matches_enumeration(self, var, evidence):
        got = np.asarray(
            self.bp.query([var], evidence=evidence, show_progress=False).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, [var], evidence), atol=1e-5
        )

    def test_bp_joint_query(self):
        got = np.asarray(
            self.bp.query(
                ["diff", "intel"], evidence={"grade": 1}, show_progress=False
            ).values,
            np.float64,
        )
        np.testing.assert_allclose(
            got, brute_posterior(self.model, ["diff", "intel"], {"grade": 1}),
            atol=1e-5,
        )

    def test_bp_map_query(self):
        post = brute_posterior(self.model, ["diff", "intel"], {"grade": 0})
        best = np.unravel_index(post.argmax(), post.shape)
        got = self.bp.map_query(["diff", "intel"], evidence={"grade": 0})
        assert (got["diff"], got["intel"]) == best

    def test_max_calibrate_beliefs_are_max_marginals(self):
        self.bp.max_calibrate()
        variables, joint = brute_force_joint(self.model)
        clique = next(iter(self.bp.get_clique_beliefs()))
        belief = self.bp.get_clique_beliefs()[clique]
        maxm = joint.max(axis=tuple(
            i for i, v in enumerate(variables) if v not in clique
        ))
        kept = [v for v in variables if v in clique]
        perm = [kept.index(v) for v in belief.variables]
        got = np.asarray(belief.values, np.float64)
        np.testing.assert_allclose(
            got / got.max(), np.transpose(maxm / maxm.max(), perm), atol=1e-5
        )

    def test_query_evidence_overlap_raises(self):
        with pytest.raises(ValueError):
            self.bp.query(["grade"], evidence={"grade": 0}, show_progress=False)

    def test_bp_larger_network_agrees_with_ve(self):
        model = asia_like_bn()
        bp = BeliefPropagation(model)
        ve = VariableElimination(model)
        for var, ev in [("xray", None), ("lung", {"dysp": 1}),
                        ("asia", {"xray": 0, "bronc": 1})]:
            got = bp.query([var], evidence=ev, show_progress=False)
            want = ve.query([var], evidence=ev, show_progress=False)
            assert got == want, (var, ev)

    def test_virtual_evidence_matches_ve(self):
        likelihood = TabularCPD("intel", 2, [[0.2], [0.8]])
        got = self.bp.query(
            ["grade"], virtual_evidence=[likelihood], show_progress=False
        )
        want = VariableElimination(self.model).query(
            ["grade"], virtual_evidence=[likelihood], show_progress=False
        )
        assert got == want
