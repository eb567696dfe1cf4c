"""Batched structure-learning device work (SURVEY §2.6 TPU design items).

Through the TPU tunnel a device dispatch costs ~0.1-1 s, so PC levels and
HillClimb/GES iterations must issue O(1) dispatches, not O(tests) /
O(candidates).  These tests pin (a) result-equality between the batched
and per-op paths and (b) the dispatch counts via the `_CodedData`
odometer.  Reference behavior being matched: joblib fan-outs in
``/root/reference/pgmpy/estimators/BaseConstraintEstimator.py:264`` and
the candidate loop in ``HillClimbSearch.py:63-140``.
"""

import os

import numpy as np
import pandas as pd
import pytest

# The unbatched-comparison halves intentionally exercise the per-op
# dispatch path; through the real TPU tunnel that is minutes of pure
# latency (the exact pathology batching removes), so they run CPU-lane
# only — the batched halves still run on hardware.
_skip_unbatched_on_tpu = pytest.mark.skipif(
    bool(os.environ.get("PGMPY_TPU_LANE")),
    reason="per-op comparison path is tunnel-latency-bound on the TPU lane",
)

from pgmpy_tpu.estimators import GES, PC, HillClimbSearch
from pgmpy_tpu.estimators.base import _CodedData
from pgmpy_tpu.estimators.citests import (
    chi_square,
    g_sq,
    power_divergence,
    power_divergence_batch,
)
from pgmpy_tpu.estimators.scores import BDeu, ScoreCache, get_scoring_method

# numeric golden module: also runs in the real-TPU parity lane
pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def alarm_df():
    from pgmpy_tpu.sampling import BayesianModelSampling
    from pgmpy_tpu.utils.utils import get_example_model

    model = get_example_model("alarm")
    return BayesianModelSampling(model).forward_sample(
        size=1000, seed=7, show_progress=False
    )


@pytest.fixture(scope="module")
def small_df():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 3, 4000)
    b = (a + rng.integers(0, 2, 4000)) % 3
    c = rng.integers(0, 2, 4000)
    d = (b + c + rng.integers(0, 2, 4000)) % 3
    return pd.DataFrame(
        {"A": a.astype(str), "B": b.astype(str), "C": c.astype(str), "D": d.astype(str)}
    )


class TestPaddedCountsKernel:
    def test_matches_static_kernel(self, small_df):
        cd = _CodedData(small_df)
        specs = [
            ("A", ()),
            ("B", ("A",)),
            ("D", ("B", "C")),
            ("A", ("B", "C", "D")),
        ]
        static = cd.multi_counts(specs)
        padded = cd.multi_counts_padded(specs)
        for s, p in zip(static, padded):
            np.testing.assert_array_equal(np.asarray(s), np.asarray(p))

    def test_nan_rows_masked(self, small_df):
        df = small_df.copy()
        df.loc[: len(df) // 4, "B"] = np.nan
        cd = _CodedData(df)
        one = cd.counts("A", ["B"])
        many = cd.multi_counts_padded([("A", ("B",)), ("C", ())])
        np.testing.assert_array_equal(np.asarray(one), np.asarray(many[0]))

    def test_chunking_preserves_results(self, small_df):
        cd = _CodedData(small_df)
        specs = [("A", ("B",)), ("C", ("D",)), ("B", ()), ("D", ("A", "C"))] * 5
        expected = [np.asarray(t) for t in cd.multi_counts_padded(specs)]
        old = _CodedData._MULTI_COUNTS_MAX_ELEMS
        try:
            # force ~1-spec chunks
            _CodedData._MULTI_COUNTS_MAX_ELEMS = cd.n
            chunked = cd.multi_counts_padded(specs)
        finally:
            _CodedData._MULTI_COUNTS_MAX_ELEMS = old
        for e, c in zip(expected, chunked):
            np.testing.assert_array_equal(e, np.asarray(c))


class TestBatchedCITests:
    def test_batch_equals_single(self, small_df):
        triples = [
            ("A", "B", []),
            ("A", "B", ["C"]),
            ("B", "D", ["C"]),
            ("A", "D", ["B", "C"]),
            ("C", "D", []),
        ]
        for fn, lam in [(chi_square, "pearson"), (g_sq, "log-likelihood")]:
            batch = power_divergence_batch(triples, data=small_df, lambda_=lam)
            for (x, y, z), (stat, p, dof) in zip(triples, batch):
                s1, p1, d1 = fn(x, y, z, small_df, boolean=False)
                assert s1 == pytest.approx(stat, abs=1e-12)
                assert p1 == pytest.approx(p, abs=1e-12)
                assert d1 == dof

    def test_batch_custom_lambda(self, small_df):
        triples = [("A", "D", ["B"]), ("A", "C", [])]
        batch = power_divergence_batch(triples, data=small_df, lambda_=0.5)
        for (x, y, z), (stat, p, dof) in zip(triples, batch):
            s1, p1, d1 = power_divergence(
                x, y, z, small_df, boolean=False, lambda_=0.5
            )
            assert s1 == pytest.approx(stat, abs=1e-12)


class TestPCSkeletonBatched:
    @_skip_unbatched_on_tpu
    def test_o_levels_dispatches_and_equality(self, alarm_df):
        est = PC(alarm_df)
        before = est._coded.n_dispatches
        skel, seps = est.build_skeleton(
            ci_test="chi_square", max_cond_vars=2, significance_level=0.01
        )
        used = est._coded.n_dispatches - before
        # one padded batch per level (chunking may add a couple more)
        assert used <= 2 * (2 + 1) + 2, f"PC used {used} dispatches"

        # per-test loop (forced by passing a bare callable) must agree
        seq = PC(alarm_df)
        skel2, seps2 = seq.build_skeleton(
            ci_test=lambda *a, **k: chi_square(*a, **k),
            max_cond_vars=2,
            significance_level=0.01,
        )
        assert set(map(frozenset, skel.edges())) == set(
            map(frozenset, skel2.edges())
        )
        assert seps == seps2

    def test_orig_variant_still_works(self, small_df):
        skel, _ = PC(small_df).build_skeleton(
            ci_test="chi_square", variant="orig", max_cond_vars=2
        )
        assert set(skel.nodes()) == {"A", "B", "C", "D"}


class TestHillClimbBatched:
    @_skip_unbatched_on_tpu
    def test_o_iterations_dispatches_and_equality(self, alarm_df):
        hc = HillClimbSearch(alarm_df)
        scorer, cache = get_scoring_method("bic-d", alarm_df, True)
        # estimate() constructs its own scorer; count dispatches by running
        # with a shared instrumented scorer through the public API
        dag = hc.estimate(scoring_method="bic-d", show_progress=False)

        # batched vs prime-disabled must take identical trajectories
        orig_prime = ScoreCache.prime
        try:
            ScoreCache.prime = lambda self, specs: None
            dag2 = HillClimbSearch(alarm_df).estimate(
                scoring_method="bic-d", show_progress=False
            )
        finally:
            ScoreCache.prime = orig_prime
        assert sorted(dag.edges()) == sorted(dag2.edges())

    def test_dispatch_count_per_iteration(self, small_df):
        scorer = BDeu(small_df)
        _, cache = get_scoring_method(scorer, small_df, True)
        hc = HillClimbSearch(small_df)
        before = scorer._coded.n_dispatches
        dag = hc.estimate(scoring_method=scorer, show_progress=False, max_iter=6)
        used = scorer._coded.n_dispatches - before
        # <= one padded dispatch per iteration (cache hits cost none)
        assert used <= 6 + 1, f"HillClimb used {used} dispatches in <=6 iterations"
        assert set(dag.nodes()) == {"A", "B", "C", "D"}


class TestGESBatched:
    @_skip_unbatched_on_tpu
    def test_equality_and_dispatches(self, small_df):
        scorer = BDeu(small_df)
        g = GES(small_df)
        before = scorer._coded.n_dispatches
        dag = g.estimate(scoring_method=scorer)
        used = scorer._coded.n_dispatches - before
        assert used <= 30, f"GES used {used} dispatches"

        orig_prime = ScoreCache.prime
        try:
            ScoreCache.prime = lambda self, specs: None
            dag2 = GES(small_df).estimate(scoring_method=BDeu(small_df))
        finally:
            ScoreCache.prime = orig_prime
        assert sorted(dag.edges()) == sorted(dag2.edges())


class TestBatchedScores:
    def test_local_scores_batch_matches_loop(self, small_df):
        for Score in (BDeu,):
            s = Score(small_df)
            specs = [("A", ["B"]), ("D", ["B", "C"]), ("C", []), ("B", ["A", "C", "D"])]
            batch = s.local_scores_batch(specs)
            for (v, ps), b in zip(specs, batch):
                assert s.local_score(v, ps) == pytest.approx(b, abs=1e-9)

    def test_scorecache_prime_dedupes(self, small_df):
        s = BDeu(small_df)
        _, cache = get_scoring_method(s, small_df, True)
        before = s._coded.n_dispatches
        cache.prime([("A", ["B", "C"]), ("A", ["C", "B"]), ("A", ["B", "C"])])
        assert s._coded.n_dispatches - before == 1
        # all orderings now cached: no further dispatches
        cache.local_score("A", ["C", "B"])
        cache.local_score("A", ["B", "C"])
        assert s._coded.n_dispatches - before == 1


class TestScoringAutoSelect:
    """get_scoring_method(None) mirrors the reference's dtype-based
    default (StructureScore.py:67-69): bic-d / bic-g / bic-cg."""

    def test_defaults_by_dtype(self):
        import numpy as np
        import pandas as pd

        from pgmpy_tpu.estimators.scores import (
            BIC,
            BICCondGauss,
            BICGauss,
            get_scoring_method,
        )

        rng = np.random.default_rng(0)
        disc = pd.DataFrame(
            rng.integers(0, 2, (50, 2)).astype(str), columns=["a", "b"]
        )
        cont = pd.DataFrame(rng.normal(size=(50, 2)), columns=["a", "b"])
        mixed = pd.DataFrame(
            {"a": rng.normal(size=50), "b": rng.integers(0, 2, 50).astype(str)}
        )
        assert isinstance(get_scoring_method(None, disc)[0], BIC)
        assert isinstance(get_scoring_method(None, cont)[0], BICGauss)
        assert isinstance(get_scoring_method(None, mixed)[0], BICCondGauss)

    def test_hillclimb_continuous_default(self):
        import numpy as np
        import pandas as pd

        from pgmpy_tpu.estimators import HillClimbSearch

        rng = np.random.default_rng(1)
        x = rng.normal(size=400)
        y = 2 * x + rng.normal(size=400) * 0.1
        df = pd.DataFrame({"x": x, "y": y})
        dag = HillClimbSearch(df).estimate(show_progress=False)
        assert set(map(frozenset, dag.edges())) == {frozenset(("x", "y"))}


class TestMatmulCountsKernel:
    """The one-hot MXU contraction path (used on TPU for small tables)
    must agree exactly with the scatter path.  On CPU we call the kernel
    directly — integer counts are exact in f32 either way."""

    def test_matmul_kernel_matches_scatter(self, small_df):
        import jax.numpy as jnp

        from pgmpy_tpu.estimators.base import _padded_counts_matmul_kernel

        df = small_df.copy()
        df.loc[: len(df) // 5, "C"] = np.nan  # exercise the validity mask
        cd = _CodedData(df)
        specs = [("A", ("B",)), ("D", ("B", "C")), ("B", ()), ("C", ("A", "D"))]
        expected = [np.asarray(t) for t in cd.multi_counts_padded(specs)]

        cols_l, cards_l, sizes = [], [], []
        for v, ps in specs:
            cs = [cd.var_index[v]] + [cd.var_index[p] for p in ps]
            ca = [cd.cards[v]] + [cd.cards[p] for p in ps]
            cols_l.append(cs)
            cards_l.append(ca)
            sizes.append(int(np.prod(ca)))
        s_pad, k_pad, m = 8, 4, 32
        col_idx = np.full((s_pad, k_pad), -1, np.int32)
        cards_a = np.ones((s_pad, k_pad), np.int32)
        spec_w = np.zeros(s_pad, np.float32)
        for i, (cs, ca) in enumerate(zip(cols_l, cards_l)):
            st = k_pad - len(cs)
            col_idx[i, st:] = cs
            cards_a[i, st:] = ca
            spec_w[i] = 1.0
        w = jnp.ones((cd.n,), dtype=jnp.float32)
        tables = np.asarray(
            _padded_counts_matmul_kernel(
                cd.codes, w, jnp.asarray(col_idx), jnp.asarray(cards_a),
                jnp.asarray(spec_w), m, 512,
            )
        )
        for i, size in enumerate(sizes):
            got = tables[i, :size].reshape(cards_l[i][0], -1)
            np.testing.assert_array_equal(got, expected[i])
        # padding rows contribute nothing
        assert np.all(tables[len(specs):] == 0.0)
