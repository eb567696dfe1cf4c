"""Deep CI-test suite: vectorized power-divergence vs a scipy-loop oracle,
mixed-data pillai_trace vs the reference's exact CCA/F-approx steps, and
regression coverage for categorical-data edge_strength (VERDICT r2 item 1).
"""

import warnings

import numpy as np
import pandas as pd
import pytest
from scipy import stats

from pgmpy_tpu.estimators import citests
from pgmpy_tpu.estimators.base import _CodedData
from pgmpy_tpu.estimators.citests import (
    _canonical_corrs,
    _power_divergence,
    chi_square,
    g_sq,
    gcm,
    pearsonr,
    pillai_trace,
    power_divergence,
)
from pgmpy_tpu.utils import get_example_model

# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu



def _scipy_loop_oracle(X, Y, Z, data, lambda_):
    """The pre-r3 per-Z-slice scipy implementation, kept as the oracle."""
    coded = _CodedData(data)
    table = np.asarray(coded.counts(X, [Y] + list(Z))).reshape(
        coded.cards[X], coded.cards[Y], -1
    )
    stat_total, dof_total = 0.0, 0
    for k in range(table.shape[2]):
        sub = table[:, :, k]
        sub = sub[sub.sum(axis=1) > 0][:, sub.sum(axis=0) > 0]
        if sub.shape[0] < 2 or sub.shape[1] < 2:
            continue
        # default correction=True: the reference calls chi2_contingency
        # without correction=False, so Yates applies on dof==1 slices
        chi, _, dof, _ = stats.chi2_contingency(sub, lambda_=lambda_)
        stat_total += chi
        dof_total += dof
    if dof_total == 0:
        return 0.0, 1.0, 0
    return stat_total, float(stats.chi2.sf(stat_total, dof_total)), dof_total


@pytest.fixture(scope="module")
def discrete_df():
    rng = np.random.default_rng(0)
    n = 2500
    z1 = rng.integers(0, 3, n)
    z2 = rng.integers(0, 2, n)
    x = (z1 + rng.integers(0, 3, n)) % 4
    y = (x + z2 + rng.integers(0, 2, n)) % 3
    return pd.DataFrame({"X": x, "Y": y, "Z1": z1, "Z2": z2}).astype(str)


class TestPowerDivergenceVectorized:
    @pytest.mark.parametrize(
        "lam",
        ["pearson", "log-likelihood", "cressie-read", "freeman-tukey",
         "mod-log-likelihood", "neyman", 0.5],
    )
    @pytest.mark.parametrize("Z", [[], ["Z1"], ["Z1", "Z2"]])
    def test_matches_scipy_loop(self, discrete_df, lam, Z):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s1, p1, d1 = _power_divergence(
                "X", "Y", Z, discrete_df, False, 0.05, lam
            )
            s0, p0, d0 = _scipy_loop_oracle("X", "Y", Z, discrete_df, lam)
        assert d1 == d0
        if np.isnan(s0) or np.isinf(s0):
            assert np.isnan(s1) or np.isinf(s1)
        else:
            assert s1 == pytest.approx(s0, rel=1e-2)
            assert p1 == pytest.approx(p0, abs=1e-5)

    def test_boolean_decisions(self, discrete_df):
        # X and Y are dependent even given Z1, Z2
        assert not chi_square("X", "Y", ["Z1", "Z2"], discrete_df)
        assert not g_sq("X", "Y", [], discrete_df)
        # independent pair
        rng = np.random.default_rng(1)
        n = len(discrete_df)
        df = discrete_df.assign(W=rng.integers(0, 3, n).astype(str))
        assert chi_square("W", "Y", [], df)
        assert power_divergence("W", "Y", ["Z1"], df)

    def test_empty_slice_handling(self):
        # a Z configuration that never co-occurs must contribute nothing
        df = pd.DataFrame(
            {"X": ["a", "a", "b", "b"] * 10,
             "Y": ["u", "v", "u", "v"] * 10,
             "Z": ["p", "p", "p", "p"] * 10}
        )
        s, p, d = chi_square("X", "Y", ["Z"], df, boolean=False)
        s0, p0, d0 = _scipy_loop_oracle("X", "Y", ["Z"], df, "pearson")
        assert (s, d) == (pytest.approx(s0), d0)


class TestCanonicalCorrelations:
    def test_matches_sklearn_cca(self):
        from sklearn.cross_decomposition import CCA

        rng = np.random.default_rng(0)
        for _ in range(4):
            n, p, q = 400, int(rng.integers(1, 4)), int(rng.integers(1, 4))
            A = rng.normal(size=(n, p))
            B = rng.normal(size=(n, q)) + 0.3 * A[:, :1]
            ours = np.sort(_canonical_corrs(A, B))[::-1]
            k = min(p, q)
            cca = CCA(scale=False, n_components=k)
            Ac, Bc = cca.fit_transform(A - A.mean(0), B - B.mean(0))
            ref = np.sort(
                [abs(np.corrcoef(Ac[:, i], Bc[:, i])[0, 1]) for i in range(k)]
            )[::-1]
            assert np.allclose(ours, ref, atol=1e-5)

    def test_rank_deficient_block(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(200, 2))
        A = np.column_stack([A, A[:, 0]])  # duplicated column
        B = rng.normal(size=(200, 2))
        s = _canonical_corrs(A, B)
        assert np.all(np.isfinite(s)) and np.all((0 <= s) & (s <= 1))


class TestPillaiTrace:
    def _reference_steps_oracle(self, res_x, res_y, n):
        """Reference CITests.py:724-744 steps 4-5, via sklearn CCA."""
        from sklearn.cross_decomposition import CCA

        p, q = res_x.shape[1], res_y.shape[1]
        s = min(p, q)
        cca = CCA(scale=False, n_components=s)
        xc, yc = cca.fit_transform(res_x, res_y)
        coef = sum(
            np.corrcoef(xc[:, i], yc[:, i])[0, 1] ** 2 for i in range(s)
        )
        df1 = p * q
        df2 = s * (n - 1 + s - p - q)
        f_stat = (coef / df1) * (df2 / (s - coef))
        return coef, 1 - stats.f.cdf(f_stat, df1, df2)

    def test_full_pipeline_vs_reference_steps(self):
        # deterministic linear regressors injected so the residuals are
        # reproducible; compare end-to-end coef/p against the reference math
        from sklearn.linear_model import LinearRegression, LogisticRegression

        rng = np.random.default_rng(3)
        n = 1200
        z = rng.normal(size=n)
        x = pd.Categorical(np.where(z + rng.normal(size=n) > 0, "a", "b"))
        y = z + rng.normal(size=n)
        df = pd.DataFrame({"X": x, "Y": y, "Z": z})
        factories = dict(
            classifier_factory=lambda: LogisticRegression(max_iter=200),
            regressor_factory=LinearRegression,
        )
        coef, p = pillai_trace("X", "Y", ["Z"], df, boolean=False, **factories)
        res_x = citests._boosted_residuals("X", ["Z"], df, **factories)
        res_y = citests._boosted_residuals("Y", ["Z"], df, **factories)
        coef0, p0 = self._reference_steps_oracle(res_x, res_y, n)
        assert coef == pytest.approx(coef0, abs=1e-6)
        assert p == pytest.approx(p0, abs=1e-6)

    def test_continuous_matches_squared_partial_correlation(self):
        # linear Gaussian case with linear regressors: Pillai == r_partial^2
        from sklearn.linear_model import LinearRegression

        rng = np.random.default_rng(4)
        n = 4000
        z = rng.normal(size=n)
        x = 0.8 * z + rng.normal(size=n)
        y = 0.5 * z + 0.4 * x + rng.normal(size=n)
        df = pd.DataFrame({"X": x, "Y": y, "Z": z})
        coef, p = pillai_trace(
            "X", "Y", ["Z"], df, boolean=False,
            regressor_factory=LinearRegression,
        )
        rx = x - LinearRegression().fit(z[:, None], x).predict(z[:, None])
        ry = y - LinearRegression().fit(z[:, None], y).predict(z[:, None])
        r2 = np.corrcoef(rx, ry)[0, 1] ** 2
        assert coef == pytest.approx(r2, abs=1e-6)
        assert p < 1e-6

    def test_categorical_discrimination(self):
        rng = np.random.default_rng(5)
        n = 3000
        z = rng.integers(0, 3, n)
        x = ((z + rng.integers(0, 2, n)) % 3).astype(str)
        y = ((z + rng.integers(0, 2, n)) % 3).astype(str)
        w = rng.integers(0, 3, n).astype(str)
        df = pd.DataFrame({"X": x, "Y": y, "Z": z.astype(str), "W": w})
        # X dep Y marginally (common cause), indep given Z, W indep of all
        assert not pillai_trace("X", "Y", [], df, seed=0)
        assert pillai_trace("X", "Y", ["Z"], df, seed=0)
        assert pillai_trace("W", "Y", [], df, seed=0)

    def test_no_conditioning_set(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=500)
        df = pd.DataFrame({"X": x, "Y": 0.9 * x + 0.1 * rng.normal(size=500)})
        coef, p = pillai_trace("X", "Y", [], df, boolean=False)
        assert coef > 0.5 and p < 1e-9

    def test_single_state_variable(self):
        df = pd.DataFrame({"X": ["only"] * 50, "Y": np.arange(50.0)})
        coef, p = pillai_trace("X", "Y", [], df, boolean=False)
        assert (coef, p) == (0.0, 1.0)


class TestEdgeStrengthCategorical:
    """Regression for VERDICT r2: edge_strength crashed with
    'could not convert string to float' on categorical sampled data."""

    def test_edge_strength_on_sampled_categorical(self):
        model = get_example_model("cancer")
        df = model.simulate(n_samples=3000, seed=0, show_progress=False)
        strengths = model.edge_strength(df)
        assert set(strengths) == set(model.edges())
        assert all(0.0 <= v <= 1.0 for v in strengths.values())
        # stored on the graph too (reference DAG.py:1741)
        for e, v in strengths.items():
            assert model.edges[e]["strength"] == v

    def test_edge_strength_skips_latent_edges(self):
        from pgmpy_tpu.base import DAG

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {"A": rng.integers(0, 2, 500).astype(str),
             "B": rng.integers(0, 2, 500).astype(str)}
        )
        dag = DAG([("L", "A"), ("A", "B")], latents=["L"])
        s = dag.edge_strength(df)
        assert ("L", "A") not in s and ("A", "B") in s

    def test_edge_strength_single_edge(self):
        model = get_example_model("cancer")
        df = model.simulate(n_samples=2000, seed=1, show_progress=False)
        s = model.edge_strength(df, edges=("Smoker", "Cancer"))
        assert set(s) == {("Smoker", "Cancer")}

    def test_validate_with_pillai_metrics(self):
        model = get_example_model("cancer")
        df = model.simulate(n_samples=1500, seed=2, show_progress=False)
        out = model.validate(df, metrics=("fisher-c",))
        row = out[out["metric"] == "fisher-c"]["value"].iloc[0]
        assert not (isinstance(row, str) and row.startswith("error"))


class TestResidualTestsCategoricalSafe:
    def test_pearsonr_categorical_z(self):
        rng = np.random.default_rng(7)
        n = 1000
        z = rng.integers(0, 3, n)
        x = z + rng.normal(size=n)
        y = z + rng.normal(size=n)
        df = pd.DataFrame({"X": x, "Y": y, "Z": pd.Categorical(z.astype(str))})
        r, p = pearsonr("X", "Y", ["Z"], df, boolean=False)
        assert np.isfinite(r) and np.isfinite(p)

    def test_gcm_categorical_z(self):
        rng = np.random.default_rng(8)
        n = 1000
        z = rng.integers(0, 3, n)
        x = z + rng.normal(size=n)
        y = rng.normal(size=n)
        df = pd.DataFrame({"X": x, "Y": y, "Z": z.astype(str)})
        t, p = gcm("X", "Y", ["Z"], df, boolean=False)
        assert np.isfinite(t) and p > 0.01

    def test_gcm_with_sklearn_regressor(self):
        from sklearn.linear_model import LinearRegression

        rng = np.random.default_rng(9)
        n = 800
        z = rng.normal(size=n)
        df = pd.DataFrame(
            {"X": z + rng.normal(size=n), "Y": z + rng.normal(size=n), "Z": z}
        )
        assert gcm("X", "Y", ["Z"], df, regressor=LinearRegression())
        assert not gcm("X", "Y", [], df, regressor=LinearRegression())
