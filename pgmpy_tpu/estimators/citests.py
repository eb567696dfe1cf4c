"""Conditional-independence tests.

Parity: ``/root/reference/pgmpy/estimators/CITests.py:14-834``.  Discrete
tests build the full (X, Y, Z-config) contingency tensor with the device
count kernel in ONE shot (no per-Z pandas groupby), then evaluate the
power-divergence family vectorized over Z slices.  Continuous tests are
residual-based (jnp lstsq).
"""

import numpy as np
from scipy import stats

from pgmpy_tpu.estimators.base import _CodedData


def get_callable_ci_test(ci_test, data=None):
    tests = {
        "chi_square": chi_square,
        "g_sq": g_sq,
        "log_likelihood": log_likelihood,
        "modified_log_likelihood": modified_log_likelihood,
        "pearsonr": pearsonr,
        "pillai": pillai_trace,
        "gcm": gcm,
        "independence_match": independence_match,
    }
    if callable(ci_test):
        return ci_test
    if isinstance(ci_test, str):
        if ci_test not in tests:
            raise ValueError(f"Unknown ci_test: {ci_test}. Options: {sorted(tests)}")
        return tests[ci_test]
    raise ValueError("ci_test must be a string or callable")


def _contingency(X, Y, Z, data):
    """(cx, cy, n_z_configs) count tensor via the device kernel."""
    coded = data.__dict__.get("_pgmpy_tpu_coded")
    if coded is None:
        coded = _CodedData(data)
        try:
            data.__dict__["_pgmpy_tpu_coded"] = coded
        except Exception:
            pass
    table = coded.counts(X, [Y] + list(Z))
    cx = coded.cards[X]
    cy = coded.cards[Y]
    return table.reshape(cx, cy, -1)


def _power_divergence(X, Y, Z, data, boolean, significance_level, lambda_):
    table = _contingency(X, Y, list(Z), data)
    stat_total, dof_total = 0.0, 0
    for k in range(table.shape[2]):
        sub = table[:, :, k]
        sub = sub[sub.sum(axis=1) > 0][:, sub.sum(axis=0) > 0]
        if sub.shape[0] < 2 or sub.shape[1] < 2:
            continue
        # correction=False: the reference's power_divergence applies no
        # Yates continuity correction on 2x2 tables (ref CITests.py:94-502)
        chi, _, dof, _ = stats.chi2_contingency(
            sub, lambda_=lambda_, correction=False
        )
        stat_total += chi
        dof_total += dof
    if dof_total == 0:
        p_value = 1.0
        stat_total = 0.0
    else:
        p_value = float(stats.chi2.sf(stat_total, dof_total))
    if boolean:
        return p_value >= significance_level
    return stat_total, p_value, dof_total


def power_divergence(X, Y, Z, data, boolean=True, significance_level=0.05, lambda_="cressie-read", **kwargs):
    """Cressie-Read power-divergence family (lambda_ selects the member)."""
    return _power_divergence(X, Y, Z, data, boolean, significance_level, lambda_)


def chi_square(X, Y, Z, data, boolean=True, significance_level=0.05, **kwargs):
    return _power_divergence(X, Y, Z, data, boolean, significance_level, "pearson")


def g_sq(X, Y, Z, data, boolean=True, significance_level=0.05, **kwargs):
    return _power_divergence(
        X, Y, Z, data, boolean, significance_level, "log-likelihood"
    )


def log_likelihood(X, Y, Z, data, boolean=True, significance_level=0.05, **kwargs):
    return g_sq(X, Y, Z, data, boolean=boolean, significance_level=significance_level)


def modified_log_likelihood(X, Y, Z, data, boolean=True, significance_level=0.05, **kwargs):
    return _power_divergence(
        X, Y, Z, data, boolean, significance_level, "mod-log-likelihood"
    )


def _residualize(target, Z, data):
    import jax.numpy as jnp

    y = data[target].to_numpy(dtype=np.float64)
    if not Z:
        return y - y.mean()
    X = np.column_stack(
        [np.ones(len(y))] + [data[z].to_numpy(dtype=np.float64) for z in Z]
    )
    beta, _, _, _ = jnp.linalg.lstsq(jnp.asarray(X), jnp.asarray(y))
    return y - X @ np.asarray(beta, dtype=np.float64)


def pearsonr(X, Y, Z, data, boolean=True, significance_level=0.05, **kwargs):
    """Partial correlation: Pearson r of the Z-residuals with a t-test."""
    Z = list(Z)
    rx = _residualize(X, Z, data)
    ry = _residualize(Y, Z, data)
    r = float(np.corrcoef(rx, ry)[0, 1])
    n = len(rx)
    dof = n - len(Z) - 2
    if abs(r) >= 1.0:
        p_value = 0.0
    else:
        t = r * np.sqrt(dof / (1 - r**2))
        p_value = float(2 * stats.t.sf(np.abs(t), dof))
    if boolean:
        return p_value >= significance_level
    return r, p_value


def pillai_trace(X, Y, Z, data, boolean=True, significance_level=0.05, **kwargs):
    """Pillai's trace effect size of X on Y after residualizing on Z; for
    univariate X/Y this is the squared partial correlation, tested with an
    F statistic."""
    Z = list(Z)
    rx = _residualize(X, Z, data)
    ry = _residualize(Y, Z, data)
    r = float(np.corrcoef(rx, ry)[0, 1])
    effect = r**2
    n = len(rx)
    dof_denominator = n - len(Z) - 2
    if effect >= 1.0:
        p_value = 0.0
    else:
        f_stat = effect / max(1 - effect, 1e-12) * dof_denominator
        p_value = float(stats.f.sf(f_stat, 1, dof_denominator))
    if boolean:
        return p_value >= significance_level
    return effect, p_value


def gcm(X, Y, Z, data, boolean=True, significance_level=0.05, regressor=None, **kwargs):
    """Generalized covariance measure (Shah & Peters 2020) with linear (or
    user-provided sklearn-compatible) regressors."""
    Z = list(Z)
    if regressor is None:
        rx = _residualize(X, Z, data)
        ry = _residualize(Y, Z, data)
    else:
        import sklearn.base

        Zmat = data.loc[:, Z].to_numpy(dtype=np.float64) if Z else None
        if Zmat is None or Zmat.size == 0:
            rx = data[X].to_numpy(dtype=np.float64) - data[X].mean()
            ry = data[Y].to_numpy(dtype=np.float64) - data[Y].mean()
        else:
            rx = data[X].to_numpy(dtype=np.float64) - sklearn.base.clone(
                regressor
            ).fit(Zmat, data[X]).predict(Zmat)
            ry = data[Y].to_numpy(dtype=np.float64) - sklearn.base.clone(
                regressor
            ).fit(Zmat, data[Y]).predict(Zmat)
    n = len(rx)
    prod = rx * ry
    test_stat = np.sqrt(n) * prod.mean() / max(prod.std(), 1e-12)
    p_value = float(2 * stats.norm.sf(abs(test_stat)))
    if boolean:
        return p_value >= significance_level
    return float(test_stat), p_value


def independence_match(X, Y, Z, independencies=None, **kwargs):
    """Oracle CI test against an Independencies object."""
    from pgmpy_tpu.independencies import IndependenceAssertion

    if independencies is None:
        raise ValueError("independencies must be provided for independence_match")
    return IndependenceAssertion(X, Y, Z) in independencies
