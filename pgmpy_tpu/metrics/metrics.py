"""Model-quality metrics.

Parity: ``/root/reference/pgmpy/metrics/metrics.py:17-536``.
"""

import itertools

import numpy as np
import pandas as pd
from scipy import stats

from pgmpy_tpu.config import logger


def correlation_score(
    model,
    data,
    test="chi_square",
    significance_level=0.05,
    score=None,
    return_summary=False,
):
    """Agreement between model-implied d-separations and CI tests on data,
    summarized by a sklearn-style classification metric."""
    from sklearn.metrics import f1_score

    from pgmpy_tpu.estimators.citests import get_callable_ci_test
    from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork

    if score is None:
        score = f1_score
    test_fn = get_callable_ci_test(test)
    if not isinstance(model, DiscreteBayesianNetwork):
        raise ValueError(f"model must be a DiscreteBayesianNetwork. Got {type(model)}")
    if set(model.nodes()) != set(data.columns):
        raise ValueError("Missing columns in data. Can't be used for testing.")

    results = []
    for i, j in itertools.combinations(model.nodes(), 2):
        edge_present = model.has_edge(i, j) or model.has_edge(j, i)
        dependent = not test_fn(
            i, j, [], data, boolean=True, significance_level=significance_level
        )
        results.append({"var1": i, "var2": j, "structure": edge_present, "statistic": dependent})
    results = pd.DataFrame(results)
    metric = float(
        score(y_true=results["structure"].to_numpy(), y_pred=results["statistic"].to_numpy())
    )
    if return_summary:
        return results
    return metric


def log_likelihood_score(model, data):
    """Total log-likelihood of ``data`` under the fitted model."""
    from pgmpy_tpu.metrics.bn_inference import BayesianModelProbability

    model.check_model()
    return BayesianModelProbability(model).score(data)


def structure_score(model, data, scoring_method="bic-d", **kwargs):
    """Structure score (k2/bdeu/bds/bic-d/aic-d/...) of model given data."""
    from pgmpy_tpu.estimators.scores import get_scoring_method

    scorer, _ = get_scoring_method(scoring_method, data, use_cache=False)
    return float(scorer.score(model))


def implied_cis(model, data, ci_test, show_progress=True):
    """Test every local independence implied by the model structure.

    Returns a DataFrame with (u, v, cond_set, p_value)."""
    from pgmpy_tpu.estimators.citests import get_callable_ci_test

    test_fn = get_callable_ci_test(ci_test)
    results = []
    for u, v, cond in _implied_ci_triples(model):
        out = test_fn(u, v, list(cond), data, boolean=False)
        p_value = out[1]
        results.append({"u": u, "v": v, "cond_vars": cond, "p_value": p_value})
    return pd.DataFrame(results)


def _implied_ci_triples(model):
    """(u, v, markov-blanket conditioning set) for each non-adjacent pair
    implied independent by the structure (u ⟂ v | parents(v) etc.)."""
    triples = []
    for u in model.nodes():
        non_descendants = (
            set(model.nodes()) - {u} - set(_descendants(model, u))
        )
        parents = set(model.get_parents(u))
        for v in sorted(non_descendants - parents, key=str):
            triples.append((u, v, tuple(sorted(parents, key=str))))
    return triples


def _descendants(model, node):
    import networkx as nx

    return nx.descendants(model, node)


def fisher_c(model, data, ci_test, compute_rmsea=False, show_progress=True):
    """Fisher's C global-fit statistic over the implied CIs."""
    cis = implied_cis(model, data, ci_test, show_progress=show_progress)
    p_values = np.clip(cis["p_value"].to_numpy(dtype=np.float64), 1e-300, 1.0)
    C = -2 * np.log(p_values).sum()
    dof = 2 * len(p_values)
    p_value = float(stats.chi2.sf(C, dof)) if dof else 1.0
    if compute_rmsea:
        n = data.shape[0]
        rmsea = np.sqrt(max((C - dof), 0) / (dof * (n - 1))) if dof else 0.0
        return {"C": float(C), "dof": dof, "p_value": p_value, "rmsea": float(rmsea)}
    return {"C": float(C), "dof": dof, "p_value": p_value}


def SHD(true_model, est_model):
    """Structural Hamming distance between two DAGs: missing + extra +
    wrongly-oriented edges (orientation mistakes count once)."""
    true_edges = set(map(tuple, true_model.edges()))
    est_edges = set(map(tuple, est_model.edges()))
    if set(true_model.nodes()) != set(est_model.nodes()):
        raise ValueError("The graphs must have the same nodes.")
    true_skel = set(map(frozenset, true_edges))
    est_skel = set(map(frozenset, est_edges))
    missing = true_skel - est_skel
    extra = est_skel - true_skel
    common = true_skel & est_skel
    reversed_count = 0
    for e in common:
        u, v = tuple(e)
        if ((u, v) in true_edges) != ((u, v) in est_edges):
            reversed_count += 1
    return len(missing) + len(extra) + reversed_count


def get_metrics(metrics=None):
    available = {
        "correlation_score": correlation_score,
        "log_likelihood_score": log_likelihood_score,
        "structure_score": structure_score,
        "implied_cis": implied_cis,
        "fisher_c": fisher_c,
        "SHD": SHD,
    }
    if metrics is None:
        return available
    return {name: available[name] for name in metrics}
