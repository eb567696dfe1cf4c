"""Doctest lane: the runnable Examples in user-facing docstrings.

The reference documents every public method with numpydoc examples and
runs them under xdoctest in CI (e.g.
``/root/reference/pgmpy/factors/discrete/DiscreteFactor.py:16-128``);
this lane is the same user-documentation gate for the top user-facing
classes here.  Examples run on the forced-CPU lane (conftest) and must
be deterministic (fixed seeds, rounded printing).
"""

import doctest
import importlib

import pytest

MODULES = [
    "pgmpy_tpu.factors.discrete",
    "pgmpy_tpu.factors.cpd",
    "pgmpy_tpu.factors.factor_ops",
    "pgmpy_tpu.base.dag",
    "pgmpy_tpu.models.discrete_bn",
    "pgmpy_tpu.models.linear_gaussian_bn",
    "pgmpy_tpu.models.markov_network",
    "pgmpy_tpu.models.factor_graph",
    "pgmpy_tpu.inference.ve",
    "pgmpy_tpu.inference.bp",
    "pgmpy_tpu.inference.fg_bp",
    "pgmpy_tpu.inference.approx",
    "pgmpy_tpu.inference.causal",
    "pgmpy_tpu.sampling.forward",
    "pgmpy_tpu.sampling.gibbs",
    "pgmpy_tpu.estimators.mle",
    "pgmpy_tpu.estimators.bayes",
    "pgmpy_tpu.estimators.scores",
    "pgmpy_tpu.estimators.hill_climb",
    "pgmpy_tpu.estimators.pc",
    "pgmpy_tpu.estimators.tree_search",
    "pgmpy_tpu.models.dynamic_bn",
    "pgmpy_tpu.models.markov_chain",
    "pgmpy_tpu.estimators.em",
    "pgmpy_tpu.estimators.citests",
    "pgmpy_tpu.factors.noisy_or",
    "pgmpy_tpu.sampling.smc",
    "pgmpy_tpu.parallel.distributed",
    "pgmpy_tpu.independencies.independencies",
    "pgmpy_tpu.metrics.metrics",
    "pgmpy_tpu.utils.utils",
]


@pytest.mark.parametrize("mod_name", MODULES)
def test_module_doctests(mod_name):
    mod = importlib.import_module(mod_name)
    results = doctest.testmod(
        mod,
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS,
        verbose=False,
    )
    assert results.failed == 0, f"{results.failed} doctest failure(s) in {mod_name}"
    # the lane exists to run examples: every listed module must carry some
    assert results.attempted > 0, f"no doctests found in {mod_name}"
