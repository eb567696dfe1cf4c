"""Device-compiled loopy BP (flooding) on non-tree factor graphs.

VERDICT r4 #4: ``fg_bp._run_flooding`` must be a compiled device program
(padded per-edge message tensors in a ``lax.while_loop``), not a host
numpy dict loop.  These tests stress it on grid MRFs — the canonical
loopy fixture — and pin the parity contracts: near-exactness on weakly
coupled grids, bitwise-stable warm starts via ``precomp_messages``, and
one compiled program per graph across evidence changes.

Reference behavior: ``/root/reference/pgmpy/inference/ExactInference.py:
1320-1681`` (recursive per-query message scheduling).
"""

import numpy as np
import pytest

from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.inference import BeliefPropagation
from pgmpy_tpu.inference.fg_bp import BeliefPropagationWithMessagePassing
from pgmpy_tpu.models import DiscreteMarkovNetwork, FactorGraph

# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu


def _grid_factor_graph(n, seed=0, coupling=0.2, card=2):
    """n x n grid MRF as a FactorGraph with pairwise exp(coupling*N(0,1))
    potentials (weak coupling => loopy BP is near-exact)."""
    rng = np.random.default_rng(seed)
    names = [[f"x{i}_{j}" for j in range(n)] for i in range(n)]
    fg = FactorGraph()
    fg.add_nodes_from(v for row in names for v in row)
    factors = []
    for i in range(n):
        for j in range(n):
            for di, dj in ((0, 1), (1, 0)):
                i2, j2 = i + di, j + dj
                if i2 < n and j2 < n:
                    vals = np.exp(coupling * rng.standard_normal((card, card)))
                    factors.append(
                        DiscreteFactor(
                            [names[i][j], names[i2][j2]], [card, card], vals
                        )
                    )
    fg.add_factors(*factors)
    for f in factors:
        fg.add_edges_from((v, f) for v in f.variables)
    return fg


def _markov_twin(fg):
    mn = DiscreteMarkovNetwork()
    mn.add_nodes_from(fg.get_variable_nodes())
    for f in fg.factors:
        mn.add_edge(*f.variables)
    mn.add_factors(*(f.copy() for f in fg.factors))
    return mn


class TestGridFloodingBP:
    def test_grid8_near_exact_vs_junction_tree(self):
        fg = _grid_factor_graph(8, seed=1)
        loopy = BeliefPropagationWithMessagePassing(fg)
        exact = BeliefPropagation(_markov_twin(fg))
        exact.calibrate()
        queried = ["x0_0", "x3_4", "x7_7"]
        got = loopy.query(queried)
        for var in queried:
            want = exact.query([var], show_progress=False)
            np.testing.assert_allclose(
                np.asarray(got[var].values, dtype=np.float64),
                np.asarray(want.values, dtype=np.float64),
                atol=0.02,
            )

    def test_grid8_evidence_vs_junction_tree(self):
        fg = _grid_factor_graph(8, seed=2)
        loopy = BeliefPropagationWithMessagePassing(fg)
        exact = BeliefPropagation(_markov_twin(fg))
        exact.calibrate()
        got = loopy.query(["x4_4"], evidence={"x0_0": 0, "x7_3": 1})["x4_4"]
        want = exact.query(
            ["x4_4"], evidence={"x0_0": 0, "x7_3": 1}, show_progress=False
        )
        np.testing.assert_allclose(
            np.asarray(got.values, dtype=np.float64),
            np.asarray(want.values, dtype=np.float64),
            atol=0.02,
        )

    def test_grid16_stress_valid_and_warm_startable(self):
        fg = _grid_factor_graph(16, seed=3)
        loopy = BeliefPropagationWithMessagePassing(fg)
        all_vars = fg.get_variable_nodes()
        got, messages = loopy.query(all_vars, get_messages=True)
        assert len(got) == 256
        for var, phi in got.items():
            vals = np.asarray(phi.values, dtype=np.float64)
            assert np.all(vals >= 0)
            np.testing.assert_allclose(vals.sum(), 1.0, atol=1e-5)
        # converged messages warm-start to the same fixed point
        again = loopy.query(all_vars, precomp_messages=messages)
        for var in all_vars:
            np.testing.assert_allclose(
                np.asarray(again[var].values, dtype=np.float64),
                np.asarray(got[var].values, dtype=np.float64),
                atol=1e-6,
            )

    def test_one_program_per_graph_across_evidence(self):
        fg = _grid_factor_graph(4, seed=4)
        loopy = BeliefPropagationWithMessagePassing(fg)
        loopy.query(["x0_0"])
        program = loopy._program
        loopy.query(["x1_1"], evidence={"x3_3": 0})
        loopy.query(["x2_2"], evidence={"x0_1": 1, "x3_0": 0})
        # evidence enters as array inputs: structure compiles exactly once
        assert loopy._program is program

    def test_mixed_arity_factors(self):
        # unary + pairwise + ternary factors in one graph exercise the
        # arity-bucketed einsum path
        rng = np.random.default_rng(5)
        fg = FactorGraph()
        fg.add_nodes_from(["a", "b", "c"])
        # tree-structured (unary, unary, ternary) so flooding is exact
        f1 = DiscreteFactor(["a"], [2], rng.random(2) + 0.1)
        f2 = DiscreteFactor(["b"], [3], rng.random(3) + 0.1)
        f3 = DiscreteFactor(["a", "b", "c"], [2, 3, 2],
                            rng.random((2, 3, 2)) + 0.1)
        fg.add_factors(f1, f2, f3)
        for f in (f1, f2, f3):
            fg.add_edges_from((v, f) for v in f.variables)
        got = BeliefPropagationWithMessagePassing(fg).query(["b", "c"])
        # brute-force enumeration oracle
        joint = (
            np.asarray(f1.values)[:, None, None]
            * np.asarray(f2.values)[None, :, None]
            * np.asarray(f3.values)
        )
        joint = joint / joint.sum()
        np.testing.assert_allclose(
            np.asarray(got["b"].values, dtype=np.float64),
            joint.sum(axis=(0, 2)),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["c"].values, dtype=np.float64),
            joint.sum(axis=(0, 1)),
            atol=1e-5,
        )


class TestFloodingEngineContracts:
    """Regressions for the r5 review findings: factor-mutation
    invalidation, dtype-aware early convergence, and per-factor padded
    shapes (no global-max-cardinality blowup)."""

    def _two_var_graph(self, vals):
        fg = FactorGraph()
        fg.add_nodes_from(["a", "b"])
        f = DiscreteFactor(["a", "b"], [2, 2], vals)
        fg.add_factors(f)
        fg.add_edges_from([("a", f), ("b", f)])
        return fg, f

    def test_factor_mutation_invalidates_tables(self):
        import jax.numpy as jnp

        fg, f = self._two_var_graph([2.0, 1.0, 1.0, 3.0])
        bp = BeliefPropagationWithMessagePassing(fg)
        first = np.asarray(bp.query(["b"])["b"].values, dtype=np.float64)
        f.values = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
        after = np.asarray(bp.query(["b"])["b"].values, dtype=np.float64)
        np.testing.assert_allclose(after, [0.5, 0.5], atol=1e-6)
        assert not np.allclose(first, after)

    def test_converges_before_max_iter_and_warm_start_is_instant(self):
        fg = _grid_factor_graph(6, seed=9)
        bp = BeliefPropagationWithMessagePassing(fg)
        res, messages = bp.query(["x0_0"], get_messages=True)
        cold_rounds = bp._program.last_rounds
        assert cold_rounds < 100, "f32 tol floor must allow convergence"
        bp.query(["x0_0"], precomp_messages=messages)
        assert bp._program.last_rounds <= 2, "warm start must exit immediately"

    def test_mixed_cardinality_tables_padded_per_factor(self):
        rng = np.random.default_rng(13)
        fg = FactorGraph()
        fg.add_nodes_from(["big", "s1", "s2", "s3"])
        f1 = DiscreteFactor(["big", "s1"], [21, 2], rng.random((21, 2)) + 0.1)
        f2 = DiscreteFactor(["s1", "s2", "s3"], [2, 2, 2],
                            rng.random((2, 2, 2)) + 0.1)
        fg.add_factors(f1, f2)
        for f in (f1, f2):
            fg.add_edges_from((v, f) for v in f.variables)
        bp = BeliefPropagationWithMessagePassing(fg)
        res = bp.query(["s3"])
        program = bp._program
        # the small arity-3 factor must NOT be padded to (32, 32, 32)
        shapes = [shape for shape, _, _ in program._groups]
        assert (2, 2, 2) in shapes
        assert (32, 2) in shapes
        # and the engine still gives the exact tree answer
        joint = (
            np.asarray(f1.values, dtype=np.float64)[:, :, None, None]
            * np.asarray(f2.values, dtype=np.float64)[None, :, :, :]
        )
        marg = joint.sum(axis=(0, 1, 2))
        np.testing.assert_allclose(
            np.asarray(res["s3"].values, dtype=np.float64),
            marg / marg.sum(), atol=1e-5)
