"""MirrorDescentEstimator: fit Markov-network potentials to empirical
marginals.

Parity: ``/root/reference/pgmpy/estimators/MirrorDescentEstimator.py:13-241``
(MarginalEstimator base, ``estimators/base.py:326-456``).  The caller picks
WHICH marginals to fit (``marginals`` — variable tuples, each matched to the
first junction-tree clique containing it); the fit is exponentiated-gradient
(mirror descent in the entropic geometry) on the clique log-potentials, with
model marginals produced by the compiled BP calibration program each step.
The returned JunctionTree carries the fitted COUNT-SPACE clique marginals as
its factors — the reference's public contract (its docstring examples fit
counts, e.g. a 5-row dataset yields factors summing to 5).
"""

import numpy as np

from pgmpy_tpu.config import logger
from pgmpy_tpu.estimators.base import MarginalEstimator
from pgmpy_tpu.factors.discrete import DiscreteFactor


class MirrorDescentEstimator(MarginalEstimator):
    def estimate(
        self,
        marginals=None,
        metric="L2",
        iterations=100,
        stepsize=None,
        show_progress=True,
        estimate_type=None,
    ):
        """Fit clique potentials so the model's marginals over each scope in
        ``marginals`` match the empirical count marginals.

        marginals: list of variable tuples (default: every clique).  Each
            must be contained in some clique of the junction tree.
        metric: "L2" (gradient = difference) or "L1" (sign of difference).
        stepsize: fixed step on the log-potentials; None picks ``2/n`` with
            backtracking (halve on loss increase), the robust default.
        estimate_type: deprecated alias for ``metric``.

        Returns the fitted JunctionTree (factors = count-space marginals).
        """
        from pgmpy_tpu.factors.factor_dict import FactorDict
        from pgmpy_tpu.inference.bp import BeliefPropagation

        if estimate_type is not None:
            metric = estimate_type
        if metric not in ("L1", "L2"):
            raise ValueError("Metric must be one of L1 or L2.")

        jt = self.model
        cliques = list(jt.nodes())
        n = float(self.data.shape[0])

        # targets: COUNT-space marginals over each requested scope, each
        # assigned to the first clique that contains it (reference
        # _clique_to_marginal, base.py:326-355)
        if marginals is None:
            marginals = [tuple(c) for c in cliques]
        observed = FactorDict.from_dataframe(self.data, [tuple(m) for m in marginals])
        clique_to_marginal = {clique: [] for clique in cliques}
        for scope in marginals:
            y = observed[tuple(scope)]
            for clique in cliques:
                if set(scope) <= set(clique):
                    clique_to_marginal[clique].append(y)
                    break
            else:
                raise ValueError(
                    f"Could not find a corresponding clique for marginal: {scope}"
                    f" out of cliques: {cliques}"
                )

        # initialize log-potentials at zero (maximum entropy start), or warm
        # start from a previous estimate() call (reference base.py theta)
        card = {clique: jt.get_factors(clique).cardinality for clique in cliques}
        varorder = {clique: list(jt.get_factors(clique).variables) for clique in cliques}
        prev = getattr(self, "theta", None)
        if prev:
            log_theta = {
                clique: np.asarray(prev[clique].values, dtype=np.float64)
                for clique in cliques
            }
        else:
            log_theta = {
                clique: np.zeros([int(c) for c in card[clique]]) for clique in cliques
            }

        # the calibration PROGRAM depends only on structure: compile it ONCE
        # and feed it new potential arrays each iteration
        bp = BeliefPropagation(jt)
        program = bp._program
        calibrate = program.executor("marginalize")
        factor_cliques = []
        for f in bp._input_factors:
            factor_cliques.append(
                next(c for c in cliques if set(c) == set(f.variables))
            )
        perms = {}
        for clique in cliques:
            prog_clique = next(pc for pc in program.cliques if set(pc) == set(clique))
            perms[clique] = (
                program.index[prog_clique],
                [list(prog_clique).index(v) for v in varorder[clique]],
            )

        def model_marginals(theta):
            """One device calibration -> count-space clique marginals."""
            arrays = []
            for f, clique in zip(bp._input_factors, factor_cliques):
                vals = np.exp(theta[clique])
                if list(f.variables) != varorder[clique]:
                    vals = np.transpose(
                        vals, [varorder[clique].index(v) for v in f.variables]
                    )
                arrays.append(vals)
            beliefs, _ = calibrate(arrays)
            mu = {}
            for clique in cliques:
                c_idx, perm = perms[clique]
                m = np.asarray(beliefs[c_idx], dtype=np.float64)
                if perm != list(range(len(perm))):
                    m = np.transpose(m, perm)
                mu[clique] = m / max(m.sum(), 1e-300) * n
            return mu

        def loss_and_grad(mu):
            loss = 0.0
            grad = {}
            for clique in cliques:
                g = np.zeros_like(mu[clique])
                for y in clique_to_marginal[clique]:
                    keep_axes = [varorder[clique].index(v) for v in y.variables]
                    drop_axes = tuple(
                        i for i in range(len(varorder[clique])) if i not in keep_axes
                    )
                    proj = mu[clique].sum(axis=drop_axes)
                    # axes now ordered by ascending original position; align to y
                    kept_sorted = sorted(keep_axes)
                    order = [kept_sorted.index(a) for a in keep_axes]
                    proj = np.transpose(proj, order)
                    diff = proj - np.asarray(y.values, dtype=np.float64)
                    if metric == "L1":
                        loss += np.abs(diff).sum()
                        d = np.sign(diff)
                    else:
                        loss += 0.5 * float((diff * diff).sum())
                        d = diff
                    # broadcast the marginal-scope gradient over the clique:
                    # permute d's axes into clique order, insert singleton
                    # axes for the summed-out dims, let numpy broadcast
                    d_c = np.transpose(d, np.argsort(keep_axes))
                    full_shape = [1] * len(varorder[clique])
                    for ax in keep_axes:
                        full_shape[ax] = mu[clique].shape[ax]
                    g = g + d_c.reshape(full_shape)
                grad[clique] = g
            return loss, grad

        alpha = float(stepsize) if stepsize is not None else 2.0 / max(n, 1.0)
        line_search = stepsize is None
        mu = model_marginals(log_theta)
        loss, grad = loss_and_grad(mu)
        for it in range(int(iterations)):
            new_theta = {
                clique: log_theta[clique] - alpha * grad[clique] for clique in cliques
            }
            new_mu = model_marginals(new_theta)
            new_loss, new_grad = loss_and_grad(new_mu)
            if line_search and new_loss > loss and alpha > 1e-12:
                alpha *= 0.5
                continue
            if line_search:
                alpha *= 1.2
            log_theta, mu, loss, grad = new_theta, new_mu, new_loss, new_grad
            if max(float(np.max(np.abs(g))) for g in grad.values()) < 1e-6 * n:
                break

        # public contract: the returned tree carries the fitted COUNT-space
        # marginals; keep a calibrated BP over the fitted potentials for
        # downstream queries
        self.theta = {
            clique: DiscreteFactor(
                varorder[clique],
                [int(c) for c in card[clique]],
                log_theta[clique],
                state_names=dict(jt.get_factors(clique).state_names),
            )
            for clique in cliques
        }
        pot_jt = jt.copy()
        pot_jt.factors = [
            DiscreteFactor(
                varorder[clique],
                [int(c) for c in card[clique]],
                np.exp(log_theta[clique]),
                state_names=dict(jt.get_factors(clique).state_names),
            )
            for clique in cliques
        ]
        bp = BeliefPropagation(pot_jt)
        bp.calibrate()
        self.belief_propagation = bp
        jt.factors = [
            DiscreteFactor(
                varorder[clique],
                [int(c) for c in card[clique]],
                mu[clique],
                state_names=dict(jt.get_factors(clique).state_names),
            )
            for clique in cliques
        ]
        return jt
