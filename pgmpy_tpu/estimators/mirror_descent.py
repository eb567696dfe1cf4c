"""MirrorDescentEstimator: fit Markov-network potentials to empirical
clique marginals.

Parity: ``/root/reference/pgmpy/estimators/MirrorDescentEstimator.py:13-241``
(MarginalEstimator base).  Update rule: exponentiated-gradient (mirror
descent in the entropic geometry) on the clique log-potentials, with model
marginals from the compiled BP calibration program each step.
"""

import numpy as np

import jax.numpy as jnp

from pgmpy_tpu.config import logger
from pgmpy_tpu.estimators.base import MarginalEstimator
from pgmpy_tpu.factors.discrete import DiscreteFactor


class MirrorDescentEstimator(MarginalEstimator):
    def estimate(self, estimate_type="L2", iterations=100, stepsize=0.1, show_progress=True):
        """Fit clique potentials so BP marginals match the empirical
        (normalized count) marginals.

        Returns the fitted JunctionTree.
        """
        from pgmpy_tpu.inference.bp import BeliefPropagation

        jt = self.model
        cliques = list(jt.nodes())

        # normalized empirical marginals per clique
        total = self.data.shape[0]
        target = {}
        for clique in cliques:
            emp = self.observed_marginals[tuple(clique)]
            vals = np.asarray(emp.values, dtype=np.float64)
            target[clique] = vals / max(vals.sum(), 1e-300)

        # initialize potentials uniformly (keep the JT's factor objects)
        log_theta = {
            clique: np.zeros_like(target[clique]) for clique in cliques
        }

        # the calibration PROGRAM depends only on structure: compile it ONCE
        # and feed it new potential arrays each iteration (the old loop
        # rebuilt + recompiled a fresh BeliefPropagation per iteration)
        bp = BeliefPropagation(jt)
        program = bp._program
        calibrate = program.executor("marginalize")
        # static alignment: factor input order and belief->factor-axis perms
        factor_cliques = []
        for f in bp._input_factors:
            factor_cliques.append(
                next(c for c in cliques if set(c) == set(f.variables))
            )
        perms = {}
        for clique in cliques:
            base = jt.get_factors(clique)
            prog_clique = next(
                pc for pc in program.cliques if set(pc) == set(clique)
            )
            perms[clique] = (
                program.index[prog_clique],
                [list(prog_clique).index(v) for v in base.variables],
            )

        for it in range(int(iterations)):
            arrays = []
            for f, clique in zip(bp._input_factors, factor_cliques):
                base = jt.get_factors(clique)
                vals = np.exp(log_theta[clique])
                if list(f.variables) != list(base.variables):
                    vals = np.transpose(
                        vals,
                        [list(base.variables).index(v) for v in f.variables],
                    )
                arrays.append(vals)
            beliefs, _ = calibrate(arrays)

            max_err = 0.0
            for clique in cliques:
                c_idx, perm = perms[clique]
                model_marg = np.asarray(beliefs[c_idx], dtype=np.float64)
                if perm != list(range(len(perm))):
                    model_marg = np.transpose(model_marg, perm)
                model_marg = model_marg / max(model_marg.sum(), 1e-300)
                grad = model_marg - target[clique]
                if estimate_type == "L1":
                    grad = np.sign(grad)
                log_theta[clique] = log_theta[clique] - stepsize * grad
                max_err = max(max_err, float(np.max(np.abs(model_marg - target[clique]))))
            if max_err < 1e-6:
                break

        # install the fitted potentials and return a calibrated BP
        new_factors = []
        for clique in cliques:
            base = jt.get_factors(clique)
            new_factors.append(
                DiscreteFactor(
                    list(base.variables),
                    [int(c) for c in base.cardinality],
                    np.exp(log_theta[clique]),
                    state_names=dict(base.state_names),
                )
            )
        jt.factors = new_factors
        bp = BeliefPropagation(jt)
        bp.calibrate()
        self.belief_propagation = bp
        return jt
