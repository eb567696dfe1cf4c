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

        for it in range(int(iterations)):
            # install current potentials
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

            max_err = 0.0
            for clique in cliques:
                belief = bp.clique_beliefs[clique]
                # align to the stored factor's axis order
                base = jt.get_factors(clique)
                perm = [belief.variables.index(v) for v in base.variables]
                model_marg = np.transpose(
                    np.asarray(belief.values, dtype=np.float64), perm
                )
                model_marg = model_marg / max(model_marg.sum(), 1e-300)
                grad = model_marg - target[clique]
                if estimate_type == "L1":
                    grad = np.sign(grad)
                log_theta[clique] = log_theta[clique] - stepsize * grad
                max_err = max(max_err, float(np.max(np.abs(model_marg - target[clique]))))
            if max_err < 1e-6:
                break
        self.belief_propagation = bp
        return jt
