"""VariableElimination: exact posterior queries as fused contractions.

The design center (reference: ``/root/reference/pgmpy/inference/
ExactInference.py:34-724`` and ``EliminationOrder.py:11-166``): a host-side
planner prunes the model, slices evidence out of the CPT arrays, maps
variables to integer einsum labels and emits ONE contraction over all
factors (``ops/einsum.sum_product_planned``) — XLA fuses and caches the
compiled program per shape signature, so repeated queries with the same
structure cost one kernel launch.  The classic per-variable elimination loop
(with MinFill/MinNeighbors/MinWeight/WeightedMinFill orders) is kept for
``max_marginal``/diagnostics and for contraction shapes where a staged loop
beats a single einsum.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from pgmpy_tpu.config import config, logger
from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.factors.factor_ops import factor_product
from pgmpy_tpu.inference.base import Inference
from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork
from pgmpy_tpu.ops.einsum import make_axis_map, sum_product_planned


# ---------------------------------------------------------------------- #
# elimination-order heuristics (host side)
# ---------------------------------------------------------------------- #
class BaseEliminationOrder:
    """Greedy ordering: repeatedly eliminate the lowest-cost node."""

    def __init__(self, model):
        if not isinstance(model, DiscreteBayesianNetwork):
            raise ValueError("Model should be a DiscreteBayesianNetwork instance")
        self.bayesian_model = model.copy()
        self.moralized_model = self.bayesian_model.moralize()

    def cost(self, node):
        return 0

    def get_elimination_order(self, nodes=None, show_progress=False):
        if nodes is None:
            nodes = self.bayesian_model.nodes()
        nodes = list(nodes)
        ordering = []
        while nodes:
            scores = {node: self.cost(node) for node in nodes}
            min_score_node = min(scores, key=scores.get)
            ordering.append(min_score_node)
            nodes.remove(min_score_node)
            self.bayesian_model.remove_node(min_score_node)
            self.moralized_model = self.bayesian_model.moralize()
        return ordering

    def fill_in_edges(self, node):
        neighbors = list(self.moralized_model.neighbors(node))
        return [
            edge
            for edge in itertools.combinations(neighbors, 2)
            if not self.moralized_model.has_edge(*edge)
        ]


class WeightedMinFill(BaseEliminationOrder):
    def cost(self, node):
        edges = itertools.combinations(self.moralized_model.neighbors(node), 2)
        return sum(
            self.bayesian_model.get_cardinality(u) * self.bayesian_model.get_cardinality(v)
            for u, v in edges
            if not self.moralized_model.has_edge(u, v)
        )


class MinNeighbors(BaseEliminationOrder):
    def cost(self, node):
        return len(list(self.moralized_model.neighbors(node)))


class MinWeight(BaseEliminationOrder):
    def cost(self, node):
        return float(
            np.prod(
                [
                    self.bayesian_model.get_cardinality(nb)
                    for nb in self.moralized_model.neighbors(node)
                ]
            )
        )


class MinFill(BaseEliminationOrder):
    def cost(self, node):
        return len(self.fill_in_edges(node))


_ORDER_HEURISTICS = {
    "weightedminfill": WeightedMinFill,
    "minneighbors": MinNeighbors,
    "minweight": MinWeight,
    "minfill": MinFill,
}


class VariableElimination(Inference):
    # ------------------------------------------------------------------ #
    # helpers
    # ------------------------------------------------------------------ #
    def _get_working_factors(self, evidence):
        """{var: set((factor, origin))} with evidence sliced out."""
        working_factors = {
            node: {(factor, None) for factor in self.factors[node]}
            for node in self.factors
        }
        if evidence:
            for evidence_var in evidence:
                for factor, origin in list(working_factors[evidence_var]):
                    factor_reduced = factor.reduce(
                        [(evidence_var, evidence[evidence_var])],
                        inplace=False,
                        show_warnings=False,
                    )
                    for var in factor_reduced.scope():
                        working_factors[var].discard((factor, origin))
                        working_factors[var].add((factor_reduced, evidence_var))
                del working_factors[evidence_var]
        return working_factors

    def _get_elimination_order(self, variables, evidence, elimination_order, show_progress=False):
        to_eliminate = (
            set(self.variables)
            - set(variables)
            - set(evidence.keys() if evidence else [])
        )
        if isinstance(elimination_order, (list, tuple)):
            if any(
                var in elimination_order
                for var in set(variables) | set(evidence.keys() if evidence else [])
            ):
                raise ValueError(
                    "Elimination order contains variables which are in variables or evidence args"
                )
            # drop variables pruned out of the reduced model
            elimination_order = [
                var for var in elimination_order if var in self.model.nodes()
            ]
            if set(elimination_order) != to_eliminate:
                raise ValueError(
                    "Elimination order doesn't contain all the variables which need "
                    "to be eliminated. The variables which need to be eliminated are "
                    f"{to_eliminate}"
                )
            return list(elimination_order)
        if not to_eliminate:
            return []
        if isinstance(self.model, DiscreteBayesianNetwork) and str(
            elimination_order
        ).lower() in _ORDER_HEURISTICS:
            # compute the heuristic order on the reduced model
            model_copy = self.model.copy()
            order = _ORDER_HEURISTICS[elimination_order.lower()](
                model_copy
            ).get_elimination_order(list(to_eliminate), show_progress=show_progress)
            return order
        # fallback: arbitrary but deterministic
        return sorted(to_eliminate, key=str)

    # ------------------------------------------------------------------ #
    # the fused ("greedy") path: one einsum over all evidence-sliced CPTs
    # ------------------------------------------------------------------ #
    def _fused_query(self, variables, evidence, joint):
        model, evidence = self._prune_bayesian_model(variables, evidence)
        evidence = evidence or {}

        arrays = []
        scopes = []
        state_names = {}
        for cpd in model.cpds:
            factor = cpd.to_factor()
            if evidence:
                sliced = [
                    (var, evidence[var]) for var in factor.scope() if var in evidence
                ]
                if sliced:
                    factor = factor.reduce(sliced, inplace=False, show_warnings=False)
            if factor.scope():
                arrays.append(factor.values)
                scopes.append(list(factor.variables))
                state_names.update(factor.state_names)

        var_to_int, operand_axes = make_axis_map(scopes)
        missing = [v for v in variables if v not in var_to_int]
        if missing:
            raise ValueError(f"Query variables not in reduced model: {missing}")
        out_axes = tuple(var_to_int[v] for v in variables)
        values = sum_product_planned(operand_axes, out_axes, arrays)
        values = values / jnp.sum(values)

        cards = {}
        for scope, arr in zip(scopes, arrays):
            for var, dim in zip(scope, arr.shape):
                cards[var] = dim
        result = DiscreteFactor(
            list(variables),
            [cards[v] for v in variables],
            values,
            state_names={v: state_names[v] for v in variables},
        )
        if joint:
            return result
        return {
            var: result.marginalize(
                [v for v in variables if v != var], inplace=False
            )
            for var in variables
        }

    # ------------------------------------------------------------------ #
    # classic staged elimination (used for maximize + diagnostics)
    # ------------------------------------------------------------------ #
    def _variable_elimination(
        self,
        variables,
        operation,
        evidence=None,
        elimination_order="minfill",
        joint=True,
        show_progress=False,
    ):
        if isinstance(variables, str):
            raise TypeError("variables must be a list of strings")
        if isinstance(evidence, str):
            raise TypeError("evidence must be a list of strings")
        common_vars = set(evidence if evidence is not None else []).intersection(
            set(variables)
        )
        if common_vars:
            raise ValueError(f"Can't have the same variables in both `variables` and `evidence`. Found in both: {common_vars}")

        if not variables:
            all_factors = []
            for factor_li in self.factors.values():
                all_factors.extend(factor_li)
            if joint:
                return factor_product(*set(all_factors))
            return set(all_factors)

        working_factors = self._get_working_factors(evidence)
        elimination_order = self._get_elimination_order(
            variables, evidence, elimination_order, show_progress=show_progress
        )

        eliminated_variables = set()
        for var in elimination_order:
            factors = [
                factor
                for factor, _ in working_factors[var]
                if not set(factor.variables).intersection(eliminated_variables)
            ]
            phi = factor_product(*factors)
            phi = getattr(phi, operation)([var], inplace=False)
            del working_factors[var]
            for variable in phi.variables:
                working_factors[variable].add((phi, var))
            eliminated_variables.add(var)

        final_distribution = set()
        for node in working_factors:
            for factor, origin in working_factors[node]:
                if not set(factor.variables).intersection(eliminated_variables):
                    final_distribution.add((factor, origin))
        final_distribution = [factor for factor, _ in final_distribution]

        if joint:
            if isinstance(self.model, DiscreteBayesianNetwork):
                return factor_product(*final_distribution).normalize(inplace=False)
            return factor_product(*final_distribution)
        query_var_factor = {}
        if isinstance(self.model, DiscreteBayesianNetwork):
            for query_var in variables:
                phi = factor_product(*final_distribution)
                query_var_factor[query_var] = phi.marginalize(
                    list(set(variables) - {query_var}), inplace=False
                ).normalize(inplace=False)
        else:
            for query_var in variables:
                phi = factor_product(*final_distribution)
                query_var_factor[query_var] = phi.marginalize(
                    list(set(variables) - {query_var}), inplace=False
                )
        return query_var_factor

    # ------------------------------------------------------------------ #
    # batched queries: one contraction for N evidence rows
    # ------------------------------------------------------------------ #
    def query_batch(self, variables, evidence):
        """Posterior P(variables | evidence_row) for EVERY row of a batch of
        evidence assignments, in one fused contraction.

        Evidence enters as one-hot "delta factors" carrying a shared batch
        axis instead of per-row slicing — the whole batch is a single
        einsum, so N rows cost one kernel launch (the device analogue of
        the reference's joblib-parallel per-row predict loop,
        ``DiscreteBayesianNetwork.py:731-911``).

        Parameters
        ----------
        variables : list of query variables
        evidence : dict {var: sequence of state names/indices}, all the
            same length n

        Returns
        -------
        (values, state_names): values has shape (n, card_q1, ...) with each
        row normalized; state_names covers the query variables.
        """
        if not evidence:
            raise ValueError("query_batch requires evidence; use query() otherwise")
        n = len(next(iter(evidence.values())))
        ev_vars = sorted(evidence.keys(), key=str)

        model, _ = self._prune_bayesian_model(
            list(variables), {v: 0 for v in ev_vars}
        )
        cpds = {c.variable: c for c in model.cpds}

        arrays, scopes = [], []
        state_names = {}
        cards = {}
        for cpd in model.cpds:
            factor = cpd.to_factor()
            arrays.append(factor.values)
            scopes.append(list(factor.variables))
            state_names.update(factor.state_names)
            for var, card in zip(factor.variables, factor.cardinality):
                cards[var] = int(card)

        # one-hot delta factors with a shared leading batch axis
        deltas = []
        for var in ev_vars:
            if var not in cards:
                raise ValueError(f"Evidence variable {var} pruned out of the model")
            names = state_names[var]
            codes = np.asarray(
                [
                    names.index(s)
                    if s in names
                    else int(s)
                    for s in evidence[var]
                ],
                dtype=np.int32,
            )
            onehot = jax.nn.one_hot(jnp.asarray(codes), cards[var], dtype=config.DTYPE)
            deltas.append(onehot)

        var_to_int, operand_axes = make_axis_map(scopes + [[v] for v in ev_vars])
        batch_axis = len(var_to_int)
        interleaved = []
        for arr, axes in zip(arrays, operand_axes[: len(arrays)]):
            interleaved.append(arr)
            interleaved.append(list(axes))
        for delta, axes in zip(deltas, operand_axes[len(arrays):]):
            interleaved.append(delta)
            interleaved.append([batch_axis, axes[0]])
        out_axes = [batch_axis] + [var_to_int[v] for v in variables]
        interleaved.append(out_axes)

        from pgmpy_tpu.ops.einsum import PRECISION

        values = jnp.einsum(*interleaved, optimize="greedy", precision=PRECISION)
        norm = jnp.sum(values.reshape(n, -1), axis=1).reshape(
            (n,) + (1,) * len(variables)
        )
        values = values / norm
        return values, {v: state_names[v] for v in variables}

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #
    def query(
        self,
        variables,
        evidence=None,
        virtual_evidence=None,
        elimination_order="greedy",
        joint=True,
        show_progress=False,
    ):
        """Posterior P(variables | evidence).

        ``elimination_order="greedy"`` (default) uses the fused single-einsum
        path; MinFill/MinNeighbors/MinWeight/WeightedMinFill or an explicit
        order run the staged loop.
        """
        evidence = evidence if evidence is not None else {}
        if set(variables) & set(evidence.keys()):
            raise ValueError(f"Can't have the same variables in both `variables` and `evidence`. Found in both: {set(variables) & set(evidence.keys())}")

        if virtual_evidence:
            original_model = self.model
            try:
                self._virtual_evidence(virtual_evidence)
                virt_evidence = {
                    "__" + str(cpd.variables[0]): 0 for cpd in virtual_evidence
                }
                evidence = {**evidence, **virt_evidence}
                return self.query(
                    variables=variables,
                    evidence=evidence,
                    virtual_evidence=None,
                    elimination_order=elimination_order,
                    joint=joint,
                    show_progress=show_progress,
                )
            finally:
                self.__init__(original_model)

        if (
            isinstance(self.model, DiscreteBayesianNetwork)
            and str(elimination_order).lower() == "greedy"
        ):
            return self._fused_query(list(variables), evidence, joint)

        if isinstance(self.model, DiscreteBayesianNetwork):
            model_reduced, evidence = self._prune_bayesian_model(variables, evidence)
            reduced_ve = VariableElimination(model_reduced)
            return reduced_ve._variable_elimination(
                variables=variables,
                operation="marginalize",
                evidence=evidence,
                elimination_order=elimination_order,
                joint=joint,
                show_progress=show_progress,
            )
        return self._variable_elimination(
            variables=variables,
            operation="marginalize",
            evidence=evidence,
            elimination_order=elimination_order,
            joint=joint,
            show_progress=show_progress,
        )

    def max_marginal(
        self,
        variables=None,
        evidence=None,
        elimination_order="minfill",
        show_progress=False,
    ):
        """max_{other vars} P(...); scalar when ``variables`` covers the
        remaining factor."""
        if not variables:
            variables = []
        final_distribution = self._variable_elimination(
            variables,
            "maximize",
            evidence=evidence,
            elimination_order=elimination_order,
            joint=True,
            show_progress=show_progress,
        )
        return float(np.max(np.asarray(final_distribution.values)))

    def map_query(
        self,
        variables=None,
        evidence=None,
        virtual_evidence=None,
        elimination_order="greedy",
        show_progress=False,
    ):
        """MAP assignment of ``variables`` given evidence (argmax of the
        joint posterior over the query variables).  ``variables=None``
        means all non-evidence variables (reference semantics)."""
        if not variables:
            variables = sorted(
                set(self.variables) - set(evidence or {}), key=str
            )
        variables = list(variables)
        common_vars = set(evidence if evidence is not None else []) & set(variables)
        if common_vars:
            raise ValueError(f"Can't have the same variables in both `variables` and `evidence`. Found in both: {common_vars}")

        final_distribution = self.query(
            variables=variables,
            evidence=evidence,
            virtual_evidence=virtual_evidence,
            elimination_order=elimination_order,
            joint=True,
            show_progress=show_progress,
        )
        argmax = int(np.argmax(np.asarray(final_distribution.values)))
        assignment = final_distribution.assignment([argmax])[0]
        return {var: value for var, value in assignment}

    def induced_graph(self, elimination_order):
        """Union of all factor scopes created while eliminating in the given
        order (as an UndirectedGraph)."""
        from pgmpy_tpu.base.undirected import UndirectedGraph

        if set(elimination_order) != set(self.variables):
            raise ValueError("Set of variables in elimination order different from variables in model")

        eliminated_variables = set()
        working_factors = {
            node: [factor.scope() for factor in self.factors[node]]
            for node in self.factors
        }
        cliques = set()
        for factors in working_factors.values():
            for factor in factors:
                cliques.add(tuple(factor))

        for var in elimination_order:
            factors = [
                factor
                for factor in working_factors[var]
                if not set(factor).intersection(eliminated_variables)
            ]
            phi_scope = set(itertools.chain(*factors)) - {var}
            cliques.add(tuple(phi_scope | {var}))
            del working_factors[var]
            for variable in phi_scope:
                working_factors[variable].append(list(phi_scope))
            eliminated_variables.add(var)

        edges_comb = [
            itertools.combinations(c, 2) for c in filter(lambda x: len(x) > 1, cliques)
        ]
        return UndirectedGraph(itertools.chain(*edges_comb))

    def induced_width(self, elimination_order):
        induced_graph = self.induced_graph(elimination_order)
        import networkx as nx

        return max(len(clique) for clique in nx.find_cliques(induced_graph)) - 1
