"""VariableElimination: exact posterior queries as fused contractions.

The design center (reference behavior: ``/root/reference/pgmpy/inference/
ExactInference.py:34-724``, ``EliminationOrder.py:11-166``): a host-side
planner prunes the model, maps variables to integer einsum labels and emits
contractions over the raw CPT arrays.

Three execution paths, all operating on the int-label program
representation (arrays + integer axis tuples, never factor objects):

* **compiled single query** — one jitted program per (query vars, evidence
  vars) signature, cached on the model; evidence enters as state *codes*
  (device input), so repeated queries with different evidence values reuse
  the compiled executable.  Tiny contractions are placed on the host CPU
  backend: a remote-TPU dispatch costs ~1ms of link latency that dwarfs a
  microsecond contraction.
* **staged elimination** — per-variable label elimination for
  ``max_marginal`` / explicit elimination orders: each step contracts the
  group of live operands containing the label down to the union scope minus
  the label (sum or max reduction).
* **batched queries** (``query_batch``) — N evidence rows as one-hot delta
  factors sharing a batch axis; the whole batch is a single einsum.
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
from pgmpy_tpu.ops.einsum import PRECISION, make_axis_map, sum_product_planned


# ---------------------------------------------------------------------- #
# elimination-order heuristics (host side)
# ---------------------------------------------------------------------- #
class BaseEliminationOrder:
    """Greedy triangulation ordering on the moral graph.

    The graph lives in a boolean adjacency matrix so per-candidate costs are
    vectorized numpy, and eliminating a node *marries its remaining
    neighbors* (the fill-in clique the staged contraction will actually
    create) instead of re-moralizing the shrinking DAG each step.
    Subclasses define the cost of eliminating node ``i`` next.
    """

    def __init__(self, model):
        if not isinstance(model, DiscreteBayesianNetwork):
            raise ValueError("Model should be a DiscreteBayesianNetwork instance")
        self._nodes = list(model.nodes())
        self._idx = {n: i for i, n in enumerate(self._nodes)}
        n = len(self._nodes)
        self._adj = np.zeros((n, n), dtype=bool)
        for u, v in model.moralize().edges():
            i, j = self._idx[u], self._idx[v]
            if i != j:
                self._adj[i, j] = self._adj[j, i] = True
        cards = model.get_cardinality()
        self._card = np.asarray(
            [max(int(cards[node]), 1) for node in self._nodes], dtype=np.float64
        )
        self._alive = np.ones(n, dtype=bool)

    # -- cost interface ------------------------------------------------- #
    def cost(self, node):
        """Cost of eliminating ``node`` next (lower is better)."""
        return self._cost(self._idx[node])

    def _cost(self, i):
        return 0.0

    def _neighbors(self, i):
        return np.flatnonzero(self._adj[i] & self._alive)

    def fill_in_edges(self, node):
        """Edges the elimination of ``node`` would add between its
        currently non-adjacent neighbors."""
        nb = self._neighbors(self._idx[node])
        return [
            (self._nodes[a], self._nodes[b])
            for a, b in itertools.combinations(nb, 2)
            if not self._adj[a, b]
        ]

    def get_elimination_order(self, nodes=None, show_progress=False):
        """Greedily order ``nodes`` (default: all) by repeated min-cost
        elimination with fill-in."""
        if nodes is None:
            nodes = self._nodes
        candidates = {self._idx[n] for n in nodes}
        order = []
        while candidates:
            best = min(candidates, key=lambda i: (self._cost(i), i))
            order.append(self._nodes[best])
            nb = self._neighbors(best)
            if nb.size > 1:
                self._adj[np.ix_(nb, nb)] = True
                self._adj[nb, nb] = False
            self._adj[best, :] = False
            self._adj[:, best] = False
            self._alive[best] = False
            candidates.remove(best)
        return order


class MinNeighbors(BaseEliminationOrder):
    def _cost(self, i):
        return int(self._neighbors(i).size)


class MinWeight(BaseEliminationOrder):
    def _cost(self, i):
        return float(np.prod(self._card[self._neighbors(i)]))


class MinFill(BaseEliminationOrder):
    def _cost(self, i):
        nb = self._neighbors(i)
        if nb.size < 2:
            return 0
        sub = self._adj[np.ix_(nb, nb)]
        iu = np.triu_indices(nb.size, k=1)
        return int((~sub[iu]).sum())


class WeightedMinFill(BaseEliminationOrder):
    def _cost(self, i):
        nb = self._neighbors(i)
        if nb.size < 2:
            return 0.0
        sub = self._adj[np.ix_(nb, nb)]
        weights = np.outer(self._card[nb], self._card[nb])
        iu = np.triu_indices(nb.size, k=1)
        return float((weights[iu] * ~sub[iu]).sum())


_ORDER_HEURISTICS = {
    "weightedminfill": WeightedMinFill,
    "minneighbors": MinNeighbors,
    "minweight": MinWeight,
    "minfill": MinFill,
}


# ---------------------------------------------------------------------- #
# compiled per-signature query programs
# ---------------------------------------------------------------------- #
# Below this many total tensor elements the contraction runs on the host
# CPU backend: remote-TPU dispatch latency (~ms over the tunnel) dwarfs a
# microsecond-scale einsum.  Larger programs go to the accelerator.
_SMALL_QUERY_ELEMENTS = 65536


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


class _CompiledQuery:
    """One jitted contraction per (query vars, evidence vars) signature.

    Built once: prune the model for this signature, collect the CPT arrays
    and their int-label axes, and close a jitted function over them that
    takes the evidence state codes as its only (device) input.  Calling it
    with different evidence values is a single executable dispatch — no
    host-side pruning, slicing, or path planning per call.
    """

    def __init__(self, infer, variables, ev_vars):
        model, kept_evidence = infer._prune_bayesian_model(
            list(variables), {v: 0 for v in ev_vars}
        )
        self.query_vars = list(variables)
        self.ev_vars = list(ev_vars)
        self.kept = [v for v in ev_vars if v in kept_evidence]

        arrays, scopes = [], []
        state_names, cards = {}, {}
        for cpd in model.cpds:
            arrays.append(cpd.values)
            scopes.append(list(cpd.variables))
            state_names.update(cpd.state_names)
            for var, card in zip(cpd.variables, cpd.cardinality):
                cards[var] = int(card)

        missing = [v for v in variables if v not in cards]
        if missing:
            raise ValueError(f"Query variables not in reduced model: {missing}")

        var_to_int, operand_axes = make_axis_map(scopes + [[v] for v in self.kept])
        out_axes = [var_to_int[v] for v in self.query_vars]
        self.cards = [cards[v] for v in self.query_vars]
        self.state_names = {v: list(state_names[v]) for v in self.query_vars}
        self._code_maps = [
            {s: i for i, s in enumerate(state_names[v])} for v in self.kept
        ]
        self._kept_cards = [cards[v] for v in self.kept]

        out_size = int(np.prod(self.cards)) if self.cards else 1
        total = sum(int(np.asarray(a).size) for a in arrays) + out_size
        self._device = _cpu_device() if total < _SMALL_QUERY_ELEMENTS else None
        if self._device is not None:
            arrays = [jax.device_put(jnp.asarray(a), self._device) for a in arrays]

        n_f = len(arrays)
        kept_cards = self._kept_cards
        dtype = config.DTYPE

        def run(codes):
            interleaved = []
            for arr, axes in zip(arrays, operand_axes[:n_f]):
                interleaved.append(arr)
                interleaved.append(list(axes))
            for k, axes in enumerate(operand_axes[n_f:]):
                interleaved.append(jax.nn.one_hot(codes[k], kept_cards[k], dtype=dtype))
                interleaved.append(list(axes))
            interleaved.append(out_axes)
            values = jnp.einsum(*interleaved, optimize="greedy", precision=PRECISION)
            return values / jnp.sum(values)

        self._fn = jax.jit(run)

    def encode(self, evidence):
        """Evidence {var: state name or int} -> int32 code vector."""
        codes = np.empty(len(self.kept), dtype=np.int32)
        for k, var in enumerate(self.kept):
            state = evidence[var]
            mapping = self._code_maps[k]
            if state in mapping:
                codes[k] = mapping[state]
            elif isinstance(state, (int, np.integer)) and 0 <= state < self._kept_cards[k]:
                codes[k] = int(state)
            else:
                raise ValueError(f"Evidence state {state!r} not valid for {var}")
        return codes

    def __call__(self, evidence):
        codes = self.encode(evidence)
        if self._device is not None:
            # put the host numpy codes STRAIGHT onto the chosen device — a
            # bare jnp.asarray would land on the default (remote TPU) device
            # and pay a tunnel round-trip per query
            on_device = jax.device_put(codes, self._device)
        else:
            on_device = jnp.asarray(codes)
        values = self._fn(on_device)
        return DiscreteFactor(
            list(self.query_vars), self.cards, values, state_names=self.state_names
        )


class VariableElimination(Inference):
    """Exact posterior inference by (compiled) variable elimination.

    Each distinct (query variables, evidence variables) signature compiles
    ONCE into a fused einsum contraction; repeat queries are a single
    device dispatch with the evidence entering as integer codes.

    Examples
    --------
    >>> import numpy as np
    >>> from pgmpy_tpu.factors import TabularCPD
    >>> from pgmpy_tpu.inference import VariableElimination
    >>> from pgmpy_tpu.models import DiscreteBayesianNetwork
    >>> model = DiscreteBayesianNetwork([("rain", "wet")])
    >>> model.add_cpds(
    ...     TabularCPD("rain", 2, [[0.8], [0.2]]),
    ...     TabularCPD("wet", 2, [[0.9, 0.2], [0.1, 0.8]],
    ...                evidence=["rain"], evidence_card=[2]))
    >>> infer = VariableElimination(model)
    >>> phi = infer.query(["rain"], evidence={"wet": 1},
    ...                   show_progress=False)
    >>> np.asarray(phi.values, dtype=float).round(3).tolist()
    [0.333, 0.667]
    >>> infer.map_query(["rain"], evidence={"wet": 0},
    ...                 show_progress=False)
    {'rain': 0}
    """

    # ------------------------------------------------------------------ #
    # elimination-order resolution
    # ------------------------------------------------------------------ #
    def _elimination_order_for(
        self, variables, evidence, elimination_order, show_progress=False
    ):
        """Resolve ``elimination_order`` (explicit list or heuristic name)
        to the list of variables to eliminate, validating coverage."""
        keep = set(variables) | set(evidence.keys() if evidence else [])
        to_eliminate = set(self.variables) - keep

        if isinstance(elimination_order, (list, tuple)):
            overlap = set(elimination_order) & keep
            if overlap:
                raise ValueError(
                    "Elimination order contains variables which are in variables or evidence args"
                )
            order = [v for v in elimination_order if v in self.model.nodes()]
            if set(order) != to_eliminate:
                raise ValueError(
                    "Elimination order doesn't contain all the variables which need "
                    "to be eliminated. The variables which need to be eliminated are "
                    f"{to_eliminate}"
                )
            return order

        if not to_eliminate:
            return []

        heuristic = _ORDER_HEURISTICS.get(str(elimination_order).lower())
        if heuristic is not None and isinstance(self.model, DiscreteBayesianNetwork):
            return heuristic(self.model).get_elimination_order(
                sorted(to_eliminate, key=str), show_progress=show_progress
            )
        return sorted(to_eliminate, key=str)

    # ------------------------------------------------------------------ #
    # staged elimination on the int-label program representation
    # ------------------------------------------------------------------ #
    def _model_entries(self, evidence):
        """Unique model factors as (values array, int-label tuple) entries
        with evidence axes sliced out, plus the label<->var maps and any
        scalar mass from fully-observed factors."""
        unique = {}
        for factor_list in self.factors.values():
            for factor in factor_list:
                unique[id(factor)] = factor
        var_to_int, _ = make_axis_map([list(self.variables)])
        label_names = {}  # label -> (var, cardinality, state names)

        entries = []
        scalar = 1.0
        evidence = evidence or {}
        for factor in unique.values():
            values = factor.values
            labels = []
            index = []
            for var, card in zip(factor.variables, factor.cardinality):
                if var in evidence:
                    index.append(factor.get_state_no(var, evidence[var]))
                else:
                    index.append(slice(None))
                    lbl = var_to_int[var]
                    labels.append(lbl)
                    label_names[lbl] = (var, int(card), factor.state_names[var])
            values = values[tuple(index)]
            if labels:
                entries.append((values, tuple(labels)))
            else:
                scalar = scalar * values
        return entries, var_to_int, label_names, scalar

    @staticmethod
    def _contract_out(entries, label, operation):
        """Contract every entry whose axes contain ``label`` down to their
        union scope minus ``label``; returns (new entry or None, survivors)."""
        group = [e for e in entries if label in e[1]]
        rest = [e for e in entries if label not in e[1]]
        if not group:
            return None, rest
        union = []
        for _, axes in group:
            for ax in axes:
                if ax not in union:
                    union.append(ax)
        out = tuple(ax for ax in union if ax != label)
        arrays = [v for v, _ in group]
        axes_list = [a for _, a in group]
        if operation == "marginalize":
            values = sum_product_planned(axes_list, out, arrays)
        else:  # maximize: materialize the union-scope product, max-reduce
            product = sum_product_planned(axes_list, tuple(union), arrays)
            values = jnp.max(product, axis=union.index(label))
        return (values, out), rest

    def _variable_elimination(
        self,
        variables,
        operation,
        evidence=None,
        elimination_order="minfill",
        joint=True,
        show_progress=False,
    ):
        """Eliminate all non-query, non-evidence variables one label at a
        time (``operation`` is "marginalize" or "maximize")."""
        if isinstance(variables, str):
            raise TypeError("variables must be a list of strings")
        if isinstance(evidence, str):
            raise TypeError("evidence must be a list of strings")
        common_vars = set(evidence if evidence is not None else []) & set(variables)
        if common_vars:
            raise ValueError(
                f"Can't have the same variables in both `variables` and `evidence`. Found in both: {common_vars}"
            )

        if not variables:
            # no query variables: the (unnormalized) product of all factors
            unique = {}
            for factor_list in self.factors.values():
                for factor in factor_list:
                    unique[id(factor)] = factor
            if joint:
                return factor_product(*unique.values())
            return set(unique.values())

        order = self._elimination_order_for(
            variables, evidence, elimination_order, show_progress=show_progress
        )
        entries, var_to_int, label_names, scalar = self._model_entries(evidence)

        for var in order:
            entry, entries = self._contract_out(entries, var_to_int[var], operation)
            if entry is not None:
                if entry[1]:
                    entries.append(entry)
                else:
                    scalar = scalar * entry[0]

        # combine what's left into the joint over the query variables
        present = set(itertools.chain.from_iterable(a for _, a in entries))
        missing = [v for v in variables if var_to_int[v] not in present]
        if missing:
            raise ValueError(f"Query variables not present in any factor: {missing}")
        out_labels = tuple(var_to_int[v] for v in variables)
        arrays = [v for v, _ in entries]
        axes_list = [a for _, a in entries]
        values = sum_product_planned(axes_list, out_labels, arrays) * scalar

        cards = [label_names[var_to_int[v]][1] for v in variables]
        names = {v: label_names[var_to_int[v]][2] for v in variables}
        result = DiscreteFactor(list(variables), cards, values, state_names=names)

        normalize = isinstance(self.model, DiscreteBayesianNetwork)
        if joint:
            return result.normalize(inplace=False) if normalize else result
        out = {}
        for query_var in variables:
            phi = result.marginalize(
                [v for v in variables if v != query_var], inplace=False
            )
            out[query_var] = phi.normalize(inplace=False) if normalize else phi
        return out

    # ------------------------------------------------------------------ #
    # the fused ("greedy") path: compiled per-signature programs
    # ------------------------------------------------------------------ #
    def _get_compiled_query(self, variables, ev_vars):
        from pgmpy_tpu.utils.cache import LRUDict

        token = self.model._cache_token()
        cache = self.model.__dict__.get("_ve_program_cache")
        if cache is None or cache[0] != token:
            cache = (token, LRUDict(max_size=256))
            self.model.__dict__["_ve_program_cache"] = cache
        key = (tuple(variables), tuple(ev_vars))
        prog = cache[1].get(key)
        if prog is None:
            prog = _CompiledQuery(self, variables, ev_vars)
            cache[1][key] = prog
        return prog

    def _fused_query(self, variables, evidence, joint):
        evidence = evidence or {}
        ev_vars = sorted(evidence.keys(), key=str)
        prog = self._get_compiled_query(list(variables), ev_vars)
        result = prog(evidence)
        if joint:
            return result
        return {
            var: result.marginalize(
                [v for v in variables if v != var], inplace=False
            )
            for var in variables
        }

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
        ev_vars = sorted(evidence.keys(), key=str)
        run, state_names, code_maps = self._get_batch_program(
            tuple(variables), tuple(ev_vars)
        )
        codes = np.empty((len(next(iter(evidence.values()))), len(ev_vars)), np.int32)
        for k, var in enumerate(ev_vars):
            mapping = code_maps[k]
            codes[:, k] = [
                mapping[s] if s in mapping else int(s) for s in evidence[var]
            ]
        values = run(jnp.asarray(codes))
        return values, state_names

    def _get_batch_program(self, variables, ev_vars):
        """Per-signature cache for :meth:`batch_query_program` (jitted run),
        token-checked and LRU-bounded like ``_get_compiled_query`` — predict
        calls query_batch repeatedly with the same signature and must not
        rebuild + retrace the program per call."""
        import jax

        from pgmpy_tpu.utils.cache import LRUDict

        token = self.model._cache_token()
        cache = self.model.__dict__.get("_ve_batch_program_cache")
        if cache is None or cache[0] != token:
            cache = (token, LRUDict(max_size=64))
            self.model.__dict__["_ve_batch_program_cache"] = cache
        key = (tuple(variables), tuple(ev_vars))
        entry = cache[1].get(key)
        if entry is None:
            run, state_names, code_maps = self.batch_query_program(
                list(variables), list(ev_vars)
            )
            entry = (jax.jit(run), state_names, code_maps)
            cache[1][key] = entry
        return entry

    def batch_query_program(self, variables, ev_vars):
        """Build the device program behind :meth:`query_batch`: a pure
        function ``run(codes[n, len(ev_vars)]) -> values[n, *query cards]``
        plus the query state names and per-evidence-var name->code maps.
        ``run`` is jit/shard_map-compatible, so callers can shard the row
        axis over a device mesh (``parallel.mesh.sharded_query_batch``)."""
        ev_set = set(ev_vars)
        model, _ = self._prune_bayesian_model(
            list(variables), {v: 0 for v in ev_vars}
        )

        state_names = {}
        cards = {}
        for cpd in model.cpds:
            state_names.update(cpd.state_names)
            for var, card in zip(cpd.variables, cpd.cardinality):
                cards[var] = int(card)
        for var in ev_vars:
            if var not in cards:
                raise ValueError(f"Evidence variable {var} pruned out of the model")
        missing = [v for v in variables if v not in cards]
        if missing:
            raise ValueError(f"Query variables not in reduced model: {missing}")

        # static per-CPD slicing plans: gather the evidence axes OUT of each
        # CPT per row, so observed axes never enter the contraction (a
        # one-hot-delta formulation lets the path planner materialize
        # batch x joint intermediates on wide evidence sets)
        ev_pos = {v: k for k, v in enumerate(ev_vars)}
        plans = []
        scopes = []
        for cpd in model.cpds:
            scope = list(cpd.variables)
            ev_in_scope = [v for v in scope if v in ev_set]
            plans.append((cpd.values, scope, ev_in_scope))
            if ev_in_scope:
                scopes.append(["__batch__"] + [v for v in scope if v not in ev_set])
            else:
                scopes.append(scope)

        var_to_int, operand_axes = make_axis_map(scopes)
        out_axes = [var_to_int["__batch__"]] + [var_to_int[v] for v in variables]
        n_query = len(variables)
        out_card = int(np.prod([cards[v] for v in variables]))

        def run(codes):
            n = codes.shape[0]
            if n * out_card > 2**31:
                raise ValueError(
                    f"query_batch output would have {n * out_card} entries; "
                    "query fewer variables jointly or fewer rows per batch"
                )
            arrays = []
            for arr, scope, ev_in_scope in plans:
                if not ev_in_scope:
                    arrays.append(arr)
                    continue

                def slice_one(codes_row, arr=arr, scope=scope, evs=ev_in_scope):
                    index = tuple(
                        codes_row[ev_pos[v]] if v in evs else slice(None)
                        for v in scope
                    )
                    return arr[index]

                arrays.append(jax.vmap(slice_one)(codes))
            interleaved = []
            for arr, axes in zip(arrays, operand_axes):
                interleaved.append(arr)
                interleaved.append(list(axes))
            interleaved.append(out_axes)
            values = jnp.einsum(*interleaved, optimize="greedy", precision=PRECISION)
            norm = jnp.sum(values.reshape(n, -1), axis=1).reshape(
                (n,) + (1,) * n_query
            )
            return values / norm

        query_names = {v: state_names[v] for v in variables}
        code_maps = [
            {s: i for i, s in enumerate(state_names[v])} for v in ev_vars
        ]
        return run, query_names, code_maps

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

        ``elimination_order="greedy"`` (default) uses the compiled fused
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
        remaining factor.

        Like the reference (``ExactInference.py:459-527``) the model is
        pruned to the query/evidence first — with a max reduction, barren
        CPDs do NOT collapse to 1, so pruning changes (and defines) the
        answer."""
        if not variables:
            variables = []
        common_vars = set(evidence if evidence is not None else []) & set(variables)
        if common_vars:
            raise ValueError(
                f"Can't have the same variables in both `variables` and `evidence`. Found in both: {common_vars}"
            )
        target = self
        if isinstance(self.model, DiscreteBayesianNetwork):
            model_reduced, evidence = self._prune_bayesian_model(variables, evidence)
            target = VariableElimination(model_reduced)
        final_distribution = target._variable_elimination(
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
