"""CausalInference: do-calculus identification + interventional queries.

Parity: ``/root/reference/pgmpy/inference/CausalInference.py:23-1143``.
Identification (backdoor/frontdoor/IV/adjustment-set search) is host-side
graph algebra; the interventional ``query`` is an adjustment sum of fused
VE contractions.
"""

import itertools
from itertools import chain, combinations

import networkx as nx
import numpy as np

from pgmpy_tpu.config import logger
from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork


def _powerset(iterable):
    s = list(iterable)
    return chain.from_iterable(combinations(s, r) for r in range(len(s) + 1))


class CausalInference:
    def __init__(self, model):
        from pgmpy_tpu.base.dag import DAG

        if not isinstance(model, DAG):
            raise NotImplementedError(
                "Causal Inference is only implemented for DAGs and Bayesian-network models."
            )
        self.model = model
        self.set_nodes = frozenset()
        self.observed_variables = frozenset(model.nodes()) - model.latents

    def __repr__(self):
        variables = ", ".join(map(str, sorted(self.observed_variables, key=str)))
        return f"{self.__class__.__name__}({variables})"

    # ------------------------------------------------------------------ #
    # backdoor / frontdoor criteria
    # ------------------------------------------------------------------ #
    def is_valid_backdoor_adjustment_set(self, X, Y, Z=[]):
        """Z blocks all backdoor paths from X to Y and contains no
        descendant of X."""
        if isinstance(Z, (str, int)):
            Z = [Z]
        Z = set(Z)
        if Z & set(nx.descendants(self.model, X) | {X}):
            return False
        backdoor_graph = self.model.copy()
        for child in list(backdoor_graph.successors(X)):
            backdoor_graph.remove_edge(X, child)
        return not backdoor_graph.is_dconnected(X, Y, observed=list(Z))

    def get_all_backdoor_adjustment_sets(self, X, Y):
        """All minimal valid backdoor sets (frozenset of frozensets)."""
        try:
            self.is_valid_backdoor_adjustment_set(X, Y)
        except KeyError:
            raise KeyError("X or Y not in model")
        possible = (
            self.observed_variables
            - {X, Y}
            - set(nx.descendants(self.model, X))
        )
        valid = []
        for size in range(len(possible) + 1):
            for Z in combinations(sorted(possible, key=str), size):
                if any(set(v) <= set(Z) for v in valid):
                    continue
                if self.is_valid_backdoor_adjustment_set(X, Y, Z):
                    valid.append(frozenset(Z))
        return frozenset(valid)

    def is_valid_frontdoor_adjustment_set(self, X, Y, Z=None):
        """Z intercepts all X->Y paths; no unblocked backdoor X->Z; all
        Z->Y backdoors blocked by X."""
        if isinstance(Z, (str, int)):
            Z = [Z]
        Z = set(Z or [])
        # 1. Z intercepts all directed paths X -> Y
        for path in nx.all_simple_paths(self.model, X, Y):
            if not set(path[1:-1]) & Z:
                return False
        # 2. no unblocked backdoor path X -> z
        backdoor_graph = self.model.copy()
        for child in list(backdoor_graph.successors(X)):
            backdoor_graph.remove_edge(X, child)
        for z in Z:
            if backdoor_graph.is_dconnected(X, z, observed=[]):
                return False
        # 3. every backdoor path from each z to Y is blocked by X
        for z in Z:
            if not self.is_valid_backdoor_adjustment_set(z, Y, Z=[X]):
                return False
        return True

    def get_all_frontdoor_adjustment_sets(self, X, Y):
        possible = self.observed_variables - {X, Y}
        valid = frozenset(
            [
                frozenset(Z)
                for Z in _powerset(sorted(possible, key=str))
                if self.is_valid_frontdoor_adjustment_set(X, Y, Z)
            ]
        )
        return valid

    # ------------------------------------------------------------------ #
    # adjustment-set machinery (generalized criterion)
    # ------------------------------------------------------------------ #
    def get_proper_backdoor_graph(self, X, Y, inplace=False):
        """Remove the first edge of every proper causal path from X to Y."""
        for var in chain(X, Y):
            if var not in self.model.nodes():
                raise ValueError(f"{var} not found in the model.")
        model = self.model if inplace else self.model.copy()
        edges_to_remove = []
        for x in X:
            for child in model.successors(x):
                # edge lies on a proper causal path if child can reach Y
                if child in Y or (set(nx.descendants(model, child)) & set(Y)):
                    edges_to_remove.append((x, child))
        model.remove_edges_from(edges_to_remove)
        return model

    def is_valid_adjustment_set(self, X, Y, adjustment_set):
        """Generalized adjustment criterion via the proper backdoor graph."""
        if isinstance(X, (str, int)):
            X = [X]
        if isinstance(Y, (str, int)):
            Y = [Y]
        if isinstance(adjustment_set, (str, int)):
            adjustment_set = [adjustment_set]
        backdoor_graph = self.get_proper_backdoor_graph(X, Y)
        for x, y in itertools.product(X, Y):
            if backdoor_graph.is_dconnected(x, y, observed=list(adjustment_set)):
                return False
        return True

    def get_minimal_adjustment_set(self, X, Y):
        """Minimal adjustment set via minimal d-separator on the proper
        backdoor graph."""
        if isinstance(X, (str, int)):
            X = [X]
        if isinstance(Y, (str, int)):
            Y = [Y]
        backdoor_graph = self.get_proper_backdoor_graph(X, Y)
        if len(X) == 1 and len(Y) == 1:
            try:
                return backdoor_graph.minimal_dseparator(X[0], Y[0])
            except ValueError:
                return None
        return nx.find_minimal_d_separator(backdoor_graph, set(X), set(Y))

    # ------------------------------------------------------------------ #
    # instrumental variables
    # ------------------------------------------------------------------ #
    def get_ivs(self, X, Y, scaling_indicators={}):
        """Instrumental variables for X -> Y: Z d-connected to X but
        d-separated from Y in the model with X->Y removed."""
        gc = self.model.copy()
        if gc.has_edge(X, Y):
            gc.remove_edge(X, Y)
        candidates = self.observed_variables - {X, Y}
        ivs = set()
        for z in candidates:
            if gc.is_dconnected(z, X, observed=[]) and not gc.is_dconnected(
                z, Y, observed=[]
            ):
                ivs.add(z)
        return ivs

    def get_conditional_ivs(self, X, Y, scaling_indicators={}):
        """(iv, conditioning set) pairs for X -> Y."""
        gc = self.model.copy()
        if gc.has_edge(X, Y):
            gc.remove_edge(X, Y)
        candidates = self.observed_variables - {X, Y} - set(self.get_ivs(X, Y))
        results = []
        for z in candidates:
            # search for a W making z an IV: z ⟂ Y | W in gc, z d-conn X | W
            others = sorted(
                self.observed_variables - {X, Y, z} - set(nx.descendants(self.model, X)),
                key=str,
            )
            for size in range(len(others) + 1):
                found = False
                for W in combinations(others, size):
                    if not gc.is_dconnected(z, Y, observed=list(W)) and gc.is_dconnected(
                        z, X, observed=list(W)
                    ):
                        results.append((z, list(W)))
                        found = True
                        break
                if found:
                    break
        return results

    # ------------------------------------------------------------------ #
    # identification dispatch & ATE
    # ------------------------------------------------------------------ #
    def identification_method(self, X, Y):
        """Which identification strategy applies for the effect of X on Y."""
        backdoor_sets = self.get_all_backdoor_adjustment_sets(X, Y)
        if backdoor_sets:
            return {"method": "backdoor", "sets": backdoor_sets}
        frontdoor_sets = self.get_all_frontdoor_adjustment_sets(X, Y)
        if frontdoor_sets:
            return {"method": "frontdoor", "sets": frontdoor_sets}
        ivs = self.get_ivs(X, Y)
        if ivs:
            return {"method": "iv", "sets": ivs}
        return {"method": None, "sets": frozenset()}

    def estimate_ate(self, X, Y, data, estimand_strategy="smallest", estimator_type="linear", **kwargs):
        """Average treatment effect of X on Y via backdoor adjustment with a
        linear regression estimator (jnp lstsq)."""
        import jax.numpy as jnp

        adjustment_sets = self.get_all_backdoor_adjustment_sets(X, Y)
        if adjustment_sets:
            if estimand_strategy == "smallest":
                Z = list(min(adjustment_sets, key=len))
            else:
                Z = list(next(iter(adjustment_sets)))
        else:
            Z = []
        cols = [X] + Z
        mat = np.column_stack(
            [np.ones(data.shape[0])]
            + [data[c].to_numpy(dtype=np.float64) for c in cols]
        )
        y = data[Y].to_numpy(dtype=np.float64)
        beta, _, _, _ = jnp.linalg.lstsq(jnp.asarray(mat), jnp.asarray(y))
        return float(np.asarray(beta)[1])

    # ------------------------------------------------------------------ #
    # interventional query
    # ------------------------------------------------------------------ #
    def query(
        self,
        variables,
        do=None,
        evidence=None,
        adjustment_set=None,
        inference_algo="ve",
        show_progress=False,
        **kwargs,
    ):
        """P(variables | do(do), evidence) = sum_z P(variables | do, z,
        evidence) P(z | evidence) over the adjustment set z."""
        from pgmpy_tpu.inference.bp import BeliefPropagation
        from pgmpy_tpu.inference.ve import VariableElimination

        if not isinstance(self.model, DiscreteBayesianNetwork):
            raise ValueError(
                "A model with CPDs is required for causal queries."
            )
        if isinstance(variables, (str, int)):
            raise ValueError(f"variables must be a list of strings. Got: {type(variables)}")
        do = do or {}
        evidence = evidence or {}

        if inference_algo == "ve":
            infer_cls = VariableElimination
        elif inference_algo == "bp":
            infer_cls = BeliefPropagation
        elif callable(inference_algo) or isinstance(inference_algo, type):
            infer_cls = inference_algo
        else:
            raise ValueError(f"inference_algo must be 've', 'bp', or an Inference class. Got: {inference_algo}")
        infer = infer_cls(self.model)

        if not do:
            return infer.query(variables, evidence=evidence, show_progress=show_progress)

        if adjustment_set is None:
            do_vars = list(do.keys())
            adjustment_set = set(
                chain(*[self.model.predecessors(var) for var in do_vars])
            )
            if adjustment_set & self.model.latents:
                raise ValueError(
                    "Not all parents of do variables are observed. Please specify "
                    "an adjustment set."
                )
        adjustment_set = sorted(adjustment_set, key=str)

        if not adjustment_set:
            return infer.query(
                variables, evidence={**evidence, **do}, show_progress=show_progress
            )

        # P(z | evidence)
        p_z = infer.query(adjustment_set, evidence=evidence, show_progress=show_progress)
        states = [p_z.state_names[z] for z in adjustment_set]
        values = None
        result_factor = None
        p_z_arr = np.asarray(p_z.values)
        for combo_idx, combo in enumerate(itertools.product(*[range(len(s)) for s in states])):
            z_evidence = {
                z: p_z.state_names[z][i] for z, i in zip(adjustment_set, combo)
            }
            weight = float(p_z_arr[tuple(combo)])
            if weight == 0.0:
                continue
            q = infer.query(
                variables,
                evidence={**evidence, **do, **z_evidence},
                show_progress=show_progress,
            )
            contrib = np.asarray(q.values) * weight
            if values is None:
                values = contrib
                result_factor = q
            else:
                values = values + contrib
        result = result_factor.copy()
        import jax.numpy as jnp

        result.values = jnp.asarray(values)
        return result.normalize(inplace=False)
