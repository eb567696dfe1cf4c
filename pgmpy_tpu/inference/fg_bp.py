"""BeliefPropagationWithMessagePassing: loopy sum-product BP on factor
graphs.

Reference: ``/root/reference/pgmpy/inference/ExactInference.py:1320-1681``
schedules messages recursively per query; here a synchronous *flooding*
schedule updates every edge each round (vectorized per factor via the
interleaved einsum core) until messages converge — exact on trees,
standard loopy BP otherwise.
"""

import numpy as np

from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.models.factor_graph import FactorGraph
from pgmpy_tpu.ops.einsum import make_axis_map, sum_product


class BeliefPropagationWithMessagePassing:
    def __init__(self, model, check_model=True):
        if not isinstance(model, FactorGraph):
            raise TypeError(f"model must be a FactorGraph. Got: {type(model)}")
        if check_model:
            model.check_model()
        self.model = model
        self.variables = model.get_variable_nodes()
        self.factors = list(model.factors)
        self.cardinality = model.get_cardinality()

    def _message_key(self, fi, var):
        """Reference-compatible message key (ExactInference.py:1447):
        ``"[factor variables] -> variable"``."""
        return f"{list(self.factors[fi].variables)} -> {var}"

    def _run_flooding(self, fixed_var_messages, max_iter=100, tol=1e-8,
                      precomp_messages=None):
        """Synchronous message passing.  ``fixed_var_messages``: {var:
        ndarray} external (evidence/virtual-evidence) messages multiplied
        into every var->factor message and final beliefs.
        ``precomp_messages`` warm-starts the factor->variable messages (a
        converged set from a previous ``query(get_messages=True)`` makes the
        sweep converge immediately on trees)."""
        import numpy as np

        # message containers keyed by (factor_idx, var)
        f2v = {}
        v2f = {}
        factor_scopes = [list(f.variables) for f in self.factors]
        for fi, scope in enumerate(factor_scopes):
            for var in scope:
                key = self._message_key(fi, var)
                if precomp_messages and key in precomp_messages:
                    f2v[(fi, var)] = np.asarray(
                        precomp_messages[key], dtype=np.float64
                    )
                else:
                    f2v[(fi, var)] = (
                        np.ones(self.cardinality[var]) / self.cardinality[var]
                    )
                v2f[(fi, var)] = np.ones(self.cardinality[var]) / self.cardinality[var]

        factor_values = [np.asarray(f.values, dtype=np.float64) for f in self.factors]

        for _ in range(max_iter):
            max_delta = 0.0
            # variable -> factor
            new_v2f = {}
            for fi, scope in enumerate(factor_scopes):
                for var in scope:
                    msg = np.ones(self.cardinality[var])
                    if var in fixed_var_messages:
                        msg = msg * fixed_var_messages[var]
                    for fj, scope_j in enumerate(factor_scopes):
                        if fj != fi and var in scope_j:
                            msg = msg * f2v[(fj, var)]
                    total = msg.sum()
                    if total > 0:
                        msg = msg / total
                    new_v2f[(fi, var)] = msg
            v2f = new_v2f
            # factor -> variable
            for fi, scope in enumerate(factor_scopes):
                vals = factor_values[fi]
                for k, var in enumerate(scope):
                    # multiply in messages from other vars, marginalize to var
                    msg = vals
                    for k2, var2 in enumerate(scope):
                        if var2 != var:
                            shape = [1] * len(scope)
                            shape[k2] = -1
                            msg = msg * v2f[(fi, var2)].reshape(shape)
                    axes = tuple(k2 for k2 in range(len(scope)) if k2 != k)
                    out = msg.sum(axis=axes)
                    total = out.sum()
                    if total > 0:
                        out = out / total
                    max_delta = max(max_delta, float(np.max(np.abs(out - f2v[(fi, var)]))))
                    f2v[(fi, var)] = out
            if max_delta < tol:
                break
        return f2v

    def calc_variable_node_message(self, variable, incoming_messages):
        """Outgoing variable-node message: normalized elementwise product of
        the incoming messages (ref ExactInference.py:1619-1638)."""
        if not incoming_messages:
            return np.ones(self.cardinality[variable]) / self.cardinality[variable]
        if len(incoming_messages) == 1:
            return np.asarray(incoming_messages[0], dtype=np.float64)
        out = np.asarray(incoming_messages[0], dtype=np.float64)
        for m in incoming_messages[1:]:
            out = out * np.asarray(m, dtype=np.float64)
        return out / out.sum()

    @staticmethod
    def calc_factor_node_message(factor, incoming_messages, target_var):
        """Outgoing factor-node message toward ``target_var``: multiply the
        factor table by the incoming messages (one per non-target variable,
        in the factor's variable order) and sum the rest out
        (ref ExactInference.py:1641-1681)."""
        table = np.asarray(factor.values, dtype=np.float64)
        if len(incoming_messages) != table.ndim - 1:
            raise AssertionError(
                "The number of incoming messages must match the number of "
                "non-target variables in the factor"
            )
        others = [v for v in factor.variables if v != target_var]
        target_axis = factor.variables.index(target_var)
        moved = np.moveaxis(table, target_axis, -1)
        for message in incoming_messages:
            moved = moved * np.asarray(message, dtype=np.float64).reshape(
                -1, *([1] * (moved.ndim - 1))
            )
            moved = moved.sum(axis=0)
        out = moved
        return out / out.sum()

    def query(self, variables, evidence=None, virtual_evidence=None,
              get_messages=False, precomp_messages=None):
        """Marginal beliefs of ``variables`` given point-mass evidence and
        virtual-evidence messages.  ``precomp_messages`` (reference
        ``ExactInference.py:1366``) reuses factor->variable messages from a
        previous ``get_messages=True`` call across queries."""
        evidence = evidence or {}
        if set(variables) & set(evidence):
            raise ValueError(
                f"Can't have the same variables in both `variables` and `evidence`. Found in both: {set(variables) & set(evidence)}"
            )

        fixed = {}
        for var, state in evidence.items():
            fixed[var] = self.model.get_point_mass_message(var, state)
        for virt in virtual_evidence or []:
            var = virt.variables[0]
            message = np.asarray(virt.values, dtype=np.float64).ravel()
            fixed[var] = fixed.get(var, 1.0) * message

        f2v = self._run_flooding(fixed, precomp_messages=precomp_messages)

        results = {}
        factor_scopes = [list(f.variables) for f in self.factors]
        for var in variables:
            belief = np.ones(self.cardinality[var])
            if var in fixed:
                belief = belief * fixed[var]
            for fi, scope in enumerate(factor_scopes):
                if var in scope:
                    belief = belief * f2v[(fi, var)]
            belief = belief / belief.sum()
            state_names = {}
            for f in self.factors:
                if var in f.state_names:
                    state_names[var] = f.state_names[var]
                    break
            results[var] = DiscreteFactor(
                [var], [self.cardinality[var]], belief, state_names=state_names
            )
        if get_messages:
            messages = {
                self._message_key(fi, var): msg for (fi, var), msg in f2v.items()
            }
            return results, messages
        return results
