"""BeliefPropagationWithMessagePassing: loopy sum-product BP on factor
graphs, compiled to ONE device program per graph.

Reference: ``/root/reference/pgmpy/inference/ExactInference.py:1320-1681``
schedules messages recursively per query (a Python call per message).
TPU-native redesign: a synchronous *flooding* schedule over padded
per-edge message tensors — all factor->variable messages live in one
``(n_edges, max_card)`` array, every round updates every edge with a
handful of batched einsums (factors bucketed by arity), and the rounds
run inside ``jax.lax.while_loop`` until the messages converge.  Exact on
trees, standard loopy BP otherwise; evidence/virtual-evidence and
warm-start messages enter as array inputs, so each graph compiles
exactly once.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.models.factor_graph import FactorGraph
from pgmpy_tpu.ops.einsum import make_axis_map, sum_product


class _FloodingProgram:
    """Host compile artifact for synchronous ("flooding") BP on a factor
    graph: static edge/neighbor index tables + a jitted
    ``lax.while_loop`` engine over padded message tensors.

    Message layout: edge ``e`` is the e-th ``(factor, variable)``
    incidence in factor order; ``f2v``/``v2f`` are ``(E, C)`` arrays
    (``C = max cardinality``) with entries beyond a variable's true
    cardinality held at zero (zero-padded factor tables keep those
    states inert through every product and sum).
    """

    def __init__(self, factor_scopes, cardinality,
                 max_iter=100, tol=1e-8, dtype=None):
        from pgmpy_tpu.config import config

        self._dtype = dtype or config.DTYPE
        dtype = self._dtype
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        # the requested tol (reference default 1e-8) is unreachable in f32:
        # the round-to-round delta plateaus at ~1 ulp of the message values
        # (~6e-8 observed), so without a dtype floor every query would burn
        # all max_iter rounds and warm starts would never exit early
        self._tol_eff = max(self.tol, 4.0 * float(np.finfo(np.dtype(dtype)).eps))

        # edge enumeration: (factor, position-in-scope) in factor order
        self.edges = []  # (fi, var)
        edge_id = {}
        for fi, scope in enumerate(factor_scopes):
            for var in scope:
                edge_id[(fi, var)] = len(self.edges)
                self.edges.append((fi, var))
        E = len(self.edges)
        C = max(int(c) for c in cardinality.values())
        self.n_edges, self.max_card = E, C
        self.cards = [int(cardinality[var]) for _, var in self.edges]

        # per-edge validity mask (1 on true states, 0 on padding)
        mask = np.zeros((E, C), dtype=np.float32)
        for e, card in enumerate(self.cards):
            mask[e, :card] = 1.0
        self._mask = jnp.asarray(mask, dtype=dtype)

        # v2f neighbor table: for edge (fi, var), the other edges (fj, var)
        # with fj != fi.  Padded with E -> a dummy all-ones row, the
        # multiplicative identity.
        var_edges = {}
        for e, (fi, var) in enumerate(self.edges):
            var_edges.setdefault(var, []).append(e)
        D = max((len(v) for v in var_edges.values()), default=1)
        D = max(D - 1, 1)
        nbr = np.full((E, D), E, dtype=np.int32)
        for e, (fi, var) in enumerate(self.edges):
            others = [e2 for e2 in var_edges[var] if e2 != e]
            nbr[e, : len(others)] = others
        self._nbr = jnp.asarray(nbr)

        # f2v update: bucket factors by their power-of-two padded SHAPE
        # (not just arity): a factor's table pads each axis to the next
        # pow2 of that variable's cardinality, so memory stays within 2^a
        # of the true table size instead of blowing up to
        # (global max card)^arity on mixed-cardinality graphs.  For each
        # group the outgoing message toward scope position k is one
        # batched einsum.
        groups = {}  # padded shape tuple -> list of factor indices
        self._scope_cards = [
            tuple(int(cardinality[v]) for v in scope) for scope in factor_scopes
        ]
        for fi, scope in enumerate(factor_scopes):
            key = tuple(
                1 << max(0, (c - 1).bit_length()) for c in self._scope_cards[fi]
            )
            groups.setdefault(key, []).append(fi)
        self._groups = []
        out_edge_order = []  # edge id produced by each output row, in order
        for shape in sorted(groups):
            fis = groups[shape]
            arity = len(shape)
            eidx = np.zeros((len(fis), arity), dtype=np.int32)
            for row, fi in enumerate(fis):
                for k, var in enumerate(factor_scopes[fi]):
                    eidx[row, k] = edge_id[(fi, var)]
            for k in range(arity):
                out_edge_order.extend(int(x) for x in eidx[:, k])
            self._groups.append((shape, fis, jnp.asarray(eidx)))
        # inverse permutation: concatenated group outputs -> edge order
        inv = np.empty(E, dtype=np.int32)
        inv[np.asarray(out_edge_order, dtype=np.int32)] = np.arange(
            E, dtype=np.int32
        )
        self._inv_perm = jnp.asarray(inv)

        self._fn = jax.jit(self._make_engine())

    def build_tables(self, factor_values):
        """Pad the CURRENT factor value arrays into the per-group layout.

        Tables are runtime INPUTS to the compiled engine, not baked
        constants — factor mutations between queries are picked up without
        recompiling (the host-numpy predecessor re-read ``f.values`` every
        call; this keeps that contract)."""
        out = []
        for shape, fis, _ in self._groups:
            tables = np.zeros((len(fis),) + shape, dtype=np.float32)
            for row, fi in enumerate(fis):
                vals = np.asarray(factor_values[fi], dtype=np.float32)
                tables[row][tuple(slice(0, s) for s in vals.shape)] = vals
            out.append(jnp.asarray(tables, dtype=self._dtype))
        return tuple(out)

    def _make_engine(self):
        mask, nbr, groups, inv_perm = (
            self._mask, self._nbr, self._groups, self._inv_perm,
        )
        E, C = self.n_edges, self.max_card
        max_iter, tol = self.max_iter, self._tol_eff

        def normalize(msgs):
            total = jnp.sum(msgs, axis=-1, keepdims=True)
            return jnp.where(total > 0, msgs / jnp.where(total > 0, total, 1.0), msgs)

        def round_fn(f2v, fixed, tables_in):
            # variable -> factor: exclusive product of the OTHER factors'
            # messages into the shared variable (dummy row E = identity)
            f2v_ext = jnp.concatenate([f2v, jnp.ones((1, C), f2v.dtype)])
            v2f = fixed * jnp.prod(f2v_ext[nbr], axis=1)
            v2f = normalize(v2f)
            # factor -> variable: per shape bucket, one einsum per scope
            # position k — factor table times the v2f messages on the
            # other positions, contracted down to axis k
            outs = []
            for (shape, fis, eidx), tables in zip(groups, tables_in):
                arity = len(shape)
                msgs = v2f[eidx]  # (F, arity, C)
                f_ax = 0  # shared batch axis label; scope axes are 1..arity
                for k in range(arity):
                    operands, axes = [tables], [(f_ax,) + tuple(range(1, arity + 1))]
                    for k2 in range(arity):
                        if k2 != k:
                            # match each message to its axis' padded size:
                            # slice when the axis is narrower than the
                            # global message width C, zero-pad when the
                            # pow2 padding exceeds C (states beyond the
                            # true cardinality are zero on both sides)
                            m = msgs[:, k2, :]
                            if shape[k2] <= C:
                                m = m[:, : shape[k2]]
                            else:
                                m = jnp.pad(m, ((0, 0), (0, shape[k2] - C)))
                            operands.append(m)
                            axes.append((f_ax, k2 + 1))
                    out_k = sum_product(axes, (f_ax, k + 1), *operands)
                    if shape[k] < C:
                        out_k = jnp.pad(out_k, ((0, 0), (0, C - shape[k])))
                    elif shape[k] > C:
                        out_k = out_k[:, :C]
                    outs.append(out_k)
            new_f2v = normalize(jnp.concatenate(outs, axis=0)[inv_perm])
            delta = jnp.max(jnp.abs(new_f2v - f2v))
            return new_f2v, delta

        def engine(fixed, f2v_init, tables_in):
            def cond(carry):
                _, i, delta = carry
                return (i < max_iter) & (delta >= tol)

            def body(carry):
                f2v, i, _ = carry
                new_f2v, delta = round_fn(f2v, fixed, tables_in)
                return new_f2v, i + 1, delta

            f2v0 = f2v_init * mask
            out, n_rounds, _ = jax.lax.while_loop(
                cond, body, (f2v0, jnp.int32(0), jnp.asarray(jnp.inf, f2v0.dtype))
            )
            return out, n_rounds

        return engine

    def run(self, fixed, f2v_init, tables):
        """One device dispatch: flood until convergence (or ``max_iter``).
        ``self.last_rounds`` records how many rounds the sweep took.
        Both outputs come back in ONE device_get (each separate fetch is a
        tunnel roundtrip)."""
        out, n_rounds = jax.device_get(
            self._fn(jnp.asarray(fixed), jnp.asarray(f2v_init), tables)
        )
        self.last_rounds = int(n_rounds)
        return out


class BeliefPropagationWithMessagePassing:
    """Loopy (flooding) sum-product BP on a factor graph, one compiled
    device program per graph (see module docstring).

    Examples
    --------
    >>> import numpy as np
    >>> from pgmpy_tpu.factors import DiscreteFactor
    >>> from pgmpy_tpu.inference import BeliefPropagationWithMessagePassing
    >>> from pgmpy_tpu.models import FactorGraph
    >>> fg = FactorGraph()
    >>> fg.add_nodes_from(["a", "b"])
    >>> f = DiscreteFactor(["a", "b"], [2, 2], [2.0, 1.0, 1.0, 3.0])
    >>> fg.add_factors(f)
    >>> fg.add_edges_from([("a", f), ("b", f)])
    >>> bp = BeliefPropagationWithMessagePassing(fg)
    >>> res = bp.query(["b"], evidence={"a": 0})
    >>> np.asarray(res["b"].values, dtype=float).round(3).tolist()
    [0.667, 0.333]
    """

    def __init__(self, model, check_model=True):
        if not isinstance(model, FactorGraph):
            raise TypeError(f"model must be a FactorGraph. Got: {type(model)}")
        if check_model:
            model.check_model()
        self.model = model
        self.variables = model.get_variable_nodes()
        self.factors = list(model.factors)
        self.cardinality = model.get_cardinality()
        self._program = None
        self._tables = None

    def _message_key(self, fi, var):
        """Reference-compatible message key (ExactInference.py:1447):
        ``"[factor variables] -> variable"``."""
        return f"{list(self.factors[fi].variables)} -> {var}"

    def _run_flooding(self, fixed_var_messages, max_iter=100, tol=1e-8,
                      precomp_messages=None):
        """Synchronous message passing, one compiled device program per
        graph.  ``fixed_var_messages``: {var: ndarray} external
        (evidence/virtual-evidence) messages multiplied into every
        var->factor message and final beliefs.  ``precomp_messages``
        warm-starts the factor->variable messages (a converged set from a
        previous ``query(get_messages=True)`` makes the sweep converge
        immediately on trees).  Evidence and warm starts are array INPUTS
        to the compiled program, so signature changes never recompile."""
        if (
            self._program is None
            or self._program.max_iter != max_iter
            or self._program.tol != tol
        ):
            self._program = _FloodingProgram(
                [list(f.variables) for f in self.factors],
                self.cardinality,
                max_iter=max_iter,
                tol=tol,
            )
            self._tables = None
        program = self._program
        # factor tables are engine INPUTS; rebuild the padded layout when
        # any factor's values were mutated/rebound since the last query
        # (DiscreteFactor's values setter bumps `_mutation`)
        tables_key = tuple(
            (id(f), f.__dict__.get("_mutation", 0)) for f in self.factors
        )
        if getattr(self, "_tables", None) is None or self._tables[0] != tables_key:
            self._tables = (
                tables_key,
                program.build_tables([f.values for f in self.factors]),
            )
        E, C = program.n_edges, program.max_card

        fixed = np.zeros((E, C), dtype=np.float32)
        f2v_init = np.zeros((E, C), dtype=np.float32)
        for e, ((fi, var), card) in enumerate(zip(program.edges, program.cards)):
            ext = fixed_var_messages.get(var)
            fixed[e, :card] = 1.0 if ext is None else np.asarray(ext, dtype=np.float32)
            key = self._message_key(fi, var)
            if precomp_messages and key in precomp_messages:
                f2v_init[e, :card] = np.asarray(
                    precomp_messages[key], dtype=np.float32
                )
            else:
                f2v_init[e, :card] = 1.0 / card

        out = np.asarray(
            program.run(fixed, f2v_init, self._tables[1]), dtype=np.float64
        )
        return {
            (fi, var): out[e, :card]
            for e, ((fi, var), card) in enumerate(
                zip(program.edges, program.cards)
            )
        }

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
