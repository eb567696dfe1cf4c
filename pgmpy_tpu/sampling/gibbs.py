"""GibbsSampling: Markov-blanket Gibbs as a compiled scan, vmapped over
chains.

Reference: ``/root/reference/pgmpy/sampling/Sampling.py:409-631``.  The
reference PRE-ENUMERATES an exponential per-variable kernel table (every
combination of all other variables!) and then runs a single sequential
Python chain.  TPU-native redesign: the local conditional
``P(v | markov blanket)`` is computed on the fly inside the kernel — for
each blanket factor, gather the log-potential row for the current
neighborhood state at each candidate state of ``v`` and sum — one
``lax.scan`` over sweeps, ``vmap`` over chains, so 10k chains cost one
compiled program (sharded over the mesh via ``pgmpy_tpu.parallel``).
"""

import networkx as nx
import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import config
from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork
from pgmpy_tpu.models.markov_chain import MarkovChain
from pgmpy_tpu.models.markov_network import DiscreteMarkovNetwork


class CompiledGibbs:
    # a factor table above this element count is NOT duplicated per scope
    # variable: it keeps one shared flat log table with the original
    # scalar-gather formulation (big tables would multiply device memory
    # by their arity, and the one-hot matmul can't fire on them anyway)
    _DUP_TABLE_MAX = 1 << 22

    def __init__(self, factors, variables, cards, state_names):
        """factors: list of DiscreteFactor over ``variables``.

        The local-conditional kernel is formulated as one-hot MXU matmuls,
        not gathers: a TPU gather of scalars serializes per element (the
        r4-measured ~17 ns/elem put the old per-(var, factor) batched
        gathers at ~100 ms per 10k-chain ALARM sweep).  Each blanket
        factor's log table is pre-permuted so the target variable's axis
        is LAST and reshaped to ``(rows, card)``; the chains' neighborhood
        states index the row, so the conditional contribution is
        ``one_hot(row_idx, rows) @ table`` (:func:`core.onehot_table_rows`,
        gather fallback above its tile bounds).  Tables past
        ``_DUP_TABLE_MAX`` elements stay as ONE shared flat copy per
        factor with per-element gathers, trading speed for memory.
        """
        self.variables = list(variables)
        self.var_index = {v: i for i, v in enumerate(self.variables)}
        self.cards = [int(cards[v]) for v in self.variables]
        self.state_names = state_names

        # shared flat log tables for oversized factors (one per factor)
        flat_logs = {}
        factor_meta = []
        for f_id, factor in enumerate(factors):
            vals = np.asarray(factor.values, dtype=np.float64)
            logs = np.log(np.maximum(vals, 1e-38))
            scope_idx = [self.var_index[u] for u in factor.variables]
            strides = []
            acc = 1
            for c in reversed(vals.shape):
                strides.append(acc)
                acc *= c
            strides = list(reversed(strides))
            factor_meta.append((vals, logs, scope_idx, strides))
            if vals.size > self._DUP_TABLE_MAX:
                flat_logs[f_id] = jnp.asarray(
                    logs.ravel(), dtype=config.DTYPE
                )

        # per (variable, blanket factor): either a permuted (rows, card)
        # table spec ("mxu") or a shared-flat gather spec ("flat")
        self._var_specs = []
        for i, v in enumerate(self.variables):
            specs = []
            for f_id, factor in enumerate(factors):
                if v not in factor.variables:
                    continue
                vals, logs, scope_idx, strides = factor_meta[f_id]
                pos = list(factor.variables).index(v)
                if f_id in flat_logs:
                    specs.append(
                        ("flat", flat_logs[f_id], tuple(scope_idx),
                         tuple(strides), pos)
                    )
                    continue
                perm = [k for k in range(vals.ndim) if k != pos] + [pos]
                moved = np.transpose(logs, perm)
                card = vals.shape[pos]
                rows = moved.size // card
                other_idx = tuple(
                    self.var_index[factor.variables[k]]
                    for k in range(vals.ndim)
                    if k != pos
                )
                rstrides = []
                acc = 1
                for c in reversed(
                    [vals.shape[k] for k in range(vals.ndim) if k != pos]
                ):
                    rstrides.append(acc)
                    acc *= c
                rstrides = tuple(reversed(rstrides))
                specs.append(
                    (
                        "mxu",
                        jnp.asarray(
                            moved.reshape(rows, card), dtype=config.DTYPE
                        ),
                        other_idx,
                        rstrides,
                    )
                )
            self._var_specs.append(specs)

        self._run = jax.jit(self._run_chains, static_argnums=(1,))

    def _conditional_logits(self, states, var_i):
        """log P(var_i = k | rest) up to a constant, for EVERY chain:
        states (n, d) -> (n, card)."""
        from pgmpy_tpu.sampling.core import onehot_table_rows

        n = states.shape[0]
        card = self.cards[var_i]
        total = jnp.zeros((n, card), dtype=config.DTYPE)
        for spec in self._var_specs[var_i]:
            if spec[0] == "flat":
                _, flat_table, scope_idx, strides, pos = spec
                base = jnp.zeros((n,), dtype=jnp.int32)
                for j, s in zip(scope_idx, strides):
                    if j != var_i:
                        base = base + states[:, j] * s
                offsets = jnp.arange(card, dtype=jnp.int32) * strides[pos]
                total = total + flat_table[base[:, None] + offsets[None, :]]
                continue
            _, table, other_idx, rstrides = spec
            if not other_idx:
                total = total + table[0][None, :]
                continue
            row = jnp.zeros((n,), dtype=jnp.int32)
            for j, s in zip(other_idx, rstrides):
                row = row + states[:, j] * s
            total = total + onehot_table_rows(table, row, n)
        return total

    def _sweep(self, states, key):
        """One full Gibbs sweep over all variables for every chain:
        states (n, d) -> (n, d)."""
        keys = jax.random.split(key, len(self.variables))
        for i in range(len(self.variables)):
            logits = self._conditional_logits(states, i)
            draw = jax.random.categorical(keys[i], logits, axis=-1).astype(
                jnp.int32
            )
            states = states.at[:, i].set(draw)
        return states

    def _run_chains(self, key, size, init_states):
        """init_states: (n_chains, d).  Returns (size, n_chains, d) in
        int8 when every cardinality fits — the (sweeps, chains, d)
        trajectory is a bulk transfer over the slow tunnel, so shrinking
        it 4x matters more than the sweep kernel."""
        out_dtype = jnp.int8 if max(self.cards, default=2) < 128 else jnp.int32

        def step(states, key_t):
            new_states = self._sweep(states, key_t)
            return new_states, new_states.astype(out_dtype)

        keys = jax.random.split(key, size)
        _, trajectory = jax.lax.scan(step, init_states.astype(jnp.int32), keys)
        return trajectory


class GibbsSampling(MarkovChain):
    """API parity with the reference GibbsSampling (which subclasses
    MarkovChain — sample() here is the compiled Markov-blanket kernel, but
    the chain surface (add_variable/add_transition_model/is_stationarity/
    prob_from_sample) is inherited), plus multi-chain throughput via
    ``sample_chains``.

    Examples
    --------
    >>> from pgmpy_tpu.factors import TabularCPD
    >>> from pgmpy_tpu.models import DiscreteBayesianNetwork
    >>> from pgmpy_tpu.sampling import GibbsSampling
    >>> model = DiscreteBayesianNetwork([("rain", "wet")])
    >>> model.add_cpds(
    ...     TabularCPD("rain", 2, [[0.8], [0.2]]),
    ...     TabularCPD("wet", 2, [[0.9, 0.2], [0.1, 0.8]],
    ...                evidence=["rain"], evidence_card=[2]))
    >>> gibbs = GibbsSampling(model)
    >>> df = gibbs.sample(size=5, seed=0)  # one chain, 5 sweeps
    >>> sorted(df.columns), len(df)
    (['rain', 'wet'], 5)
    >>> chains = gibbs.sample_chains(n_chains=64, size=10, seed=0)
    >>> chains.shape  # (sweeps, chains, variables)
    (10, 64, 2)
    """

    def __init__(self, model=None):
        self.state = None
        self.transition_models = {}
        if isinstance(model, DiscreteBayesianNetwork):
            model.check_model()
            factors = [cpd.to_factor() for cpd in model.get_cpds()]
            cards = {v: model.get_cardinality(v) for v in model.nodes()}
            state_names = model.states
            self.variables = list(nx.topological_sort(model))
        elif isinstance(model, DiscreteMarkovNetwork):
            model.check_model()
            factors = list(model.get_factors())
            cards = model.get_cardinality()
            state_names = model.states
            self.variables = list(model.nodes())
        elif model is None:
            self.variables = []
            return
        else:
            raise ValueError(
                f"model must be a DiscreteBayesianNetwork or DiscreteMarkovNetwork. Got {type(model)}"
            )
        self.latents = set(getattr(model, "latents", set()) or set())
        self.cardinalities = {v: int(cards[v]) for v in self.variables}
        self.transition_models = {v: {} for v in self.variables}
        self._compiled = CompiledGibbs(factors, self.variables, cards, state_names)
        self.state_names = state_names

    def random_state(self, n_chains=1, seed=None):
        rng = np.random.default_rng(seed)
        return np.stack(
            [
                rng.integers(0, [self.cardinalities[v] for v in self.variables])
                for _ in range(n_chains)
            ]
        ).astype(np.int32)

    def set_start_state(self, start_state):
        self._start = start_state

    def _init_codes(self, start_state, n_chains, seed):
        if start_state is None:
            return self.random_state(n_chains, seed)
        codes = []
        state_map = dict((var, st) for var, st in start_state)
        for v in self.variables:
            st = state_map[v]
            names = self.state_names[v]
            codes.append(names.index(st) if st in names else int(st))
        return np.tile(np.asarray(codes, dtype=np.int32), (n_chains, 1))

    def sample(self, start_state=None, size=1, seed=None, include_latents=False):
        """A single-chain trajectory of ``size`` sweeps as a DataFrame.
        Latent columns are dropped unless ``include_latents`` (reference
        ``Sampling.py:583-585``)."""
        import pandas as pd

        init = self._init_codes(start_state, 1, seed)
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )
        traj = np.asarray(self._compiled._run(key, int(size), jnp.asarray(init)))
        df = pd.DataFrame(traj[:, 0, :], columns=self.variables)
        if not include_latents and self.latents:
            df = df.drop(columns=[v for v in self.variables if v in self.latents])
        return df

    def sample_chains(self, n_chains, size, start_state=None, seed=None, thin=1):
        """(size, n_chains, d) integer trajectory for many chains in one
        compiled program — int8 when every cardinality < 128 (cheap
        transfer; upcast before flat-index arithmetic), int32 otherwise."""
        init = self._init_codes(start_state, n_chains, seed)
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )
        traj = self._compiled._run(key, int(size), jnp.asarray(init))
        return traj[::thin]

    def generate_sample(self, start_state=None, size=1, include_latents=False, seed=None):
        """Generator over sweeps (reference ``Sampling.py:587-633``);
        ``include_latents=False`` drops latent variables from each yielded
        assignment."""
        # sample() now drops latents itself; ask for the full frame here
        # and filter per include_latents below
        df = self.sample(start_state=start_state, size=size, seed=seed,
                         include_latents=True)
        from pgmpy_tpu.factors.discrete import State

        latents = getattr(self, "latents", set()) or set()
        keep = [
            v for v in self.variables if include_latents or v not in latents
        ]
        for _, row in df.iterrows():
            yield [State(v, int(row[v])) for v in keep]
