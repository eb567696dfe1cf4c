"""MarkovChain: multi-variable Markov chain with per-variable transition
models.

Parity: ``/root/reference/pgmpy/models/MarkovChain.py:13-538``.  The sampler
is a ``lax.scan`` over time steps with ``jax.random.categorical`` draws —
the whole trajectory is generated on device in one compiled program instead
of the reference's per-step Python loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from pgmpy_tpu.factors.discrete import State


class MarkovChain:
    """Multi-variable Markov chain with per-variable transition models;
    sampling runs as a compiled ``lax.scan``.

    Examples
    --------
    >>> from pgmpy_tpu.models import MarkovChain
    >>> chain = MarkovChain(["weather"], [2], start_state=[("weather", 0)])
    >>> chain.add_transition_model("weather",
    ...                            {0: {0: 0.7, 1: 0.3}, 1: {0: 0.3, 1: 0.7}})
    >>> df = chain.sample(size=10, seed=0)
    >>> (list(df.columns), len(df))
    (['weather'], 10)
    >>> bool(chain.is_stationarity(tolerance=0.2))
    True
    """

    def __init__(self, variables=None, card=None, start_state=None):
        if variables is None:
            variables = []
        if card is None:
            card = []
        if not hasattr(variables, "__iter__") or isinstance(variables, str):
            raise ValueError("variables must be a non-string iterable.")
        if not hasattr(card, "__iter__") or isinstance(card, str):
            raise ValueError("card must be a non-string iterable.")
        self.variables = list(variables)
        self.cardinalities = {v: c for v, c in zip(variables, card)}
        self.transition_models = {var: {} for var in variables}
        if start_state is None or self._check_state(start_state):
            self.state = start_state

    def _check_state(self, state):
        try:
            list_, state_vars = map(list, zip(*state))
        except TypeError:
            raise ValueError("Start state must be a list of 2-tuples or a State namedtuple.")
        if not set(self.variables) == set(list_):
            raise ValueError(f"Start state must represent a complete assignment to all variables. Expected variables in state: {list_}, Got: {self.variables}.")
        for var, val in state:
            if val >= self.cardinalities[var]:
                raise ValueError(f"Assignment {val} to {var} invalid.")
        return True

    def set_start_state(self, start_state):
        if start_state is not None:
            if not isinstance(start_state, list):
                raise ValueError("start_state must be a list of State namedtuples")
            # reorder to self.variables order
            state_dict = {var: st for var, st in start_state}
            start_state = [State(var, state_dict[var]) for var in self.variables]
        if start_state is None or self._check_state(start_state):
            self.state = start_state

    def add_variable(self, variable, card=0):
        if variable not in self.variables:
            self.variables.append(variable)
        self.cardinalities[variable] = card
        self.transition_models[variable] = {}

    def add_variables_from(self, variables, cards):
        for var, card in zip(variables, cards):
            self.add_variable(var, card)

    def add_transition_model(self, variable, transition_model):
        """``transition_model``: {from_state: {to_state: prob}} or a 2-D
        array with rows = from-state distributions."""
        if isinstance(transition_model, (np.ndarray, list)):
            arr = np.asarray(transition_model)
            if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
                raise ValueError("Transition model must be a square matrix")
            transition_model = {
                i: {j: float(arr[i, j]) for j in range(arr.shape[1])}
                for i in range(arr.shape[0])
            }
        if not isinstance(transition_model, dict):
            raise ValueError("Transition model must be a dict or 2-D array")
        exp_states = set(range(self.cardinalities[variable]))
        if set(transition_model.keys()) != exp_states:
            raise ValueError("Transitions must be defined for all states of variable")
        for _, transition in transition_model.items():
            if not isinstance(transition, dict):
                raise ValueError("Each transition must be a dict")
            if set(transition.keys()) != exp_states:
                raise ValueError("Transitions must be defined for all states of variable")
            if abs(sum(transition.values()) - 1.0) > 1e-6:
                raise ValueError("Transition probabilities must sum to 1")
        self.transition_models[variable] = transition_model

    def _transition_matrices(self):
        mats = {}
        for var in self.variables:
            card = self.cardinalities[var]
            mat = np.zeros((card, card))
            for i, row in self.transition_models[var].items():
                for j, p in row.items():
                    mat[i, j] = p
            mats[var] = mat
        return mats

    def sample(self, start_state=None, size=1, seed=None):
        """Sample a trajectory of length ``size`` as one compiled scan."""
        if start_state is None:
            if self.state is None:
                self.state = self.random_state()
        else:
            self.set_start_state(start_state)

        mats = self._transition_matrices()
        log_mats = [jnp.log(jnp.asarray(np.maximum(mats[v], 1e-38))) for v in self.variables]
        init = jnp.asarray([st for _, st in self.state], dtype=jnp.int32)
        key = jax.random.PRNGKey(np.random.randint(0, 2**31) if seed is None else seed)

        def step(carry, key_t):
            state = carry
            keys = jax.random.split(key_t, len(log_mats))
            new_state = jnp.stack(
                [
                    jax.random.categorical(keys[i], log_mats[i][state[i]])
                    for i in range(len(log_mats))
                ]
            ).astype(jnp.int32)
            return new_state, state

        keys = jax.random.split(key, size)
        last, states = jax.lax.scan(step, init, keys)
        self.state = [
            State(var, int(v)) for var, v in zip(self.variables, np.asarray(last))
        ]
        return pd.DataFrame(np.asarray(states), columns=self.variables)

    def prob_from_sample(self, state, sample=None, window_size=None):
        """Empirical probability trace of ``state`` across sliding windows."""
        if sample is None:
            sample = self.sample(self.state, size=10000)
        if window_size is None:
            window_size = len(sample) // 100
        indicator = np.ones(len(sample), dtype=bool)
        for var, st in state:
            indicator &= (sample[var] == st).to_numpy()
        probabilities = []
        for i in range(0, len(sample), window_size):
            win = indicator[i : i + window_size]
            probabilities.append(win.mean() if len(win) else 0.0)
        return probabilities

    def generate_sample(self, start_state=None, size=1, seed=None):
        """Generator of successive states."""
        df = self.sample(start_state=start_state, size=size, seed=seed)
        for _, row in df.iterrows():
            yield [State(var, int(row[var])) for var in self.variables]

    def is_stationarity(self, tolerance=0.2, sample=None):
        """Heuristic stationarity check on windowed marginals."""
        keys = self.transition_models.keys()
        return_val = True
        for k in keys:
            # sample trajectory marginal stability for state 0 of each var
            probs = self.prob_from_sample([State(k, 0)], sample=sample)
            if len(probs) >= 2:
                half = len(probs) // 2
                diff = abs(np.mean(probs[:half]) - np.mean(probs[half:]))
                if diff > tolerance:
                    return_val = False
        return return_val

    def random_state(self):
        return [
            State(var, np.random.randint(self.cardinalities[var]))
            for var in self.variables
        ]

    def copy(self):
        markov_chain = MarkovChain(
            variables=list(self.variables),
            card=[self.cardinalities[var] for var in self.variables],
            start_state=self.state,
        )
        for var, tm in self.transition_models.items():
            if tm:
                markov_chain.transition_models[var] = {
                    k: dict(v) for k, v in tm.items()
                }
        return markov_chain
