"""FunctionalCPD: a CPD given as parents -> distribution function.

Parity target: ``/root/reference/pgmpy/factors/hybrid/FunctionalCPD.py``
(pyro there).  Here ``fn`` maps a dict of parent values to a
jax-native :mod:`pgmpy_tpu.factors.distributions` object, so ancestral
simulation and log-likelihoods stay vmap-compatible.
"""

import numpy as np

import jax
import jax.numpy as jnp


class _ParamStore:
    """pyro-param-store analogue for SVI-style fitting.

    CPD functions declare learnable parameters with :func:`param`; during
    ``FunctionalBayesianNetwork.fit(estimator="SVI")`` the store is switched
    to "collect" (gather names/inits/constraints by tracing each CPD once)
    and then "apply" (feed optimizer-controlled values into the same trace).
    Outside a fit, :func:`param` returns the last fitted value, so
    ``simulate()`` after ``fit()`` uses the learned parameters — the same
    global-store behavior reference scripts rely on
    (``FunctionalBayesianNetwork.py:525-528``).
    """

    def __init__(self):
        self.mode = None  # None | "collect" | "apply"
        self.values = {}
        self.inits = {}
        self.constraints = {}


_PARAM_STORE = _ParamStore()


def param(name, init=None, constraint=None, **kwargs):
    """Declare/fetch a named learnable parameter (pyro.param shape).

    ``constraint``: anything whose string form contains "positive" (e.g.
    ``torch.distributions.constraints.positive``) selects a softplus
    parametrization during optimization.
    """
    st = _PARAM_STORE
    if st.mode == "collect":
        if name not in st.inits:
            if init is None:
                raise ValueError(f"param {name!r} needs an init value")
            st.inits[name] = jnp.asarray(init)
            st.constraints[name] = constraint
        return st.inits[name]
    if st.mode == "apply":
        return st.values[name]
    if name in st.values:
        return st.values[name]
    if init is None:
        raise KeyError(f"param {name!r} has no stored value and no init")
    return jnp.asarray(init)


def get_param_store():
    """Current fitted parameter values, {name: array}."""
    return dict(_PARAM_STORE.values)


def clear_param_store():
    _PARAM_STORE.values.clear()
    _PARAM_STORE.inits.clear()
    _PARAM_STORE.constraints.clear()


class FunctionalCPD:
    def __init__(self, variable, fn, parents=[]):
        if not callable(fn):
            raise ValueError(f"fn must be a callable. Got: {type(fn)}")
        self.variable = variable
        self.fn = fn
        self.parents = list(parents)
        self.variables = [variable] + self.parents

    def is_valid_cpd(self):
        """Functional CPDs are valid by construction (reference's BaseFactor
        hook, ref factors/base.py:16, is an empty stub)."""
        return True

    def sample(self, n_samples=100, parent_sample=None, seed=None):
        """Draw samples; ``parent_sample`` is a DataFrame of parent values
        (row-aligned) when the CPD has parents."""
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )
        if self.parents:
            if parent_sample is None:
                raise ValueError("parent_sample must be provided when the CPD has parents")
            if len(parent_sample) != n_samples:
                raise ValueError("parent_sample must have n_samples rows")
            keys = jax.random.split(key, n_samples)

            def draw(key_i, row):
                dist = self.fn({p: row[p] for p in self.parents})
                return dist.sample(key_i)

            cols = {p: parent_sample[p].to_numpy() for p in self.parents}
            out = np.empty(n_samples)
            for i in range(n_samples):
                row = {p: cols[p][i] for p in self.parents}
                out[i] = float(draw(keys[i], row))
            return out
        dist = self.fn({})
        return np.asarray(dist.sample(key, (n_samples,)))

    def log_prob(self, values, parent_values=None):
        """log p(values | parents)."""
        if self.parents:
            out = np.empty(len(values))
            for i in range(len(values)):
                row = {p: parent_values[p][i] for p in self.parents}
                out[i] = float(self.fn(row).log_prob(values[i]))
            return out
        return np.asarray(self.fn({}).log_prob(np.asarray(values)))

    def __repr__(self):
        if self.parents:
            return f"<FunctionalCPD: P({self.variable} | {', '.join(map(str, self.parents))}) at {hex(id(self))}>"
        return f"<FunctionalCPD: P({self.variable}) at {hex(id(self))}>"
