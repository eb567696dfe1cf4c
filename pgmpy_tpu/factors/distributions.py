"""Minimal jax-native distribution objects for functional CPDs.

The reference uses pyro distributions
(``/root/reference/pgmpy/factors/hybrid/FunctionalCPD.py``); these provide
the same role with ``sample(key, shape)`` / ``log_prob(x)`` built on
``jax.random`` so functional models stay jit/vmap-compatible.
"""

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import TINY
import numpy as np


class Distribution:
    #: support tag consumed by the MCMC reparametrization in
    #: FunctionalBayesianNetwork.fit: "real", "positive", or
    #: ("interval", low, high)
    support = "real"

    def sample(self, key, shape=()):
        raise NotImplementedError

    def log_prob(self, x):
        raise NotImplementedError


class Normal(Distribution):
    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(key, shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi)


class LogNormal(Distribution):
    support = "positive"

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    def sample(self, key, shape=()):
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))

    def log_prob(self, x):
        logx = jnp.log(x)
        z = (logx - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi) - logx


class Exponential(Distribution):
    support = "positive"

    def __init__(self, rate):
        self.rate = rate

    def sample(self, key, shape=()):
        return jax.random.exponential(key, shape) / self.rate

    def log_prob(self, x):
        return jnp.log(self.rate) - self.rate * x


class Gamma(Distribution):
    support = "positive"

    def __init__(self, concentration, rate):
        self.concentration = concentration
        self.rate = rate

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.concentration, shape) / self.rate

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        return (
            a * jnp.log(b)
            - jax.scipy.special.gammaln(a)
            + (a - 1) * jnp.log(x)
            - b * x
        )


class Beta(Distribution):
    support = ("interval", 0.0, 1.0)

    def __init__(self, a, b):
        self.a = a
        self.b = b

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.a, self.b, shape)

    def log_prob(self, x):
        a, b = self.a, self.b
        return (
            (a - 1) * jnp.log(x)
            + (b - 1) * jnp.log1p(-x)
            + jax.scipy.special.gammaln(a + b)
            - jax.scipy.special.gammaln(a)
            - jax.scipy.special.gammaln(b)
        )


class Categorical(Distribution):
    def __init__(self, probs):
        self.probs = jnp.asarray(probs)

    def sample(self, key, shape=()):
        return jax.random.categorical(
            key, jnp.log(jnp.maximum(self.probs, TINY)), shape=shape
        )

    def log_prob(self, x):
        return jnp.log(jnp.maximum(self.probs[x.astype(int)], TINY))


class Uniform(Distribution):
    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high
        self.support = ("interval", float(low), float(high))

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.low, maxval=self.high)

    def log_prob(self, x):
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)


class HalfNormal(Distribution):
    """|N(0, scale)| — the standard scale prior in the reference's
    FunctionalBN docstrings."""

    support = "positive"

    def __init__(self, scale):
        self.scale = scale

    def sample(self, key, shape=()):
        return jnp.abs(self.scale * jax.random.normal(key, shape))

    def log_prob(self, x):
        z = x / self.scale
        return (
            0.5 * jnp.log(2.0 / jnp.pi)
            - jnp.log(self.scale)
            - 0.5 * z**2
        )
