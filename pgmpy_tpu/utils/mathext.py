"""Math helpers: cartesian products, categorical draws, powersets.

Parity: ``/root/reference/pgmpy/utils/mathext.py:14-224``.  The categorical
sampling helpers exist for API compatibility; the compiled samplers in
``pgmpy_tpu.sampling.core`` are the performance path.
"""

from collections import namedtuple
from itertools import chain, combinations

import numpy as np

import jax
import jax.numpy as jnp

# (variable, state) pair used in evidence lists, mirroring the reference's
# ``State`` namedtuple (utils/mathext.py:11).
State = namedtuple("State", ["var", "state"])


def cartesian(arrays, out=None):
    """Cartesian product of input arrays as an (N, len(arrays)) matrix."""
    arrays = [np.asarray(a) for a in arrays]
    dtype = arrays[0].dtype
    n = int(np.prod([a.size for a in arrays]))
    if out is None:
        out = np.zeros((n, len(arrays)), dtype=dtype)
    m = n // arrays[0].size
    out[:, 0] = np.repeat(arrays[0], m)
    if arrays[1:]:
        cartesian(arrays[1:], out=out[0:m, 1:])
        for j in range(1, arrays[0].size):
            out[j * m : (j + 1) * m, 1:] = out[0:m, 1:]
    return out


def sample_discrete(values, weights, size=1, seed=None):
    """Draw from a categorical distribution; ``weights`` may be a single
    distribution or one distribution per sample row."""
    rng = np.random.default_rng(seed)
    weights = np.asarray(weights, dtype=np.float64)
    values = np.asarray(values)
    if weights.ndim == 1:
        idx = rng.choice(len(values), size=size, p=weights / weights.sum())
        return values[idx]
    out = np.empty(weights.shape[0], dtype=values.dtype)
    unique_rows, inverse = np.unique(weights, axis=0, return_inverse=True)
    for k, row in enumerate(unique_rows):
        mask = inverse == k
        out[mask] = values[
            rng.choice(len(values), size=int(mask.sum()), p=row / row.sum())
        ]
    return out


def sample_discrete_maps(states, weight_indices, index_to_weight, size=1, seed=None):
    """Categorical draws with a per-row pointer into a weight table."""
    rng = np.random.default_rng(seed)
    states = np.asarray(states)
    out = np.empty(len(weight_indices), dtype=states.dtype)
    for widx in np.unique(weight_indices):
        mask = weight_indices == widx
        weights = np.asarray(index_to_weight[widx], dtype=np.float64)
        out[mask] = states[
            rng.choice(len(states), size=int(mask.sum()), p=weights / weights.sum())
        ]
    return out


def powerset(iterable):
    """All subsets of the iterable as tuples."""
    s = list(iterable)
    return chain.from_iterable(combinations(s, r) for r in range(len(s) + 1))
