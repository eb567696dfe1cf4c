"""Sampler-state checkpoint/resume.

The reference persists models only (``SURVEY.md`` §5 — no training-state
checkpointing).  Here long-running chain samplers can save and resume:
chain states + PRNG key + step counter round-trip through ``.npz`` (orbax
is available for multi-host sharded state, but single-file npz keeps the
common case dependency-free and portable).
"""

import numpy as np

import jax
import jax.numpy as jnp


def save_sampler_state(path, chain_states, key, step=0, extra=None):
    """Persist chain states (any array pytree), PRNG key and step."""
    leaves, treedef = jax.tree_util.tree_flatten(chain_states)
    payload = {
        "__n_leaves__": np.asarray(len(leaves)),
        "__key__": np.asarray(key),
        "__step__": np.asarray(step),
        "__treedef__": np.frombuffer(str(treedef).encode(), dtype=np.uint8),
    }
    for i, leaf in enumerate(leaves):
        payload[f"leaf_{i}"] = np.asarray(leaf)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_sampler_state(path, treedef_like=None):
    """Load (chain_states, key, step, extra).  ``treedef_like``: an example
    pytree with the same structure used at save time (lists/dicts of
    arrays); when None, a flat list of leaves is returned."""
    data = np.load(path, allow_pickle=False)
    n = int(data["__n_leaves__"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    key = jnp.asarray(data["__key__"])
    step = int(data["__step__"])
    extra = {
        k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
    }
    if treedef_like is not None:
        _, treedef = jax.tree_util.tree_flatten(treedef_like)
        states = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        states = leaves
    return states, key, step, extra
