"""Generic optax-based optimization loop + pseudo-inverse.

TPU-native replacement of the reference torch optimizer loop
(``/root/reference/pgmpy/utils/optimizer.py:10-113``).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax


_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "adagrad": optax.adagrad,
    "adadelta": optax.adadelta,
    "rmsprop": optax.rmsprop,
    "nadam": optax.nadam if hasattr(optax, "nadam") else optax.adam,
    "adamax": optax.adamax,
    "lbfgs": optax.lbfgs if hasattr(optax, "lbfgs") else optax.adam,
}


def optimize(
    loss_fn,
    params={},
    loss_args={},
    opt="adam",
    lr=0.01,
    max_iter=10000,
    exit_delta=1e-4,
):
    """Minimize ``loss_fn(params, loss_args)`` over the pytree ``params``.

    Returns the optimized params (same structure, jnp arrays).
    """
    if isinstance(opt, str):
        if opt.lower() not in _OPTIMIZERS:
            raise ValueError(f"Unknown optimizer: {opt}. Options: {sorted(_OPTIMIZERS)}")
        tx = _OPTIMIZERS[opt.lower()](lr)
    else:
        tx = opt

    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, loss_args))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    prev_loss = None
    for _ in range(int(max_iter)):
        params, opt_state, loss = step(params, opt_state)
        loss = float(loss)
        if prev_loss is not None and abs(prev_loss - loss) < exit_delta:
            break
        prev_loss = loss
    return params


def pinverse(matrix):
    """Moore-Penrose pseudo-inverse."""
    return jnp.linalg.pinv(jnp.asarray(matrix))
