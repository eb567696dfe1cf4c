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

    objective = lambda p: loss_fn(p, loss_args)

    def one_step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(objective)(params)
        try:
            updates, new_state = tx.update(
                grads, opt_state, params, value=loss, grad=grads,
                value_fn=objective,
            )
        except TypeError:
            updates, new_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state), loss

    # Steps run in jitted lax.scan chunks with ONE host sync per chunk:
    # syncing the loss every step costs a device round-trip per iteration,
    # which through the remote-TPU tunnel dominates the whole fit.
    chunk = max(1, min(64, int(max_iter)))

    @jax.jit
    def run_chunk(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=chunk
        )
        return params, opt_state, losses

    steps_done = 0
    while steps_done < int(max_iter):
        params, opt_state, losses = run_chunk(params, opt_state)
        steps_done += chunk
        losses = np.asarray(losses, dtype=np.float64)
        if not np.isfinite(losses[-1]):
            break
        if losses.size >= 2 and abs(losses[-2] - losses[-1]) < exit_delta:
            break
    return params


def pinverse(t):
    """Moore-Penrose pseudo-inverse."""
    matrix = t
    return jnp.linalg.pinv(jnp.asarray(matrix))
