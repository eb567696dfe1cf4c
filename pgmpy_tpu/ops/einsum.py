"""Interleaved-format einsum helpers: the device-side contraction core.

The reference funnels multi-factor products through one ``opt_einsum.contract``
call (``/root/reference/pgmpy/factors/base.py:69-116``,
``/root/reference/pgmpy/inference/ExactInference.py:404``).  Here the same
idea is the *design center*: a host-side planner maps variable names to
integer axis labels and emits a single ``jnp.einsum`` in interleaved form
(``einsum(op0, axes0, op1, axes1, ..., out_axes)``), which supports an
unbounded number of distinct variables (no 26-letter limit) and lets XLA
fuse the whole contraction.  Contraction paths are computed once per static
shape signature and cached, so repeated queries re-use the plan.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Probability contractions need full f32 accumulation: the default TPU matmul
# precision is bfloat16, which costs ~3 decimal digits on posterior
# marginals.  HIGHEST keeps einsum on the MXU with f32 passes.
PRECISION = jax.lax.Precision.HIGHEST


def sum_product(operand_axes, out_axes, *arrays, optimize="greedy"):
    """Contract ``arrays`` (aligned with ``operand_axes``, each a tuple of
    integer axis labels) down to ``out_axes``.

    This is jit-traceable: under ``jit`` the path search runs at trace time
    on static shapes.
    """
    interleaved = []
    for arr, axes in zip(arrays, operand_axes):
        interleaved.append(arr)
        interleaved.append(list(axes))
    interleaved.append(list(out_axes))
    return jnp.einsum(*interleaved, optimize=optimize, precision=PRECISION)


def make_axis_map(factor_scopes):
    """Map every variable appearing in ``factor_scopes`` to a unique integer
    axis label.  Returns (var_to_int dict, operand_axes list)."""
    var_to_int = {}
    operand_axes = []
    for scope in factor_scopes:
        axes = []
        for var in scope:
            if var not in var_to_int:
                var_to_int[var] = len(var_to_int)
            axes.append(var_to_int[var])
        operand_axes.append(tuple(axes))
    return var_to_int, operand_axes


@lru_cache(maxsize=4096)
def _cached_path(operand_axes, out_axes, shapes, optimize):
    """Contraction path for a static signature, via opt_einsum (bundled with
    jax)."""
    import opt_einsum

    inputs = [dict(zip(axes, shape)) for axes, shape in zip(operand_axes, shapes)]
    # opt_einsum accepts the interleaved int-label format through contract_path
    interleaved = []
    for axes, shape in zip(operand_axes, shapes):
        interleaved.append(np.empty(shape))
        interleaved.append(list(axes))
    interleaved.append(list(out_axes))
    path, _ = opt_einsum.contract_path(*interleaved, optimize=optimize)
    return tuple(path)


def sum_product_planned(operand_axes, out_axes, arrays, optimize="greedy"):
    """Like :func:`sum_product` but with an explicitly cached contraction
    path keyed on (axes, shapes) so host-side planning cost is paid once."""
    shapes = tuple(tuple(a.shape) for a in arrays)
    path = _cached_path(
        tuple(tuple(ax) for ax in operand_axes), tuple(out_axes), shapes, optimize
    )
    interleaved = []
    for arr, axes in zip(arrays, operand_axes):
        interleaved.append(arr)
        interleaved.append(list(axes))
    interleaved.append(list(out_axes))
    return jnp.einsum(*interleaved, optimize=list(path), precision=PRECISION)
