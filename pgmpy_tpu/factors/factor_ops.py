"""Free-function factor algebra: product / sum-product / divide.

Parity with ``/root/reference/pgmpy/factors/base.py:20-163``; the
multi-factor ``factor_sum_product`` lowers to ONE fused einsum over all
operand value tensors (the reference's opt_einsum path), which is the hot
kernel of greedy variable elimination.

Examples
--------
>>> import numpy as np
>>> from pgmpy_tpu.factors import DiscreteFactor
>>> from pgmpy_tpu.factors import factor_product, factor_sum_product
>>> f1 = DiscreteFactor(["a", "b"], [2, 2], [0.5, 0.5, 0.2, 0.8])
>>> f2 = DiscreteFactor(["b", "c"], [2, 2], [0.4, 0.6, 0.9, 0.1])
>>> joint = factor_product(f1, f2)
>>> joint.variables
['a', 'b', 'c']
>>> marg = factor_sum_product(["c"], [f1, f2])  # one fused einsum
>>> np.asarray(marg.values, dtype=float).round(3).tolist()
[1.45, 0.55]
"""

from functools import reduce

from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.ops.einsum import make_axis_map, sum_product_planned


def factor_product(*args):
    """Product of an arbitrary number of factors."""
    if not all(isinstance(phi, DiscreteFactor) for phi in args):
        raise TypeError("Arguments must be factors")
    if len(args) == 1:
        return args[0].copy()
    return reduce(lambda phi1, phi2: phi1 * phi2, args)


def factor_sum_product(output_vars, factors):
    """``sum_{vars not in output_vars} prod(factors)`` as a single fused
    einsum contraction.

    Parameters
    ----------
    output_vars : list
        Variables of the resulting factor (must appear in some factor).
    factors : list of DiscreteFactor
    """
    all_vars = set()
    for phi in factors:
        all_vars.update(phi.variables)
    missing = set(output_vars) - all_vars
    if missing:
        raise ValueError(f"output_vars not in the factors: {missing}")

    var_to_int, operand_axes = make_axis_map([phi.variables for phi in factors])
    out_axes = tuple(var_to_int[v] for v in output_vars)
    values = sum_product_planned(
        operand_axes, out_axes, [phi.values for phi in factors]
    )

    state_names = {}
    cards = {}
    for phi in factors:
        for var, card in zip(phi.variables, phi.cardinality):
            cards[var] = int(card)
        state_names.update(phi.state_names)
    return DiscreteFactor(
        list(output_vars),
        [cards[v] for v in output_vars],
        values,
        state_names={v: state_names[v] for v in output_vars},
    )


def factor_divide(phi1, phi2):
    """phi1 / phi2 with 0/0 == 0."""
    if not isinstance(phi1, DiscreteFactor) or not isinstance(phi2, DiscreteFactor):
        raise TypeError("phi1 and phi2 should be factors instances")
    return phi1.divide(phi2, inplace=False)
