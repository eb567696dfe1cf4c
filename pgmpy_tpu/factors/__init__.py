from pgmpy_tpu.factors.discrete import DiscreteFactor, State
from pgmpy_tpu.factors.cpd import TabularCPD
from pgmpy_tpu.factors.factor_ops import (
    factor_product,
    factor_sum_product,
    factor_divide,
)

__all__ = [
    "DiscreteFactor",
    "State",
    "TabularCPD",
    "factor_product",
    "factor_sum_product",
    "factor_divide",
]
