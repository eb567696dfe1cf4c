from pgmpy_tpu.factors.discrete import DiscreteFactor, State
from pgmpy_tpu.factors.cpd import TabularCPD
from pgmpy_tpu.factors.factor_ops import (
    factor_product,
    factor_sum_product,
    factor_divide,
)
from pgmpy_tpu.factors.factor_dict import FactorDict
from pgmpy_tpu.factors.factor_set import (
    FactorSet,
    factorset_product,
    factorset_divide,
)
from pgmpy_tpu.factors.jpd import JointProbabilityDistribution
from pgmpy_tpu.factors.continuous import LinearGaussianCPD
from pgmpy_tpu.factors.noisy_or import NoisyORCPD
from pgmpy_tpu.factors.hybrid import (
    FunctionalCPD,
    clear_param_store,
    get_param_store,
    param,
)

__all__ = [
    "DiscreteFactor",
    "State",
    "TabularCPD",
    "factor_product",
    "factor_sum_product",
    "factor_divide",
    "FactorDict",
    "FactorSet",
    "factorset_product",
    "factorset_divide",
    "JointProbabilityDistribution",
    "LinearGaussianCPD",
    "NoisyORCPD",
    "FunctionalCPD",
    "param",
    "get_param_store",
    "clear_param_store",
]
