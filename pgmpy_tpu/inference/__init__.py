from pgmpy_tpu.inference.base import Inference
from pgmpy_tpu.inference.ve import (
    VariableElimination,
    WeightedMinFill,
    MinNeighbors,
    MinWeight,
    MinFill,
)

__all__ = [
    "Inference",
    "VariableElimination",
    "WeightedMinFill",
    "MinNeighbors",
    "MinWeight",
    "MinFill",
]


def __getattr__(name):
    if name == "BeliefPropagation":
        from pgmpy_tpu.inference.bp import BeliefPropagation

        return BeliefPropagation
    if name == "BeliefPropagationWithMessagePassing":
        from pgmpy_tpu.inference.fg_bp import BeliefPropagationWithMessagePassing

        return BeliefPropagationWithMessagePassing
    if name == "ApproxInference":
        from pgmpy_tpu.inference.approx import ApproxInference

        return ApproxInference
    if name == "CausalInference":
        from pgmpy_tpu.inference.causal import CausalInference

        return CausalInference
    if name == "DBNInference":
        from pgmpy_tpu.inference.dbn import DBNInference

        return DBNInference
    if name == "Mplp":
        from pgmpy_tpu.inference.mplp import Mplp

        return Mplp
    if name == "LinearEstimator":
        from pgmpy_tpu.inference.linear_model import LinearEstimator

        return LinearEstimator
    raise AttributeError(name)
