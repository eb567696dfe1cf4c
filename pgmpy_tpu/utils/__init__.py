from pgmpy_tpu.utils.state_name import StateNameMixin
from pgmpy_tpu.utils.utils import (
    get_example_model,
    get_dataset_type,
    preprocess_data,
    discretize,
)
from pgmpy_tpu.utils.optimizer import optimize, pinverse

__all__ = [
    "StateNameMixin",
    "get_example_model",
    "get_dataset_type",
    "preprocess_data",
    "discretize",
    "optimize",
    "pinverse",
]
