"""pgmpy_tpu — a TPU-native probabilistic graphical models framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of pgmpy
(reference at ``/root/reference``): host-side symbolic layer (graphs,
elimination-order and junction-tree compilers, parsers) feeding device-side
compiled numeric kernels (factor contractions, calibration schedules,
vmapped samplers sharded over TPU meshes).
"""

from pgmpy_tpu.config import config, logger

__version__ = "0.1.0"

__all__ = ["config", "logger", "__version__"]
