"""Global configuration for pgmpy_tpu.

TPU-native analogue of the reference's config singleton
(``/root/reference/pgmpy/global_vars.py:32-186``).  The reference switches
between a numpy and a torch backend; here there is a single JAX backend, so
the config instead controls

* ``DTYPE``    — the default floating dtype for factor values.  TPUs natively
  prefer float32/bfloat16; float64 is available via ``jax_enable_x64`` for
  parity testing on CPU.
* ``MESH``     — an optional :class:`jax.sharding.Mesh` that sampling kernels
  use to shard chains/particles across devices (``parallel/mesh.py``).
* ``SHOW_PROGRESS`` — progress bars for long host-side loops.
"""

import logging

import jax
import jax.numpy as jnp

# Smallest NORMAL float32.  XLA flushes subnormals to zero, so a literal
# 1e-38 inside a compiled program silently becomes 0.0 and a
# `x / maximum(d, 1e-38)` zero-division guard turns into 0/0 = NaN
# (observed on the insurance network's deterministic zeros).  Every
# device-side clamp must use this instead.
TINY = 1.1754944e-38


class _DuplicateFilter(logging.Filter):
    """Suppress consecutive duplicate log records (reference:
    ``global_vars.py:10-30``)."""

    def __init__(self):
        super().__init__()
        self._last = None

    def filter(self, record):
        current = record.getMessage()
        if current != self._last:
            self._last = current
            return True
        return False


logger = logging.getLogger("pgmpy_tpu")
logger.addFilter(_DuplicateFilter())


class Config:
    def __init__(self):
        self._dtype = jnp.float32
        self._int_dtype = jnp.int32
        self._mesh = None
        self._show_progress = True
        self._default_einsum_optimize = "greedy"

    # -- dtype ------------------------------------------------------------
    @property
    def DTYPE(self):
        return self._dtype

    def set_dtype(self, dtype):
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float64 and not jax.config.read("jax_enable_x64"):
            jax.config.update("jax_enable_x64", True)
        self._dtype = dtype

    def get_dtype(self):
        return self._dtype

    @property
    def INT_DTYPE(self):
        return self._int_dtype

    # -- compute backend (API parity shim) --------------------------------
    # The reference exposes set_backend("numpy"|"torch"); the only backend
    # here is JAX, so this validates and optionally flips x64 for parity.
    @property
    def BACKEND(self):
        return "jax"

    def set_backend(self, backend, device=None, dtype=None):
        if backend not in ("jax", "numpy", "torch"):
            raise ValueError(f"backend must be one of jax/numpy/torch. Got: {backend}")
        if backend != "jax":
            logger.warning(
                f"pgmpy_tpu has a single JAX/XLA backend; ignoring backend={backend!r}."
            )
        if dtype is not None:
            self.set_dtype(dtype)

    # -- devices / mesh ---------------------------------------------------
    @property
    def DEVICE(self):
        return jax.devices()[0]

    @property
    def MESH(self):
        return self._mesh

    def set_mesh(self, mesh):
        self._mesh = mesh

    # -- progress ---------------------------------------------------------
    @property
    def SHOW_PROGRESS(self):
        return self._show_progress

    def set_show_progress(self, show: bool):
        self._show_progress = bool(show)

    def get_show_progress(self):
        return self._show_progress


config = Config()
