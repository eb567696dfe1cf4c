"""Pallas TPU kernels for hot ops where XLA's default lowering is weak.

``weighted_bincount``: the learning hot path (state counts, empirical
marginals) is a weighted scatter-add.  TPU scatter lowers to serialized
updates; this kernel instead processes the data in chunks, expands each
chunk to a one-hot matrix in VMEM and accumulates ``one_hot^T @ w`` on the
MXU — the TPU grid runs sequentially per core, so a constant output
index_map accumulates across grid steps (revisiting pattern).

Falls back to ``jnp .at[].add`` scatter on non-TPU platforms or when
shapes don't fit VMEM.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pgmpy_tpu.config import config

_CHUNK = 1024
# keep the one-hot tile under ~4 MB of VMEM: CHUNK * length * 4B
_MAX_LENGTH = 1024

try:  # pallas import kept optional so CPU-only environments still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _bincount_kernel(idx_ref, w_ref, out_ref, *, length):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]  # (chunk,)
    w = w_ref[:]
    # one-hot (chunk, length) built on the VPU; contraction on the MXU
    col = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], length), 1)
    onehot = (col == idx[:, None]).astype(w.dtype)
    out_ref[:] = out_ref[:] + jax.lax.dot_general(
        w[None, :],
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def weighted_bincount_pallas(flat_idx, weights, length, interpret=False):
    """Pallas implementation of ``bincount(flat_idx, weights, length)``."""
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable")
    n = flat_idx.shape[0]
    n_pad = -(-n // _CHUNK) * _CHUNK
    if n_pad != n:
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.full((n_pad - n,), length, dtype=flat_idx.dtype)]
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((n_pad - n,), dtype=weights.dtype)]
        )
    grid = (n_pad // _CHUNK,)

    out = pl.pallas_call(
        functools.partial(_bincount_kernel, length=length),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,)),
            pl.BlockSpec((_CHUNK,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((length,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((length,), weights.dtype),
        interpret=interpret,
    )(flat_idx, weights)
    return out


def weighted_bincount(flat_idx, weights, length, force=None):
    """Dispatch: pallas on TPU for in-VMEM lengths, scatter-add otherwise.

    ``force``: "pallas" | "scatter" | None (auto).
    """
    use_pallas = force == "pallas"
    if force is None:
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and length <= _MAX_LENGTH
        )
    if use_pallas:
        try:
            return weighted_bincount_pallas(flat_idx, weights, length)
        except Exception:  # pragma: no cover - fall back on lowering issues
            pass
    return jnp.zeros(length, dtype=weights.dtype).at[flat_idx].add(weights)
