"""Device-mesh parallelism for samplers: chains/samples sharded over ICI.

The reference has NO distributed layer (single-process joblib only,
``SURVEY.md`` §2.8).  This module is the TPU-native replacement: a 1-D
``chains`` mesh over which sampling kernels run under ``shard_map``, with
``psum`` collectives reducing sufficient statistics (weighted one-hot
moment sums) across devices.  Multi-host pods extend the same mesh over
DCN via ``jax.distributed.initialize`` — the kernel code is unchanged.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pgmpy_tpu.config import config


def get_mesh(n_devices=None, axis_name="chains", devices=None):
    """A 1-D mesh over local (or given) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _one_hot_moments(codes, weights, cards):
    """Per-variable weighted state counts: list of (card,) arrays."""
    moments = []
    for j, card in enumerate(cards):
        onehot = jax.nn.one_hot(codes[:, j], card, dtype=config.DTYPE)
        moments.append(jnp.einsum("nc,n->c", onehot, weights))
    return moments


def sharded_sample_marginals(
    model, n_samples, mesh=None, evidence=None, seed=0, axis_name="chains"
):
    """Empirical (evidence-weighted) marginals of every variable from
    ``n_samples`` draws, sharded over the mesh.

    Each device draws ``n_samples / n_devices`` likelihood-weighted samples
    (plain forward when no evidence), computes local weighted one-hot
    moments, and a ``psum`` over the chains axis reduces them; the final
    normalization happens on the reduced sums, so results are independent
    of the device count.
    """
    from pgmpy_tpu.sampling.core import CompiledAncestralSampler

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    per_dev = -(-int(n_samples) // n_dev)

    sampler = CompiledAncestralSampler(model)
    cards = tuple(sampler.cards)
    ev = tuple(
        sorted(
            (sampler.var_index[v], sampler.state_names[v].index(s) if s in sampler.state_names[v] else int(s))
            for v, s in (evidence or {}).items()
        )
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P(),
    )
    def run(key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key[0], idx)
        if ev:
            codes, logw = sampler._likelihood_weighted(key, per_dev, ev)
            w = jnp.exp(logw - jax.lax.pmax(jnp.max(logw), axis_name))
        else:
            codes = sampler._forward(
                key, per_dev, jnp.full((len(cards),), -1, dtype=jnp.int32)
            )
            w = jnp.ones((per_dev,), dtype=config.DTYPE)
        moments = _one_hot_moments(codes, w, cards)
        moments = [jax.lax.psum(m, axis_name) for m in moments]
        return tuple(m[None] for m in moments)

    key = jax.random.PRNGKey(seed)[None]
    moments = run(key)
    out = {}
    for v, m in zip(sampler.variables, moments):
        m = np.asarray(m)[0]
        out[v] = m / m.sum()
    return out


def sharded_gibbs_marginals(
    model, n_chains, n_sweeps, mesh=None, burn_in=0, seed=0, axis_name="chains"
):
    """Pooled posterior marginals from ``n_chains`` Gibbs chains sharded
    over the mesh; moment accumulation reduces with ``psum``."""
    from pgmpy_tpu.sampling.gibbs import GibbsSampling

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    per_dev = -(-int(n_chains) // n_dev)

    gibbs = GibbsSampling(model)
    compiled = gibbs._compiled
    cards = tuple(compiled.cards)
    d = len(cards)

    @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=P())
    def run(key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key[0], idx)
        init_key, run_key = jax.random.split(key)
        init = jnp.stack(
            [
                jax.random.randint(
                    jax.random.fold_in(init_key, j), (per_dev,), 0, cards[j]
                )
                for j in range(d)
            ],
            axis=1,
        ).astype(jnp.int32)
        traj = compiled._run_chains(run_key, n_sweeps, init)  # (T, chains, d)
        traj = traj[burn_in:]
        flat = traj.reshape(-1, d)
        w = jnp.ones((flat.shape[0],), dtype=config.DTYPE)
        moments = _one_hot_moments(flat, w, cards)
        moments = [jax.lax.psum(m, axis_name) for m in moments]
        return tuple(m[None] for m in moments)

    key = jax.random.PRNGKey(seed)[None]
    moments = run(key)
    out = {}
    for v, m in zip(compiled.variables, moments):
        m = np.asarray(m)[0]
        out[v] = m / m.sum()
    return out
