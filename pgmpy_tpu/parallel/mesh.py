"""Device-mesh parallelism for samplers: chains/samples sharded over ICI.

The reference has NO distributed layer (single-process joblib only,
``SURVEY.md`` §2.8).  This module is the TPU-native replacement: a 1-D
``chains`` mesh over which sampling kernels run under ``shard_map``, with
``psum`` collectives reducing sufficient statistics (weighted one-hot
moment sums) across devices.  Multi-host pods extend the same mesh over
DCN — :mod:`pgmpy_tpu.parallel.distributed` owns the
``jax.distributed.initialize`` wrapper and the pod-spanning mesh
constructors; the kernel code here is unchanged under either mesh.
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


def sharded_nuts_moments(
    model, n_chains, num_samples, num_adapt=100, stepsize=0.1, mesh=None,
    max_depth=5, seed=0, axis_name="chains",
):
    """Posterior mean/std from NUTS chains sharded over the mesh.

    Each device runs ``n_chains / n_devices`` compiled NUTS chains; the
    dual-averaging stepsize adapts on the psum-averaged GLOBAL acceptance,
    and the first/second moment sums reduce with psum — the multi-chip
    analogue of running one big vmap.
    """
    from pgmpy_tpu.sampling.nuts_jax import VectorizedNUTS

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    per_dev = -(-int(n_chains) // n_dev)

    nuts = VectorizedNUTS(model, max_depth=max_depth)
    variables, mean0, _ = model.joint_gaussian()
    dim = len(variables)
    init = jnp.tile(jnp.asarray(mean0), (per_dev, 1))

    @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=P())
    def run(key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key[0], idx)
        # re-implement the scan here so moments reduce inside the program
        samples = _nuts_chains_local(nuts, key, init, num_samples, num_adapt,
                                     stepsize, axis_name)
        flat = samples.reshape(-1, dim)
        s1 = jax.lax.psum(jnp.sum(flat, axis=0), axis_name)
        s2 = jax.lax.psum(jnp.sum(flat**2, axis=0), axis_name)
        n = jax.lax.psum(jnp.asarray(flat.shape[0], dtype=config.DTYPE), axis_name)
        return s1[None], s2[None], n[None, None]

    key = jax.random.PRNGKey(seed)[None]
    s1, s2, n = run(key)
    s1, s2, n = np.asarray(s1)[0], np.asarray(s2)[0], float(np.asarray(n)[0, 0])
    mean = s1 / n
    std = np.sqrt(np.maximum(s2 / n - mean**2, 0.0))
    return dict(zip(variables, zip(mean, std)))


def _nuts_chains_local(nuts, key, init, num_samples, num_adapt, stepsize, axis_name):
    """Per-device NUTS scan with globally-pmean'd stepsize adaptation."""
    mu = jnp.log(10.0 * stepsize)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    num_adapt = int(num_adapt)

    def one_step(carry, inputs):
        positions, log_eps, log_eps_bar, h_bar = carry
        key_t, m = inputs
        eps = jnp.exp(log_eps)
        chain_keys = jax.random.split(key_t, positions.shape[0])
        positions, accept_stats = jax.vmap(
            lambda k, q: nuts._nuts_step(k, q, eps, axis_name=axis_name)
        )(chain_keys, positions)
        mean_accept = jax.lax.pmean(jnp.mean(accept_stats), axis_name)
        adapting = m < num_adapt
        m_adapt = jnp.minimum(m, num_adapt - 1).astype(jnp.float32) + 1.0
        h_bar_new = (1 - 1 / (m_adapt + t0)) * h_bar + (nuts.delta - mean_accept) / (
            m_adapt + t0
        )
        log_eps_new = mu - jnp.sqrt(m_adapt) / gamma * h_bar_new
        eta = m_adapt**-kappa
        log_eps_bar_new = eta * log_eps_new + (1 - eta) * log_eps_bar
        log_eps = jnp.where(adapting, log_eps_new, log_eps_bar)
        log_eps_bar = jnp.where(adapting, log_eps_bar_new, log_eps_bar)
        h_bar = jnp.where(adapting, h_bar_new, h_bar)
        return (positions, log_eps, log_eps_bar, h_bar), positions

    total = num_adapt + int(num_samples)
    keys = jax.random.split(key, total)
    ms = jnp.arange(total)
    # under shard_map the carry must be marked as device-varying up front
    # (positions/stepsize depend on the per-device PRNG fold-in)
    carry = jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, axis_name, to="varying"),
        (init, jnp.log(stepsize), jnp.log(stepsize), jnp.asarray(0.0)),
    )
    _, trajectory = jax.lax.scan(one_step, carry, (keys, ms))
    return trajectory[num_adapt:]


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


def sharded_query_batch(
    model, variables, evidence, mesh=None, axis_name="chains"
):
    """Batched exact posteriors with the ROW axis sharded over the mesh.

    The multi-chip face of the headline inference path: the (replicated)
    CPT arrays stay on every device, the evidence-code rows split across
    the mesh, and each device runs the fused batched contraction
    (``VariableElimination.batch_query_program``) on its shard — pure data
    parallelism over ICI, no collectives needed until the caller reduces.

    Returns (values[n, *query cards] as numpy, state_names) — identical to
    ``VariableElimination.query_batch`` for any device count.
    """
    from pgmpy_tpu.inference.ve import VariableElimination

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size

    infer = VariableElimination(model)
    ev_vars = sorted(evidence.keys(), key=str)
    run, state_names, code_maps = infer.batch_query_program(
        list(variables), ev_vars
    )

    n = len(next(iter(evidence.values())))
    codes = np.empty((n, len(ev_vars)), dtype=np.int32)
    for k, var in enumerate(ev_vars):
        mapping = code_maps[k]
        codes[:, k] = [
            mapping[s] if s in mapping else int(s) for s in evidence[var]
        ]
    # pad rows to a multiple of the device count (replicating row 0 keeps
    # every shard's program identical; padding is sliced off after)
    n_pad = (-n) % n_dev
    if n_pad:
        codes = np.concatenate([codes, np.tile(codes[:1], (n_pad, 1))], axis=0)

    sharded = shard_map(
        run, mesh=mesh, in_specs=(P(axis_name, None),), out_specs=P(axis_name)
    )
    values = np.asarray(sharded(jnp.asarray(codes)))[:n]
    return values, state_names
