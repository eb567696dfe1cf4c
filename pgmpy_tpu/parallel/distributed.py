"""Multi-host execution entry point: process group init + pod-spanning mesh.

The reference has no distributed layer at all (single-process joblib,
``SURVEY.md`` §2.8); this module is the TPU-native component SURVEY
prescribes in its place.  A pod run is:

    from pgmpy_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address="10.0.0.1:8476",
                    num_processes=4, process_id=int(os.environ["RANK"]))
    mesh = dist.global_mesh()            # chains axis over ICI then DCN
    key = dist.host_fold_key(jax.random.PRNGKey(0))   # per-host streams
    sharded_gibbs_marginals(model, n_chains=65536, mesh=mesh, ...)

Every sampler/inference kernel in :mod:`pgmpy_tpu.parallel.mesh` takes the
mesh as an argument and is written against ``jax.lax`` collectives, so the
same code runs unchanged on one chip, one host, or a DCN-connected pod —
only the mesh construction here knows about processes.

Single-process calls degrade gracefully: ``initialize()`` with no
coordinator (or ``num_processes=1``) is a recorded no-op, so library code
can call it unconditionally.

Examples
--------
>>> import jax
>>> from pgmpy_tpu.parallel import distributed as dist
>>> dist.initialize()  # no coordinator: single-process mode
(0, 1)
>>> dist.is_initialized()
True
>>> mesh = dist.global_mesh()
>>> mesh.axis_names
('chains',)
>>> int(mesh.devices.size) == len(jax.devices())
True
>>> key = dist.host_fold_key(jax.random.PRNGKey(0), process_index=2)
>>> bool((key == jax.random.PRNGKey(0)).all())
False
"""

import numpy as np

import jax
from jax.sharding import Mesh

from pgmpy_tpu.config import logger

# module-level state: initialize() is idempotent and records what it did so
# is_initialized()/process metadata work in the degenerate case too
_STATE = {"initialized": False, "distributed": False}


def is_initialized():
    """True once :func:`initialize` has run (in either mode)."""
    return _STATE["initialized"]


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Join (or create) the multi-host process group.

    Thin, idempotent wrapper over ``jax.distributed.initialize``:

    - With a ``coordinator_address`` and ``num_processes > 1``, every
      process must call this before any jax computation; afterwards
      ``jax.devices()`` spans the whole pod and :func:`global_mesh`
      builds a process-spanning mesh (chains axis rides ICI within a
      host slice and DCN across hosts).
    - With no coordinator / ``num_processes in (None, 1)`` this records
      single-process mode and touches nothing — the degenerate path, so
      scripts are portable between one chip and a pod.

    Returns the (process_index, process_count) pair in effect.
    """
    if _STATE["initialized"]:
        return jax.process_index(), jax.process_count()

    single = coordinator_address is None and (num_processes or 1) <= 1
    if not single:
        if coordinator_address is None:
            raise ValueError(
                "coordinator_address is required when num_processes > 1"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _STATE["distributed"] = True
    _STATE["initialized"] = True
    logger.info(
        "pgmpy_tpu.distributed: process %d/%d, %d global device(s)",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )
    return jax.process_index(), jax.process_count()


def shutdown():
    """Leave the process group (no-op in single-process mode)."""
    if _STATE["distributed"]:
        jax.distributed.shutdown()
    _STATE["initialized"] = False
    _STATE["distributed"] = False


def device_grid(devices=None):
    """Global devices as an (n_processes, devices_per_process) grid,
    ordered so consecutive devices within a row share a host (ICI) and
    rows span hosts (DCN).

    Raises on ragged per-process device counts: silently truncating to
    the minimum would drop devices from the mesh while callers believe
    it spans the whole pod."""
    if devices is None:
        devices = jax.devices()
    by_proc = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    counts = {p: len(v) for p, v in by_proc.items()}
    if len(set(counts.values())) > 1:
        raise ValueError(
            "Per-process device counts differ "
            f"({counts}); a rectangular pod mesh needs every process to "
            "expose the same number of devices — restrict with "
            "local_device_ids or pass an explicit `devices` list."
        )
    rows = [sorted(by_proc[proc], key=lambda d: d.id) for proc in sorted(by_proc)]
    return np.asarray(rows, dtype=object)


def global_mesh(axis_name="chains", devices=None):
    """1-D mesh over ALL devices in the pod, ordered host-major.

    Host-major order puts each process's devices contiguously on the
    axis, so collectives over ``axis_name`` decompose into fast ICI
    segments plus one DCN stage — the layout the scaling recipe
    prescribes for a bandwidth-light chains/particles axis.  In
    single-process mode this is exactly ``get_mesh()``.
    """
    grid = device_grid(devices)
    return Mesh(grid.reshape(-1), (axis_name,))


def host_chain_mesh(host_axis="hosts", chain_axis="chains", devices=None):
    """2-D (hosts, chains) mesh: shard chains within a host over ICI and
    keep the cross-host (DCN) axis available for coarse reductions —
    e.g. psum of moment sums once per sweep, never per message."""
    grid = device_grid(devices)
    return Mesh(grid, (host_axis, chain_axis))


def host_fold_key(key, process_index=None):
    """Per-host PRNG stream: fold the process index into ``key``.

    Sampler kernels additionally fold in the device's mesh axis index
    (see ``parallel/mesh.py``), so chains never collide across the pod:
    stream = fold(fold(seed, process), device).
    """
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)
