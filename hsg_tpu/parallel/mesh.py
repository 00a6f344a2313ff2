"""Device mesh + sharding helpers (the entire "distributed backend").

This replaces the reference's whole parallel runtime — custom DataParallel
(lib/nn/parallel/data_parallel.py), thread-based SyncBN
(lib/nn/sync_batchnorm/), and the gather-to-anchor prototype sync
(hsg/models/utils.py:127-217). Here there is ONE SPMD program: batches are
sharded over a 1-D `data` mesh, parameters are replicated, and XLA inserts
the ICI collectives (all-gather for the global pixel x prototype matmuls,
all-reduce for BN moments and gradients). Multi-host extends the same
program via jax.distributed.initialize — no code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host entry path: joins a JAX distributed cluster when the
    standard coordination env vars are set, and is a no-op otherwise.

    Reads `JAX_COORDINATOR_ADDRESS` / `JAX_NUM_PROCESSES` /
    `JAX_PROCESS_ID` (set by the launcher on every host; on Cloud TPU
    pods and SLURM, `jax.distributed.initialize()` autodetects and the
    explicit vars are unnecessary — set `HSG_TPU_MULTIHOST=1` to opt in
    there). After this, the SAME train program runs: `jax.devices()`
    spans all hosts, the `data` mesh covers the global device set, and
    each process feeds only its local batch shard
    (`local_batch_slice` + `shard_batch`). Returns True if distributed
    mode is active.
    """
    import os

    addr = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if addr:
        try:
            # Cross-process collectives for the CPU backend (no effect on
            # TPU, where ICI/DCN collectives are native).
            jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        except Exception:
            pass
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
        _warmup_cross_process_sync()
        return True
    if os.environ.get('HSG_TPU_MULTIHOST'):
        jax.distributed.initialize()   # autodetected environment
        _warmup_cross_process_sync()
        return True
    return jax.process_count() > 1


def _warmup_cross_process_sync() -> None:
    """Eagerly create the cross-process barrier/allgather context.

    `multihost_utils.sync_global_devices` (used by orbax on every
    checkpoint save) lazily builds its own collective context on first
    use, and on the CPU/gloo backend that rendezvous has a hard ~30 s
    window ("Gloo context initialization failed: DEADLINE_EXCEEDED:
    GetKeyValue() timed out"). If the first save happens when ranks are
    skewed — e.g. one rank still compiling on a loaded host — the
    window is missed and the save crashes. Running one sync here, right
    after `jax.distributed.initialize` returned on every rank (so all
    ranks are within milliseconds of each other), creates and caches
    that context at the one point where the rendezvous cannot time out.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('hsg_tpu:init')


_BARRIER_SEQ = [0]


def coordination_barrier(name: str, timeout_s: float = 1800.0) -> None:
    """Rejoin all processes via the jax.distributed coordination service.

    Unlike a device collective (psum / sync_global_devices), this rides
    the coordinator's gRPC channel, so (a) it needs no compiled
    executable and (b) its timeout is explicit and generous — it cannot
    blow the short gloo/ICI rendezvous window when ranks are skewed by
    minutes of compile time. Callers must invoke it from ALL processes
    in the same order (barrier ids are sequence-numbered to keep reused
    names unique, which the coordination service requires). No-op in
    single-process runs.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:  # pragma: no cover - initialize() always sets it
        return
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(f'{name}:{_BARRIER_SEQ[0]}',
                           timeout_in_ms=int(timeout_s * 1000))


def local_batch_slice(global_batch_size: int) -> slice:
    """This process's contiguous row range of the global batch.

    The loaders are seeded per-process with the same list order, so each
    process reads disjoint rows (the multi-host replacement for the
    reference's `prepare_datas_and_labels_mgpu` pre-scatter,
    utils/general/others.py:50-73).
    """
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def create_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available devices (all hosts)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=('data',))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Places a host batch dict onto the mesh, sharded on axis 0.

    Single-process: `device_put` splits the full host batch over local
    devices. Multi-host: each process holds only its local rows
    (`local_batch_slice`), assembled into one global array without any
    cross-host copy (`make_array_from_process_local_data`).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicates a pytree (params/optimizer state) across the mesh.

    Multi-host: every process must hold the same host values (same init
    rng / restored checkpoint); they become one replicated global array
    per leaf without cross-host traffic.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
