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


def create_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available devices."""
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
    """Places a host batch dict onto the mesh, sharded on axis 0."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicates a pytree (params/optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
