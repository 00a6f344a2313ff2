"""Worker for the 2-process CPU-mesh multi-host test.

Runs ONE full HSG training step over an 8-device global mesh, either as
a single process (8 local devices) or as one rank of a 2-process cluster
(4 local devices each, gloo collectives). The model/batch construction
mirrors `__graft_entry__.dryrun_multichip` so the single-process loss is
the known dryrun value; equality across modes proves SURVEY.md §2.5's
claim that multi-host "falls out" of the same SPMD program.

Usage: python multihost_worker.py RANK NPROCS PORT
  RANK = -1 with NPROCS = 1 runs the single-process baseline.
"""

import os
import sys

rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8 // nprocs)
if nprocs > 1:
    os.environ['JAX_COORDINATOR_ADDRESS'] = f'localhost:{port}'
    os.environ['JAX_NUM_PROCESSES'] = str(nprocs)
    os.environ['JAX_PROCESS_ID'] = str(rank)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hsg_tpu.parallel import mesh as mesh_lib

assert mesh_lib.maybe_initialize_distributed() == (nprocs > 1)

from __graft_entry__ import _flagship_config
from hsg_tpu.models import hsg as hsg_lib
from hsg_tpu.models import predictions as pred_lib
from hsg_tpu.train import optimizer as opt_lib
from hsg_tpu.train import train_step as ts_lib


def main():
    n_devices = 8
    cfg = _flagship_config(tiny=True)
    model = hsg_lib.MultiviewResnetFcn(
        backbone_depth=(1, 1, 1, 1),
        embedding_dim=cfg.network.embedding_dim,
        kmeans_num_clusters=(2, 2), kmeans_iterations=2,
        max_segments=cfg.network.max_segments_per_view,
        label_divisor=cfg.network.label_divisor, num_views=2,
        fine_hrchy_clusters=cfg.train.fine_hrchy_clusters,
        coarse_hrchy_clusters=cfg.train.coarse_hrchy_clusters)
    prediction = pred_lib.hsg(cfg)

    # Same global batch on every process (same seed as dryrun_multichip).
    b, hw = 2 * n_devices, 32
    rng = np.random.default_rng(0)
    global_batch = {
        'image': rng.normal(size=(b, hw, hw, 3)).astype(np.float32),
        'semantic_label': np.zeros((b, hw, hw), np.int32),
        'instance_label': rng.integers(0, 8, (b, hw, hw)).astype(np.int32),
        'image_index': (np.arange(b) // 2).astype(np.int32),
    }
    rows = mesh_lib.local_batch_slice(b)
    local_batch = {k: v[rows] for k, v in global_batch.items()}

    init_batch = {k: jnp.asarray(v[:2]) for k, v in global_batch.items()}
    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), init_batch,
        momentum=cfg.train.momentum, weight_decay=cfg.train.weight_decay)
    schedule = opt_lib.schedule_from_config(cfg)
    step_fn = jax.jit(
        ts_lib.make_train_step(model, prediction, schedule, update_fn))

    mesh = mesh_lib.create_mesh(n_devices)
    sharded_batch = mesh_lib.shard_batch(local_batch, mesh)
    sharded_state = mesh_lib.replicate(state, mesh)
    new_state, metrics = step_fn(sharded_state, sharded_batch,
                                 jax.random.PRNGKey(1))
    loss = float(metrics['loss'])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1
    print(f'MULTIHOST_LOSS {jax.process_index()} {loss:.6f}', flush=True)


main()
