"""Checkpoint save/restore via orbax.

Capability parity with the reference's snapshot protocol
(pyscripts/train/train.py:347-356: model-{iter}.pth + model-{iter}.state.pth
and the `train.resume` / `begin_iteration` flow, which is bit-rotted in the
reference — train.py:116 calls a nonexistent `.fromat`; fixed here): one
orbax directory per iteration holding params, batch stats, optimizer
momentum, and the step counter.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from hsg_tpu.train.train_step import TrainState


def _path(snapshot_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(snapshot_dir), f'model-{step}')


def save_checkpoint(snapshot_dir: str, state: TrainState) -> str:
    step = int(state.step)
    path = _path(snapshot_dir, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    return path


def restore_checkpoint(snapshot_dir: str, step: int,
                       template: TrainState | None = None) -> TrainState:
    path = _path(snapshot_dir, step)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(
                item=jax.device_get(template._asdict())))
    else:
        restored = ckptr.restore(path)
    return TrainState(**restored)


def restore_variables(snapshot_dir: str, step: int) -> dict:
    """Loads just the model variables ({'params', 'batch_stats'}) for
    inference — the eval scripts' analog of loading `model-{iter}.pth`."""
    state = restore_checkpoint(snapshot_dir, step)
    return {'params': state.params, 'batch_stats': state.batch_stats}


def partial_overlay(variables: dict, prev: dict) -> dict:
    """Shape-checked partial load: copies every leaf of `prev` that exists
    in `variables` with a matching shape, warning about the rest.

    Parity with the reference's tolerant checkpoint loading
    (hsg/models/embeddings/base_model.py:26-52) — this is what lets the
    stage-2 HSG model warm-start from a stage-1 plain-FCN snapshot (the
    transformer heads stay freshly initialized).
    """
    import warnings

    import jax.numpy as jnp
    from flax import traverse_util

    flat_dst = traverse_util.flatten_dict(variables)
    flat_src = traverse_util.flatten_dict(prev)
    loaded = 0
    for path, value in flat_src.items():
        if path not in flat_dst:
            warnings.warn(f'unexpected key {"/".join(map(str, path))} '
                          'in checkpoint')
            continue
        if tuple(flat_dst[path].shape) != tuple(value.shape):
            warnings.warn(f'shape mismatch at {"/".join(map(str, path))}: '
                          f'{flat_dst[path].shape} vs {value.shape}')
            continue
        flat_dst[path] = jnp.asarray(value, flat_dst[path].dtype)
        loaded += 1
    missing = set(flat_dst) - set(flat_src)
    if missing:
        warnings.warn(f'{len(missing)} keys missing from checkpoint '
                      '(left at init)')
    return traverse_util.unflatten_dict(flat_dst)


def latest_step(snapshot_dir: str) -> int | None:
    """Largest saved iteration in a snapshot dir."""
    if not os.path.isdir(snapshot_dir):
        return None
    steps = []
    for name in os.listdir(snapshot_dir):
        if name.startswith('model-'):
            try:
                steps.append(int(name.split('-', 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None
