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
from typing import Any

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
