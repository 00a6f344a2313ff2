"""One-command real-weights mIoU parity harness.

The day the published reference checkpoints (`model-{iter}.pth`,
/root/reference/README.md:117-123 — 42.2 VOC val mIoU) are available,
this single command reproduces the eval-protocol number on TPU:

  python tools/parity_check.py \
      --checkpoint /path/to/model-100000.pth \
      --cfg_path configs/coco_stage2.yaml \
      --data_dir /path/to/VOC \
      --train_list datasets/voc12/train_rf.txt \
      --val_list datasets/voc12/val.txt \
      --workdir /tmp/parity \
      --kmeans_num_clusters 6,6 --label_divisor 2048 \
      [--expect_miou 42.2] [--num_images 100]

Steps (the reference's full eval protocol, bashscripts/voc12/*.sh):
  1. torch.load the checkpoint ({'embedding_model': sd} wrapper or raw sd,
     pyscripts/train/train.py:347-356);
  2. import through models/import_torch.torch_hsg_to_flax (certified by
     tests/test_full_checkpoint_import.py and tests/test_reference_parity.py);
  3. write an orbax snapshot the standard eval scripts understand;
  4. run pyscripts/prototype.py (memory banks over the train list),
     pyscripts/inference.py (retrieval segmentation over the val list),
     pyscripts/benchmark.py (mIoU);
  5. print a JSON result line; non-zero exit if --expect_miou misses.

Exercised end-to-end (synthetic-weights .pth, synthetic dataset) by
tests/test_parity_check.py.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_torch_checkpoint(path):
    import torch
    blob = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(blob, dict) and 'embedding_model' in blob:
        blob = blob['embedding_model']
    # Strip a DataParallel 'module.' prefix if present.
    return {re.sub(r'^module\.', '', k): v for k, v in blob.items()}


def write_snapshot(state_dict, workdir, config, step=0):
    """Imports the torch weights and writes an orbax snapshot +
    config.yaml so the stock eval scripts run unmodified."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from hsg_tpu.models import import_torch
    from hsg_tpu.train import checkpoint as ckpt_lib
    from hsg_tpu.train.train_step import TrainState

    params, stats = import_torch.torch_hsg_to_flax(state_dict)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), params)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), stats)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert n_leaves > 0, 'checkpoint import produced no parameters'
    state = TrainState(step=jnp.int32(step), params=params,
                       batch_stats=stats, opt_state={'imported': jnp.int32(0)})
    snap_dir = os.path.join(workdir, 'snapshot')
    os.makedirs(snap_dir, exist_ok=True)
    path = ckpt_lib.save_checkpoint(snap_dir, state)
    with open(os.path.join(snap_dir, 'config.yaml'), 'w') as f:
        yaml.safe_dump(json.loads(json.dumps(config)), f)
    print(f'imported {n_leaves} param tensors -> {path}')
    return snap_dir


def run_script(script, *args):
    cmd = [sys.executable, os.path.join(REPO, 'pyscripts', script), *args]
    print('+', ' '.join(cmd), flush=True)
    proc = subprocess.run(cmd, text=True, capture_output=True)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f'{script} failed ({proc.returncode})')
    return proc.stdout


def main():
    ap = argparse.ArgumentParser(
        description='Reference-checkpoint mIoU parity check.')
    ap.add_argument('--checkpoint', required=True)
    ap.add_argument('--cfg_path', required=True)
    ap.add_argument('--data_dir', required=True)
    ap.add_argument('--train_list', required=True)
    ap.add_argument('--val_list', required=True)
    ap.add_argument('--workdir', required=True)
    ap.add_argument('--kmeans_num_clusters', default=None)
    ap.add_argument('--label_divisor', type=int, default=None)
    ap.add_argument('--num_images', type=int, default=None,
                    help='cap eval images (quick checks)')
    ap.add_argument('--expect_miou', type=float, default=None)
    ap.add_argument('--miou_tol', type=float, default=0.5)
    args = ap.parse_args()

    from hsg_tpu.config import load_config
    config = load_config(args.cfg_path)

    state_dict = load_torch_checkpoint(args.checkpoint)
    snap_dir = write_snapshot(state_dict, args.workdir, config)
    cfg_path = os.path.join(snap_dir, 'config.yaml')

    common = []
    if args.kmeans_num_clusters:
        common += ['--kmeans_num_clusters', args.kmeans_num_clusters]
    if args.label_divisor:
        common += ['--label_divisor', str(args.label_divisor)]
    cap = (['--num_images', str(args.num_images)]
           if args.num_images else [])

    res = os.path.join(args.workdir, 'results')
    run_script('prototype.py', '--data_dir', args.data_dir,
               '--data_list', args.train_list, '--snapshot_dir', snap_dir,
               '--save_dir', res + '/train', '--cfg_path', cfg_path,
               *common, *cap)
    run_script('inference.py', '--data_dir', args.data_dir,
               '--data_list', args.val_list, '--snapshot_dir', snap_dir,
               '--save_dir', res + '/val',
               '--semantic_memory_dir', res + '/train/semantic_prototype',
               '--cfg_path', cfg_path, *common, *cap)
    out = run_script('benchmark.py', '--pred_dir', res + '/val/semantic_gray',
                     '--gt_dir', os.path.join(args.data_dir, 'segcls'),
                     '--num_classes', str(config.dataset.num_classes),
                     '--string_replace', '')

    m = re.search(r'mean I[oO]U.*?([0-9.]+)', out)
    assert m, f'could not parse mIoU from benchmark output:\n{out[-1000:]}'
    miou = float(m.group(1))
    result = {'miou': miou, 'checkpoint': args.checkpoint,
              'expect': args.expect_miou}
    print(json.dumps(result))
    if args.expect_miou is not None:
        if abs(miou - args.expect_miou) > args.miou_tol:
            raise SystemExit(
                f'PARITY MISS: got {miou} vs expected {args.expect_miou} '
                f'(tol {args.miou_tol})')
        print('PARITY OK')


if __name__ == '__main__':
    main()
