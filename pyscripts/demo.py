"""One-command end-to-end learning demo on synthetic data.

Reproduces the validation in docs/DESIGN.md: generates a synthetic
dataset, trains stage-1 (img_sim only), optionally fine-tunes stage-2
(full HSG), then runs prototype -> inference -> mIoU. On one TPU v5e the
two stages take ~35 min wall total at the default step counts, most of it
graph compilation (each stage compiles its own train/eval programs; slow
hosts or tunneled runtimes pay several minutes per compile). Pass
--stage2_steps 0 for the ~15-min stage-1-only run.

Usage:
  python pyscripts/demo.py --workdir /tmp/hsg_demo [--steps 3000]
      [--stage2_steps 800] [--images 64]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


BASE_CFG = {
    'network': {'backbone_types': 'fcn_50', 'prediction_types': 'hsg',
                'embedding_dim': 64, 'label_divisor': 256,
                'kmeans_iterations': 3, 'kmeans_num_clusters': [2, 2],
                'max_segments_per_view': 64, 'num_views': 2,
                'use_syncbn': True, 'pretrained': '',
                'compute_dtype': 'bfloat16'},
    'dataset': {'num_classes': 4, 'semantic_ignore_index': 255,
                'color_map_path': 'voc'},
    'train': {'lr_policy': 'poly', 'base_lr': 0.1, 'weight_decay': 1e-4,
              'momentum': 0.9, 'batch_size': 8, 'crop_size': [128, 128],
              'warmup_iteration': 100, 'tensorboard_step': 250,
              'memory_bank_size': 0,
              'img_sim_loss_types': 'segsort', 'img_sim_concentration': 16,
              'img_sim_loss_weight': 1.0,
              'fine_hrchy_loss_types': 'none',
              'coarse_hrchy_loss_types': 'none',
              'dmon_loss_types': 'none',
              'centroid_cont_loss_types': 'none',
              'fine_hrchy_clusters': 4, 'coarse_hrchy_clusters': 2,
              'dmon_knn': 2},
    'test': {'image_size': 128, 'crop_size': [128, 128],
             'stride': [128, 128]},
}


def _run(script, *args):
    cmd = [sys.executable, os.path.join(REPO, 'pyscripts', script), *args]
    print('+', ' '.join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def _eval(tag, workdir, snap, cfg_path):
    data = os.path.join(workdir, 'data')
    res = os.path.join(workdir, f'res_{tag}')
    _run('prototype.py', '--data_dir', data,
         '--data_list', os.path.join(data, 'list.txt'),
         '--snapshot_dir', snap, '--save_dir', res + '/train',
         '--kmeans_num_clusters', '4,4', '--label_divisor', '256',
         '--cfg_path', cfg_path)
    _run('inference.py', '--data_dir', data,
         '--data_list', os.path.join(data, 'list.txt'),
         '--snapshot_dir', snap, '--save_dir', res + '/val',
         '--semantic_memory_dir', res + '/train/semantic_prototype',
         '--kmeans_num_clusters', '4,4', '--label_divisor', '256',
         '--cfg_path', cfg_path)
    print(f'=== {tag} ===', flush=True)
    _run('benchmark.py', '--pred_dir', res + '/val/semantic_gray',
         '--gt_dir', os.path.join(data, 'segcls'),
         '--num_classes', '4', '--string_replace', '')


def main():
    import copy

    import yaml

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--workdir', default='/tmp/hsg_demo')
    parser.add_argument('--steps', type=int, default=3000)
    parser.add_argument('--stage2_steps', type=int, default=800)
    parser.add_argument('--images', type=int, default=64)
    parser.add_argument('--pipeline', default='python',
                        choices=['python', 'tf', 'tf_raw',
                                 'device_resident'],
                        help='train.data_pipeline for both stages '
                             '(device_resident = fully on-device '
                             'augmentation from an HBM-resident dataset)')
    parser.add_argument('--tta', action='store_true',
                        help='multi-scale (0.75/1.0/1.25) + flip TTA at '
                             'inference')
    args = parser.parse_args()
    BASE_CFG['train']['data_pipeline'] = args.pipeline
    BASE_CFG['train']['staging_size'] = 128
    if args.tta:
        BASE_CFG['test']['scales'] = [0.75, 1.0, 1.25]
        BASE_CFG['test']['flip'] = True

    from make_synthetic_data import make_dataset
    data = os.path.join(args.workdir, 'data')
    os.makedirs(args.workdir, exist_ok=True)
    make_dataset(data, n_images=args.images, size=128)

    cfg1 = copy.deepcopy(BASE_CFG)
    cfg1['train'].update(max_iteration=args.steps, snapshot_step=args.steps)
    cfg1_path = os.path.join(args.workdir, 'stage1.yaml')
    yaml.safe_dump(cfg1, open(cfg1_path, 'w'))
    snap1 = os.path.join(args.workdir, 'snap1')
    _run('train.py', '--data_dir', data,
         '--data_list', os.path.join(data, 'list.txt'),
         '--snapshot_dir', snap1, '--cfg_path', cfg1_path)
    _eval('stage1', args.workdir, snap1, cfg1_path)

    if args.stage2_steps:
        cfg2 = copy.deepcopy(BASE_CFG)
        cfg2['network'].update(backbone_types='fcn_50_hsg',
                               kmeans_iterations=5,
                               max_segments_per_view=32, pretrained=snap1)
        cfg2['train'].update(
            max_iteration=args.stage2_steps,
            snapshot_step=args.stage2_steps, base_lr=8e-3, batch_size=6,
            fine_hrchy_loss_types='segsort', fine_hrchy_concentration=16,
            fine_hrchy_loss_weight=0.1,
            coarse_hrchy_loss_types='segsort',
            coarse_hrchy_concentration=16, coarse_hrchy_loss_weight=0.1,
            dmon_loss_types='dmon', dmon_loss_weight=1.0,
            centroid_cont_loss_types='segsort',
            centroid_cont_concentration=16, centroid_cont_loss_weight=1.0)
        cfg2_path = os.path.join(args.workdir, 'stage2.yaml')
        yaml.safe_dump(cfg2, open(cfg2_path, 'w'))
        snap2 = os.path.join(args.workdir, 'snap2')
        _run('train.py', '--data_dir', data,
             '--data_list', os.path.join(data, 'list.txt'),
             '--snapshot_dir', snap2, '--cfg_path', cfg2_path)
        _eval('stage2', args.workdir, snap2, cfg2_path)


if __name__ == '__main__':
    main()
