"""End-to-end smoke test: train -> prototype -> inference -> benchmark.

Drives the actual CLI scripts (subprocess) over a synthetic dataset — the
rebuild's analog of the reference's bash-script integration tests
(SURVEY.md §4).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from make_synthetic_data import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    # Pin to 2 virtual devices: the conftest exports an 8-device XLA_FLAGS
    # which the subprocess would inherit, scaling the global batch 8x.
    env = dict(os.environ, HSG_TPU_PLATFORM='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               PYTHONPATH=REPO + ':' + os.environ.get('PYTHONPATH', ''))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'pyscripts', script), *args],
        capture_output=True, text=True, env=env, timeout=3000)
    assert proc.returncode == 0, (
        f'{script} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}')
    return proc.stdout


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    data = str(tmp_path / 'data')
    snap = str(tmp_path / 'snap')
    res = str(tmp_path / 'res')
    make_dataset(data, n_images=4, size=64)
    cfg = os.path.join(REPO, 'configs', 'tiny_synthetic.yaml')
    lst = os.path.join(data, 'list.txt')

    out = _run('train.py', '--data_dir', data, '--data_list', lst,
               '--snapshot_dir', snap, '--cfg_path', cfg,
               '--max_steps', '2')
    assert 'done: 2 steps' in out
    assert 'nan' not in out

    _run('prototype.py', '--data_dir', data, '--data_list', lst,
         '--snapshot_dir', snap, '--save_dir', res + '/train',
         '--kmeans_num_clusters', '3,3', '--label_divisor', '256',
         '--cfg_path', cfg, '--num_images', '2')
    protos = os.listdir(res + '/train/semantic_prototype')
    assert len(protos) == 2

    _run('inference.py', '--data_dir', data, '--data_list', lst,
         '--snapshot_dir', snap, '--save_dir', res + '/val',
         '--semantic_memory_dir', res + '/train/semantic_prototype',
         '--kmeans_num_clusters', '3,3', '--label_divisor', '256',
         '--cfg_path', cfg, '--num_images', '2')
    preds = os.listdir(res + '/val/semantic_gray')
    assert len(preds) == 2

    out = _run('benchmark.py', '--pred_dir', res + '/val/semantic_gray',
               '--gt_dir', os.path.join(data, 'segcls'),
               '--num_classes', '4', '--string_replace', '')
    assert 'mean IOU' in out or 'mean IoU' in out

    # --skip_existing restarts an interrupted eval job: rerun both eval
    # scripts over all 4 images — the 2 already-written outputs are
    # detected and only the remaining 2 are produced.
    out = _run('prototype.py', '--data_dir', data, '--data_list', lst,
               '--snapshot_dir', snap, '--save_dir', res + '/train',
               '--kmeans_num_clusters', '3,3', '--label_divisor', '256',
               '--cfg_path', cfg, '--skip_existing')
    assert 'skip_existing: 2/4 already done' in out
    assert len(os.listdir(res + '/train/semantic_prototype')) == 4
    out = _run('inference.py', '--data_dir', data, '--data_list', lst,
               '--snapshot_dir', snap, '--save_dir', res + '/val',
               '--semantic_memory_dir', res + '/train/semantic_prototype',
               '--kmeans_num_clusters', '3,3', '--label_divisor', '256',
               '--cfg_path', cfg, '--skip_existing')
    assert 'skip_existing: 2/4 already done' in out
    assert len(os.listdir(res + '/val/semantic_gray')) == 4


@pytest.mark.slow
def test_train_pipeline_variants(tmp_path):
    """The trainer's alternate input pipelines (tf_raw streaming and the
    HBM-resident dataset) run end-to-end through pyscripts/train.py."""
    import yaml
    data = str(tmp_path / 'data')
    make_dataset(data, n_images=4, size=64)
    lst = os.path.join(data, 'list.txt')
    base = yaml.safe_load(
        open(os.path.join(REPO, 'configs', 'tiny_synthetic.yaml')))
    for pipeline, extra in (('tf_raw', {}),
                            ('device_resident', {}),
                            ('device_resident', {'chain_steps': 2})):
        cfg = dict(base)
        cfg['train'] = dict(base['train'], data_pipeline=pipeline,
                            staging_size=64, **extra)
        tag = pipeline + ('_chained' if extra else '')
        cfg_path = str(tmp_path / f'{tag}.yaml')
        yaml.safe_dump(cfg, open(cfg_path, 'w'))
        out = _run('train.py', '--data_dir', data, '--data_list', lst,
                   '--snapshot_dir', str(tmp_path / f'snap_{tag}'),
                   '--cfg_path', cfg_path, '--max_steps', '4')
        assert 'done: 4 steps' in out, tag
        assert 'nan' not in out, tag
        if pipeline == 'device_resident':
            assert 'device-resident dataset: 4 images' in out
