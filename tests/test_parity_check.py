"""End-to-end exercise of tools/parity_check.py with a synthetic-weights
reference checkpoint.

Builds the ACTUAL reference embedding model (micro depth) so the saved
`.pth` has the real `model-{iter}.pth` structure incl. the
{'embedding_model': ...} wrapper (reference pyscripts/train/train.py:
347-356), then drives the one-command harness over a synthetic dataset:
import -> orbax snapshot -> prototype -> inference -> benchmark -> mIoU.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

# Reference import machinery (easydict stub, sys.path) lives there.
import test_reference_parity  # noqa: F401

from make_synthetic_data import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reference_micro_state_dict():
    import hsg.models.embeddings.resnet_fcn_hsg as ref_hsg
    from hsg.config.default import config as ref_cfg

    ref_cfg.network.embedding_dim = 16
    ref_cfg.network.label_divisor = 256
    ref_cfg.network.kmeans_num_clusters = [2, 2]
    ref_cfg.network.kmeans_iterations = 2
    ref_cfg.dataset.semantic_ignore_index = 255
    ref_cfg.train.fine_hrchy_clusters = 4
    ref_cfg.train.coarse_hrchy_clusters = 2
    torch.manual_seed(5)
    model = ref_hsg.MultiviewResnetFcn(
        [1, 1, 1, 1], [1, 2, 2, 1], [1, 1, 1, 2], ref_cfg)
    return model.state_dict()


@pytest.mark.slow
def test_parity_check_end_to_end(tmp_path):
    sd = _reference_micro_state_dict()
    ckpt = str(tmp_path / 'model-100.pth')
    torch.save({'embedding_model': sd, 'prediction_model': {}}, ckpt)

    data = str(tmp_path / 'data')
    make_dataset(data, n_images=3, size=32)

    env = dict(os.environ, HSG_TPU_PLATFORM='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               PYTHONPATH=REPO + ':' + os.environ.get('PYTHONPATH', ''))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'parity_check.py'),
         '--checkpoint', ckpt,
         '--cfg_path', os.path.join(REPO, 'configs', 'micro_synthetic.yaml'),
         '--data_dir', data,
         '--train_list', os.path.join(data, 'list.txt'),
         '--val_list', os.path.join(data, 'list.txt'),
         '--workdir', str(tmp_path / 'work'),
         '--kmeans_num_clusters', '2,2', '--label_divisor', '256',
         '--num_images', '2'],
        capture_output=True, text=True, env=env, timeout=1200)
    assert proc.returncode == 0, (
        f'parity_check failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}')
    m = re.search(r'\{.*"miou".*\}', proc.stdout)
    assert m, proc.stdout[-1000:]
    result = json.loads(m.group(0))
    assert np.isfinite(result['miou'])
    assert 'imported' in proc.stdout  # the torch import actually happened


@pytest.mark.slow
def test_parity_check_expect_gate(tmp_path):
    """--expect_miou turns the harness into a pass/fail parity gate."""
    sd = _reference_micro_state_dict()
    ckpt = str(tmp_path / 'model-100.pth')
    torch.save({'embedding_model': sd}, ckpt)
    data = str(tmp_path / 'data')
    make_dataset(data, n_images=3, size=32)
    env = dict(os.environ, HSG_TPU_PLATFORM='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               PYTHONPATH=REPO + ':' + os.environ.get('PYTHONPATH', ''))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'parity_check.py'),
         '--checkpoint', ckpt,
         '--cfg_path', os.path.join(REPO, 'configs', 'micro_synthetic.yaml'),
         '--data_dir', data,
         '--train_list', os.path.join(data, 'list.txt'),
         '--val_list', os.path.join(data, 'list.txt'),
         '--workdir', str(tmp_path / 'work'),
         '--kmeans_num_clusters', '2,2', '--label_divisor', '256',
         '--num_images', '2', '--expect_miou', '99.0', '--miou_tol', '0.1'],
        capture_output=True, text=True, env=env, timeout=1200)
    assert proc.returncode != 0
    assert 'PARITY MISS' in (proc.stdout + proc.stderr)
