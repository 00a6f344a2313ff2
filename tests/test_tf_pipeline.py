"""tf.data pipeline matches the Python loader's batch contract."""

import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from make_synthetic_data import make_dataset


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('tfsynth'))
    make_dataset(root, n_images=6, size=64)
    return root


def test_tf_loader_contract(synth):
    from hsg_tpu.data.tf_pipeline import TfDataLoader
    dl = TfDataLoader(synth, os.path.join(synth, 'list.txt'),
                      crop_size=(32, 32), batch_images=2, seed=0)
    for _ in range(3):
        batch = next(dl)
        assert batch['image'].shape == (4, 32, 32, 3)
        assert batch['semantic_label'].shape == (4, 32, 32)
        assert batch['instance_label'].shape == (4, 32, 32)
        assert batch['image'].dtype == np.float32
        # Views consecutive: ids [i, i, j, j].
        ids = batch['image_id']
        assert ids[0] == ids[1] and ids[2] == ids[3]
        # Superpixel labels present; padding (255) allowed.
        assert batch['instance_label'].max() > 0
        # Views differ (independent augmentation).
        assert np.abs(batch['image'][0] - batch['image'][1]).max() > 1e-3
        assert np.isfinite(batch['image']).all()


def test_tf_loader_throughput_smoke(synth):
    """Not a perf assertion — just that the pipeline streams repeatedly
    past one epoch (6 images, batch 4 -> repeat kicks in)."""
    from hsg_tpu.data.tf_pipeline import TfDataLoader
    dl = TfDataLoader(synth, os.path.join(synth, 'list.txt'),
                      crop_size=(32, 32), batch_images=4, seed=1)
    for _ in range(5):
        next(dl)
