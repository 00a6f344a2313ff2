"""Data pipeline tests: transforms, datasets, loader."""

import os

import numpy as np
import pytest

from hsg_tpu.data import transforms, dataset, loader
from make_synthetic_data import make_dataset


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synth'))
    make_dataset(root, n_images=6, size=64)
    return root


def test_resize_with_pad_and_crop():
    img = np.ones((10, 12, 3), np.float32)
    out = transforms.resize_with_pad(img, (16, 16), pad_value=0.5)
    assert out.shape == (16, 16, 3)
    assert out[0, 0, 0] == 1.0 and out[-1, -1, 0] == 0.5
    rng = np.random.default_rng(0)
    lab = np.zeros((10, 12, 2), np.int32)
    ci, cl = transforms.random_crop_with_pad(
        img, lab, (8, 8), 0.0, 255, rng)
    assert ci.shape == (8, 8, 3) and cl.shape == (8, 8, 2)


def test_resize_with_interpolation_larger_side():
    img = np.zeros((100, 50, 3), np.float32)
    out = transforms.resize_with_interpolation(img, 200)
    assert max(out.shape[:2]) == 200
    assert out.shape[:2] == (200, 100)


def test_mirror_involution():
    rng = np.random.default_rng(1)
    img = rng.random((6, 8, 3)).astype(np.float32)
    lab = rng.integers(0, 5, (6, 8, 2))
    mi, ml = transforms.mirror(img, lab)
    mi2, ml2 = transforms.mirror(mi, ml)
    np.testing.assert_array_equal(mi2, img)
    np.testing.assert_array_equal(ml2, lab)


def test_color_jitter_and_grayscale_bounds():
    rng = np.random.default_rng(2)
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = transforms.color_jitter(img, rng)
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1
    gray = transforms.random_grayscale(img, np.random.default_rng(3), p=1.0)
    np.testing.assert_allclose(gray[..., 0], gray[..., 1])


def test_image_pyramid():
    img = np.zeros((8, 8, 3), np.float32)
    sem = np.zeros((8, 8), np.int32)
    inst = np.zeros((8, 8), np.int32)
    pyr = transforms.create_image_pyramid(img, sem, inst, [0.5, 1.0])
    assert len(pyr) == 4  # 2 scales x flip/no-flip
    assert pyr[0][0].shape[:2] == (4, 4)
    assert pyr[0][3]['is_flip'] is True


def test_list_dataset_reads_triplets(synth):
    ds = dataset.ListDataset(synth, os.path.join(synth, 'list.txt'))
    assert len(ds) == 6
    inputs, labels, idx = ds[0]
    assert inputs['image'].shape == (64, 64, 3)
    assert labels['semantic_label'].shape == (64, 64)
    assert labels['instance_label'].max() > 0  # superpixels present


def test_selfsup_dataset_two_views(synth):
    ds = dataset.SelfsupListDataset(
        synth, os.path.join(synth, 'list.txt'),
        size=(32, 32), random_crop=True, random_scale=True,
        random_mirror=True, training=True)
    inputs, labels, idx = ds[1]
    assert inputs['image'].shape == (2, 32, 32, 3)
    assert labels['semantic_label'].shape == (2, 32, 32)
    # Unsup: semantic labels zeroed.
    assert labels['semantic_label'].max() == 0
    np.testing.assert_array_equal(labels['image_id'], [1, 1])
    # Views differ (independent augmentation).
    assert np.abs(inputs['image'][0] - inputs['image'][1]).max() > 1e-3


def test_selfsup_collate_flattens_views(synth):
    ds = dataset.SelfsupListDataset(
        synth, os.path.join(synth, 'list.txt'),
        size=(32, 32), random_crop=True, training=True)
    batch = ds.collate([ds[0], ds[1]])
    assert batch['image'].shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(batch['image_id'], [0, 0, 1, 1])


def test_prefetch_loader_iterates(synth):
    ds = dataset.SelfsupListDataset(
        synth, os.path.join(synth, 'list.txt'),
        size=(32, 32), random_crop=True, training=True)
    dl = loader.PrefetchLoader(ds, batch_size=2, num_workers=2, seed=0)
    seen = 0
    for batch in dl:
        assert batch['image'].shape == (4, 32, 32, 3)
        seen += 1
        if seen >= 5:  # crosses an epoch boundary (6 imgs / bs 2 = 3)
            break
    dl.close()


def test_prefetch_loader_rejects_undersized_dataset(synth):
    """A dataset smaller than one (global) batch must raise loudly
    instead of deadlocking the worker/consumer queues."""
    ds = dataset.SelfsupListDataset(
        synth, os.path.join(synth, 'list.txt'),
        size=(32, 32), random_crop=True, training=True)
    with pytest.raises(ValueError, match='not enough data'):
        loader.PrefetchLoader(ds, batch_size=len(ds) + 1,
                              num_workers=1, seed=0)


def test_vendored_dataset_lists_resolve_and_parse():
    """The recipes' default list files must exist in-repo and parse as
    `image gt superpixel` triplets with the reference's split sizes
    (datasets/voc12, datasets/cityscapes)."""
    from hsg_tpu.data.dataset import read_list_file
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = {
        'datasets/voc12/train+_rf.txt': 10582,
        'datasets/voc12/val.txt': 1449,
        'datasets/cityscapes/train_pmi.txt': 2975,
        'datasets/cityscapes/val.txt': 500,
    }
    for rel, n in expected.items():
        path = os.path.join(repo, rel)
        assert os.path.exists(path), rel
        images, sems, insts = read_list_file('/data', path)
        assert len(images) == n, rel
        assert len(sems) == n and len(insts) == n, rel
        assert images[0].startswith('/data/')
