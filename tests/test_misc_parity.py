"""Small parity components not covered elsewhere."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from make_synthetic_data import make_dataset


def test_simple_query_embedding():
    from hsg_tpu.models.position import SimpleQueryEmbedding
    m = SimpleQueryEmbedding(num_queries=5, hidden_dim=8)
    v = m.init(jax.random.PRNGKey(0))
    out = m.apply(v)
    assert out.shape == (5, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_unsup_dataset_zeroes_semantics(tmp_path):
    from hsg_tpu.data.dataset import UnsupListDataset
    root = str(tmp_path)
    make_dataset(root, n_images=2, size=32)
    ds = UnsupListDataset(root, os.path.join(root, 'list.txt'),
                          size=(16, 16), random_crop=True, training=True)
    inputs, labels, idx = ds[0]
    assert labels['semantic_label'].max() == 0       # GT never leaks
    assert labels['instance_label'].max() >= 0       # superpixels kept


def test_mat_colormap_loader(tmp_path):
    from scipy.io import savemat
    from hsg_tpu.utils import vis
    cmap = np.random.default_rng(0).random((10, 3))
    path = str(tmp_path / 'cm.mat')
    savemat(path, {'colormap': cmap})
    loaded = vis.load_color_map(path)
    assert loaded.shape == (256, 3)
    assert loaded.dtype == np.uint8
    np.testing.assert_array_equal(
        loaded[:10], (cmap * 255).astype(np.uint8))


def test_builtin_colormaps():
    from hsg_tpu.utils import vis
    voc = vis.load_color_map('voc')
    cs = vis.load_color_map('cityscapes')
    assert voc.shape == cs.shape == (256, 3)
    np.testing.assert_array_equal(voc[0], [0, 0, 0])       # VOC background
    np.testing.assert_array_equal(cs[0], [128, 64, 128])   # CS road


def test_gaussian_kernel_profile():
    from hsg_tpu.models.local_features import gaussian_kernel
    k = gaussian_kernel(5)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2, 2] == 0  # center of the distance profile is zero
