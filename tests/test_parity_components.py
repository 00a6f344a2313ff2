"""Tests for the dormant-but-public parity components."""

import numpy as np
import jax
import jax.numpy as jnp

from hsg_tpu.models import clusters, model_utils
from hsg_tpu.models.spp import ASPP, PSPP
from hsg_tpu.models.position import position_embedding_sine
from hsg_tpu.models.local_features import LocationColorNetwork


def test_spherical_kmeans_separates_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (20, 4)) + [1, 0, 0, 0]
    b = rng.normal(0, 0.05, (20, 4)) + [0, 1, 0, 0]
    x = jnp.asarray(np.concatenate([a, b])[None], jnp.float32)
    km = clusters.SphericalKMeans(2, iterations=10)
    labels = np.asarray(km(x))[0]
    assert len(set(labels[:20])) == 1
    assert len(set(labels[20:])) == 1
    assert labels[0] != labels[-1]


def test_spectral_clustering_runs():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.05, (10, 4)) + [1, 0, 0, 0]
    b = rng.normal(0, 0.05, (10, 4)) + [0, 0, 1, 0]
    x = jnp.asarray(np.concatenate([a, b])[None], jnp.float32)
    sc = clusters.SpectralClustering(2, concentration=5.0)
    labels = np.asarray(sc(x))[0]
    assert labels.shape == (20,)
    assert labels[0] != labels[-1] or len(set(labels)) == 2


def test_aspp_pspp_shapes():
    x = jnp.zeros((1, 8, 8, 16))
    aspp = ASPP(out_channels=4, dilations=(1, 2))
    v = aspp.init(jax.random.PRNGKey(0), x)
    assert aspp.apply(v, x).shape == (1, 8, 8, 4)
    pspp = PSPP(out_channels=4, bins=(1, 2))
    v = pspp.init(jax.random.PRNGKey(0), x, False)
    assert pspp.apply(v, x, False).shape == (1, 8, 8, 4)


def test_sine_position_embedding():
    mask = jnp.zeros((1, 4, 6), bool)
    pos = position_embedding_sine(mask, num_pos_feats=8)
    assert pos.shape == (1, 4, 6, 16)
    assert np.all(np.isfinite(np.asarray(pos)))


def test_location_color_network_color_branch():
    lfn = LocationColorNetwork(use_color=True, use_location=True,
                               norm_color=True, smooth_ksize=None)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3)),
                    jnp.float32)
    out = lfn(x)
    assert out.shape == (2, 8, 8, 5)  # 2 loc + 3 color
    color = np.asarray(out[..., 2:])
    assert color.max() <= 1.0 + 1e-5 and color.min() >= -1.0 - 1e-5


def test_reorder_image_indices_occurrence_order():
    ids = jnp.asarray([7, 7, 3, 9, 3])
    out = np.asarray(model_utils.reorder_image_indices(ids, 5))
    np.testing.assert_array_equal(out, [0, 0, 1, 2, 1])


def test_multiset_labels_by_nearest_neighbor():
    protos = jnp.asarray(np.eye(4, dtype=np.float32))
    proto_sem = jnp.asarray([0, 1, 2, 21])      # last: invalid class
    proto_batch = jnp.asarray([0, 0, 1, 1])
    emb = jnp.asarray([[1, 0, 0, 0], [0, 0, 1, 0]], jnp.float32)
    emb_batch = jnp.asarray([0, 1])
    out = np.asarray(model_utils.multiset_labels_by_nearest_neighbor(
        emb, protos, proto_sem, emb_batch, proto_batch,
        num_classes=21, top_k=1, threshold=0.9))
    assert out[0, 0] == 1 and out[0, 1:].sum() == 0   # batch0 -> class 0
    assert out[1, 2] == 1                              # batch1 -> class 2
