"""Golden-value tests for the kernel layer (hsg_tpu.ops).

Expected values are computed with independent numpy loop implementations of
the reference semantics (hsg/utils/segsort/common.py, general/common.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsg_tpu.ops import common, kmeans, segment


def _np_normalize(x, eps=1e-12):
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    norm = np.maximum(norm, eps)
    return x / norm


def test_normalize_embedding_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5)).astype(np.float32)
    x[3] = 0.0  # zero vector stays zero (eps clamp)
    got = np.asarray(common.normalize_embedding(jnp.asarray(x)))
    np.testing.assert_allclose(got, _np_normalize(x), rtol=1e-6)
    assert np.all(got[3] == 0)


def test_segment_sum_and_mean():
    x = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], np.float32)
    idx = np.array([0, 2, 0, 5])  # 5 out of range for S=3
    got = np.asarray(common.segment_sum(jnp.asarray(x), jnp.asarray(idx), 3))
    np.testing.assert_allclose(got, [[6, 8], [0, 0], [3, 4]])
    mean = np.asarray(common.segment_mean(jnp.asarray(x), jnp.asarray(idx), 3))
    np.testing.assert_allclose(mean, [[3, 4], [0, 0], [3, 4]])


def test_segment_sum_weights_mask_out_rows():
    x = np.ones((4, 2), np.float32)
    idx = np.array([0, 0, 1, 1])
    w = np.array([1.0, 0.0, 1.0, 1.0], np.float32)
    got = np.asarray(common.segment_sum(jnp.asarray(x), jnp.asarray(idx), 2,
                                        jnp.asarray(w)))
    np.testing.assert_allclose(got, [[1, 1], [2, 2]])


def test_prototypes_from_labels():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(20, 4)).astype(np.float32)
    labels = rng.integers(0, 5, size=20)
    got = np.asarray(common.calculate_prototypes_from_labels(
        jnp.asarray(emb), jnp.asarray(labels), 6))
    expected = np.zeros((6, 4), np.float32)
    for i in range(20):
        expected[labels[i]] += emb[i]
    expected = _np_normalize(expected)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    # Empty label 5 -> zeros.
    assert np.all(got[5] == 0)


def test_find_nearest_prototypes():
    rng = np.random.default_rng(2)
    emb = _np_normalize(rng.normal(size=(10, 4)).astype(np.float32))
    protos = _np_normalize(rng.normal(size=(3, 4)).astype(np.float32))
    got = np.asarray(common.find_nearest_prototypes(
        jnp.asarray(emb), jnp.asarray(protos)))
    expected = np.argmax(emb @ protos.T, axis=1)
    np.testing.assert_array_equal(got, expected)


def test_initialize_cluster_labels_grid():
    # 4x6 image, 2x3 clusters: y in {0,1}, x in {0,1,2},
    # label = y + 2 * x (reference: y + (max_y + 1) * x).
    got = np.asarray(common.initialize_cluster_labels([2, 3], [4, 6]))
    y = np.round(np.linspace(0, 1, 4)).astype(int)
    x = np.round(np.linspace(0, 2, 6)).astype(int)
    expected = y[:, None] + 2 * x[None, :]
    np.testing.assert_array_equal(got, expected)
    assert got.max() == 5


def test_location_features_match_reference_range():
    loc = np.asarray(common.generate_location_features((3, 5), 'float'))
    assert loc.shape == (3, 5, 2)
    np.testing.assert_allclose(loc[:, 0, 0], [0, 0.5, 1.0])
    np.testing.assert_allclose(loc[0, :, 1], np.linspace(0, 1, 5))


def test_majority_label():
    sem = np.array([1, 1, 2, 2, 2, 0])
    clu = np.array([0, 0, 0, 1, 1, 1])
    agree, majority = common.find_majority_label_index(
        jnp.asarray(sem), jnp.asarray(clu), 2, 3)
    np.testing.assert_array_equal(np.asarray(majority), [1, 2])
    np.testing.assert_array_equal(
        np.asarray(agree), [True, True, False, True, True, False])


def test_resize_labels_nearest():
    labels = jnp.asarray(np.arange(16).reshape(1, 4, 4))
    got = np.asarray(common.resize_labels(labels, (2, 2)))
    np.testing.assert_array_equal(got[0], [[0, 2], [8, 10]])


def test_masked_unique_basic():
    keys = jnp.asarray([5, 3, 5, 9, 3, 7])
    valid = jnp.asarray([True, True, True, True, True, False])
    mu = segment.masked_unique(keys, valid, 4)
    np.testing.assert_array_equal(np.asarray(mu.values)[:3], [3, 5, 9])
    np.testing.assert_array_equal(np.asarray(mu.unique_valid), [1, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(mu.inverse)[:5], [1, 0, 1, 2, 0])
    np.testing.assert_array_equal(
        np.asarray(mu.element_valid), [1, 1, 1, 1, 1, 0])


def test_masked_unique_overflow_drops_largest():
    keys = jnp.asarray([1, 2, 3, 4])
    valid = jnp.ones(4, bool)
    mu = segment.masked_unique(keys, valid, 2)
    np.testing.assert_array_equal(np.asarray(mu.values), [1, 2])
    np.testing.assert_array_equal(np.asarray(mu.element_valid), [1, 1, 0, 0])


def test_partition_segments_intersection():
    # 2 labels x 2 clusters -> up to 4 segments.
    labels = jnp.asarray([0, 0, 1, 1, 1])
    clusters = jnp.asarray([0, 1, 0, 0, 1])
    valid = jnp.ones(5, bool)
    segs = segment.partition_segments(labels, clusters, valid, 2, 8)
    assert int(segs.num_segments) == 4
    # Keys sorted: (0,0)=0, (0,1)=1, (1,0)=2, (1,1)=3.
    np.testing.assert_array_equal(np.asarray(segs.segment_ids), [0, 1, 2, 2, 3])
    np.testing.assert_array_equal(np.asarray(segs.segment_label)[:4], [0, 0, 1, 1])


def _np_kmeans(emb, init, k, iters, valid=None):
    labels = init.copy()
    for _ in range(iters):
        protos = np.zeros((k, emb.shape[1]), np.float32)
        for i in range(emb.shape[0]):
            if valid is None or valid[i]:
                protos[labels[i]] += emb[i]
        protos = _np_normalize(protos)
        labels = np.argmax(emb @ protos.T, axis=1)
    return labels


def test_kmeans_matches_numpy_em():
    rng = np.random.default_rng(3)
    emb = _np_normalize(rng.normal(size=(50, 6)).astype(np.float32))
    init = rng.integers(0, 4, size=50)
    got = np.asarray(kmeans.kmeans_with_initial_labels(
        jnp.asarray(emb), jnp.asarray(init), 4, iterations=5))
    expected = _np_kmeans(emb, init, 4, 5)
    np.testing.assert_array_equal(got, expected)


def test_kmeans_masked_matches_numpy_on_valid():
    rng = np.random.default_rng(4)
    emb = _np_normalize(rng.normal(size=(40, 6)).astype(np.float32))
    init = rng.integers(0, 3, size=40)
    valid = rng.random(40) > 0.3
    got = np.asarray(kmeans.kmeans_with_initial_labels(
        jnp.asarray(emb), jnp.asarray(init), 3, iterations=4,
        valid=jnp.asarray(valid)))
    expected = _np_kmeans(emb, init, 3, 4, valid)
    np.testing.assert_array_equal(got[valid], expected[valid])


def test_segment_by_kmeans_dense_pipeline():
    rng = np.random.default_rng(5)
    b, h, w, c = 2, 8, 8, 4
    emb = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # Panoptic labels: two superpixels, ignore region marked 999.
    labels = np.zeros((b, h, w), np.int32)
    labels[:, :, 4:] = 1
    labels[0, 0, 0] = 999
    out = kmeans.segment_by_kmeans(
        jnp.asarray(emb), jnp.asarray(labels), (2, 2), max_segments=32,
        ignore_index=999, iterations=3)
    assert out.embedding.shape == (b, h * w, c)
    assert out.segment_id.shape == (b, h * w)
    assert out.segment_valid.shape == (b, 32)
    pv = np.asarray(out.pixel_valid)
    assert not pv[0, 0]  # ignore pixel invalid
    assert pv.sum() == b * h * w - 1
    # Pixels with different labels never share a segment.
    sid = np.asarray(out.segment_id)
    seg_lab = np.asarray(out.segment_label)
    lab_flat = labels.reshape(b, -1)
    for bi in range(b):
        for pi in range(h * w):
            if pv[bi, pi]:
                assert seg_lab[bi, sid[bi, pi]] == lab_flat[bi, pi]
    # Embeddings are unit-norm.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.embedding), axis=-1), 1.0, atol=1e-5)


def test_segment_by_kmeans_jits():
    fn = jax.jit(lambda e, l: kmeans.segment_by_kmeans(
        e, l, (2, 2), max_segments=16, ignore_index=255, iterations=2))
    e = jnp.zeros((1, 4, 4, 3))
    l = jnp.zeros((1, 4, 4), jnp.int32)
    out = fn(e, l)
    assert out.segment_id.shape == (1, 16)
