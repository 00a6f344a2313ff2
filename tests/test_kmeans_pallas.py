"""Pallas fused k-means EM vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hsg_tpu.ops import kmeans, common
from hsg_tpu.ops.pallas import kmeans_kernel


def _setup(n=700, k=9, c=12, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, c)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    init = rng.integers(0, k, n)
    valid = rng.random(n) > 0.2
    return jnp.asarray(emb), jnp.asarray(init), jnp.asarray(valid)


def test_pooled_sums_match_xla():
    emb, init, valid = _setup()
    got = np.asarray(kmeans_kernel.pooled_prototype_sums(
        emb, init, 9, valid.astype(jnp.float32)))
    expected = np.asarray(common.segment_sum(
        emb, init, 9, valid.astype(jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_assign_matches_xla():
    emb, init, valid = _setup(seed=1)
    protos = common.calculate_prototypes_from_labels(
        emb, init, 9, valid.astype(jnp.float32))
    got = np.asarray(kmeans_kernel.assign_nearest(emb, protos))
    expected = np.asarray(common.find_nearest_prototypes(emb, protos))
    np.testing.assert_array_equal(got, expected)


def test_full_em_matches_xla():
    emb, init, valid = _setup(seed=2)
    fused = np.asarray(kmeans_kernel.kmeans_with_initial_labels_pallas(
        emb, init, 9, iterations=4, valid=valid))
    ref = np.asarray(kmeans.kmeans_with_initial_labels(
        emb, init, 9, iterations=4, valid=valid))
    vm = np.asarray(valid)
    np.testing.assert_array_equal(fused[vm], ref[vm])
