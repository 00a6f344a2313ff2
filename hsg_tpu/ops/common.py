"""Generic tensor utilities (framework-agnostic math layer).

Capability parity with the reference `hsg/utils/general/common.py`
(resize_labels, pca, one_hot, normalize_embedding, segment_mean), but
re-designed for TPU: every op is shape-static, mask-based, and jittable.
Segment reductions are expressed as one-hot matmuls so they land on the MXU
instead of serialized scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_embedding(embeddings: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalizes embeddings along the last dimension.

    Mirrors reference `normalize_embedding` (general/common.py:101): norms
    below `eps` are clamped to `eps` (zero vectors stay zero). Implemented
    as sqrt(max(sum(x^2), eps^2)) == max(||x||, eps) so the gradient at the
    zero vector is 0 instead of NaN — empty (padded) prototype slots are
    exactly zero and would otherwise poison backprop.
    """
    sq = jnp.sum(embeddings * embeddings, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return embeddings / norm


def one_hot(labels: jnp.ndarray, max_label: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot encoding with a static number of classes.

    Out-of-range labels (negative or >= max_label) produce all-zero rows,
    which makes masked scatter-style reductions safe.
    """
    return jax.nn.one_hot(labels, max_label, dtype=dtype)


def segment_sum(x: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sums rows of `x` by segment id via a one-hot matmul (MXU-friendly).

    Args:
      x: `[N, C]` float array.
      index: `[N]` integer segment ids; out-of-range ids contribute nothing.
      num_segments: static segment count S.
      weights: optional `[N]` float weights (e.g. validity mask).

    Returns:
      `[S, C]` per-segment sums.
    """
    oh = one_hot(index, num_segments, dtype=x.dtype)  # [N, S]
    if weights is not None:
        oh = oh * weights[:, None].astype(x.dtype)
    # Accumulate in >= f32 (bf16 inputs accumulate f32 on the MXU; f64
    # parity/gate runs must NOT round through f32).
    return jax.lax.dot_general(
        oh, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.promote_types(jnp.float32, x.dtype))


def segment_mean(x: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-segment mean; empty segments yield zeros.

    Parity with reference `segment_mean` (general/common.py:123), which
    divides by max(count, 1).
    """
    sums = segment_sum(x, index, num_segments, weights)
    ones = jnp.ones((x.shape[0],), dtype=x.dtype)
    counts = segment_sum(ones[:, None], index, num_segments, weights)[:, 0]
    counts = jnp.maximum(counts, 1.0)
    return sums / counts[:, None]


def calculate_prototypes_from_labels(embeddings: jnp.ndarray,
                                     labels: jnp.ndarray,
                                     max_label: int,
                                     weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Scatter-add embeddings by label then L2-normalize (k-means M-step).

    Parity with reference `calculate_prototypes_from_labels`
    (segsort/common.py:11-41), expressed as a one-hot matmul with a static
    `max_label` and an optional validity weighting (replaces the reference's
    physical dropping of ignore pixels).

    Returns `[max_label, C]` unit-norm prototypes (empty labels -> zeros).
    """
    embeddings = embeddings.reshape(-1, embeddings.shape[-1])
    labels = labels.reshape(-1)
    protos = segment_sum(embeddings, labels, max_label, weights)
    return normalize_embedding(protos)


def find_nearest_prototypes(embeddings: jnp.ndarray,
                            prototypes: jnp.ndarray) -> jnp.ndarray:
    """Cosine argmax assignment (k-means E-step).

    Parity with reference `find_nearest_prototypes` (segsort/common.py:44).
    Zero (empty) prototypes keep similarity 0, matching the reference where
    empty clusters normalize to the zero vector.
    """
    embeddings = embeddings.reshape(-1, prototypes.shape[-1])
    sims = jax.lax.dot_general(
        embeddings, prototypes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.promote_types(jnp.float32,
                                                 embeddings.dtype))
    return jnp.argmax(sims, axis=1)


def find_majority_label_index(semantic_labels: jnp.ndarray,
                              cluster_labels: jnp.ndarray,
                              num_clusters: int,
                              num_classes: int,
                              valid: jnp.ndarray | None = None):
    """Majority semantic label per cluster + per-pixel agreement mask.

    Parity with reference `find_majority_label_index`
    (segsort/common.py:221-267): accumulates one-hot semantic labels per
    cluster and takes the argmax; returns a boolean mask of pixels that agree
    with their cluster's majority label (the reference returns their indices).
    """
    semantic_labels = semantic_labels.reshape(-1)
    cluster_labels = cluster_labels.reshape(-1)
    sem_oh = one_hot(semantic_labels, num_classes)
    if valid is not None:
        sem_oh = sem_oh * valid.reshape(-1, 1).astype(sem_oh.dtype)
    counts = segment_sum(sem_oh, cluster_labels, num_clusters)
    majority = jnp.argmax(counts, axis=1)
    pixel_majority = majority[jnp.clip(cluster_labels, 0, num_clusters - 1)]
    agree = jnp.equal(pixel_majority, semantic_labels)
    if valid is not None:
        agree = agree & valid.reshape(-1)
    return agree, majority


def resize_labels(labels: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize of integer label maps `[B, H, W] -> [B, h, w]`.

    Matches torch `F.interpolate(mode='nearest')` used by reference
    `resize_labels` (general/common.py:11): output pixel (i, j) samples input
    pixel (floor(i * H / h), floor(j * W / w)).
    """
    n, h, w = labels.shape
    out_h, out_w = size
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return labels[:, rows][:, :, cols]


def calculate_principal_components(embeddings: jnp.ndarray,
                                   num_components: int = 3) -> jnp.ndarray:
    """Top principal directions via SVD (for embedding visualization).

    Parity with reference `calculate_principal_components`
    (general/common.py:29).
    """
    embeddings = embeddings - jnp.mean(embeddings, axis=0, keepdims=True)
    _, _, vt = jnp.linalg.svd(embeddings, full_matrices=False)
    return vt[:num_components].T


def pca(embeddings: jnp.ndarray, num_components: int = 3,
        principal_components: jnp.ndarray | None = None) -> jnp.ndarray:
    """Project embeddings onto principal components.

    Parity with reference `pca` (general/common.py:45).
    """
    shape = embeddings.shape
    flat = embeddings.reshape(-1, shape[-1])
    if principal_components is None:
        principal_components = calculate_principal_components(flat, num_components)
    projected = flat @ principal_components
    return projected.reshape(*shape[:-1], num_components)


def initialize_cluster_labels(num_clusters, img_dimensions) -> jnp.ndarray:
    """Uniform grid of initial cluster ids over an image.

    Parity with reference `initialize_cluster_labels`
    (segsort/common.py:129-153): linspace + round-half-even, with
    label = y + (max_y + 1) * x.
    """
    ky, kx = num_clusters
    h, w = img_dimensions
    y_labels = jnp.round(jnp.linspace(0.0, ky - 1, h)).astype(jnp.int32)
    x_labels = jnp.round(jnp.linspace(0.0, kx - 1, w)).astype(jnp.int32)
    labels = y_labels[:, None] + (jnp.max(y_labels) + 1) * x_labels[None, :]
    return labels


def generate_location_features(img_dimensions, feature_type: str = 'float') -> jnp.ndarray:
    """Per-pixel (y, x) coordinate features.

    Parity with reference `generate_location_features`
    (segsort/common.py:156-189): 'float' gives linspace in [0, 1] (callers
    subtract 0.5), 'int' gives integer indices. Returns `[H, W, 2]`.
    """
    h, w = img_dimensions
    if feature_type == 'float':
        y = jnp.linspace(0.0, 1.0, h)
        x = jnp.linspace(0.0, 1.0, w)
    elif feature_type == 'int':
        y = jnp.arange(h, dtype=jnp.int32)
        x = jnp.arange(w, dtype=jnp.int32)
    else:
        raise ValueError('feature_type must be int or float')
    yy = jnp.broadcast_to(y[:, None], (h, w))
    xx = jnp.broadcast_to(x[None, :], (h, w))
    return jnp.stack([yy, xx], axis=2)
