"""Spherical (von Mises-Fisher) k-means as jitted, masked, batched EM.

Capability parity with reference `segment_by_kmeans` and friends
(hsg/utils/segsort/common.py:67-408), re-architected for TPU:

- the per-image Python loop becomes `vmap` over the batch;
- the EM loop is a `lax.fori_loop` of two MXU matmuls
  (M-step = one-hot pooling matmul, E-step = cosine-argmax matmul);
- ignore pixels are masked (weight 0 in the M-step) instead of physically
  dropped, which is exactly equivalent for the surviving pixels;
- the ragged segment re-indexing becomes `partition_segments` with a static
  per-image segment cap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hsg_tpu.ops import common
from hsg_tpu.ops import segment as segment_ops


def kmeans_with_initial_labels(embeddings: jnp.ndarray,
                               initial_labels: jnp.ndarray,
                               max_label: int,
                               iterations: int = 10,
                               valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked vMF k-means EM from initial labels.

    Parity with reference `kmeans_with_initial_labels`
    (segsort/common.py:67-97) with ignore handling by masking.

    Args:
      embeddings: `[N, C]` (need not be normalized; reference passes
        normalized embeddings+locations).
      initial_labels: `[N]` int initial cluster ids in [0, max_label).
      max_label: static cluster count K.
      iterations: EM iterations.
      valid: `[N]` bool; invalid pixels are excluded from the M-step.

    Returns:
      `[N]` final cluster ids (values for invalid pixels are meaningless).
    """
    weights = None if valid is None else valid.astype(embeddings.dtype)

    def body(_, labels):
        protos = common.calculate_prototypes_from_labels(
            embeddings, labels, max_label, weights)
        # Pin the carry dtype: under x64 argmax yields int64, which would
        # not round-trip an int32 initial carry through fori_loop.
        return common.find_nearest_prototypes(
            embeddings, protos).astype(jnp.int32)

    labels = jax.lax.fori_loop(0, iterations, body,
                               initial_labels.astype(jnp.int32))
    return jax.lax.stop_gradient(labels)


def kmeans(embeddings: jnp.ndarray, num_clusters, iterations: int = 10) -> jnp.ndarray:
    """Grid-initialized vMF k-means over `[B, H, W, C]` embeddings.

    Parity with reference `kmeans` (segsort/common.py:100-126).
    Returns `[B, H, W]` cluster ids.
    """
    b, h, w, c = embeddings.shape
    init = common.initialize_cluster_labels(num_clusters, (h, w))
    max_label = _grid_num_labels(num_clusters, (h, w))
    flat = embeddings.reshape(b, h * w, c)
    init_flat = jnp.broadcast_to(init.reshape(-1), (b, h * w))
    labels = jax.vmap(
        lambda e, l: kmeans_with_initial_labels(e, l, max_label, iterations)
    )(flat, init_flat)
    return labels.reshape(b, h, w)


def _grid_num_labels(num_clusters, img_dimensions) -> int:
    """Static label count of the grid initialization.

    linspace(0, k-1, n) always contains the endpoint k-1 for n >= 2, so the
    y-stride (max_y + 1) equals ky whenever H > 1 (and 1 for H == 1);
    likewise for x.
    """
    ky, kx = num_clusters
    h, w = img_dimensions
    eff_ky = ky if h > 1 else 1
    eff_kx = kx if w > 1 else 1
    return eff_ky * eff_kx


class SegmentByKmeans(NamedTuple):
    """Dense result of `segment_by_kmeans` (pixel arrays keep `[B, P]`).

    embedding: `[B, P, C]` L2-normalized pixel embeddings.
    embedding_with_loc: `[B, P, C+L]` re-normalized embeddings + locations.
    label: `[B, P]` int32 panoptic label per pixel (input labels).
    segment_id: `[B, P]` int32 per-image segment index in [0, S).
    pixel_valid: `[B, P]` bool.
    segment_valid: `[B, S]` bool.
    segment_label: `[B, S]` int32 panoptic label per segment (-1 padding).
    kmeans_label: `[B, P]` raw k-means cluster ids (pre-intersection).
    """
    embedding: jnp.ndarray
    embedding_with_loc: jnp.ndarray
    label: jnp.ndarray
    segment_id: jnp.ndarray
    pixel_valid: jnp.ndarray
    segment_valid: jnp.ndarray
    segment_label: jnp.ndarray
    kmeans_label: jnp.ndarray


def segment_by_kmeans(embeddings: jnp.ndarray,
                      labels: jnp.ndarray | None,
                      num_clusters,
                      max_segments: int,
                      local_features: jnp.ndarray | None = None,
                      ignore_index: int | None = None,
                      iterations: int = 10) -> SegmentByKmeans:
    """Per-image spherical k-means + label intersection, fully dense.

    Parity with reference `segment_by_kmeans` (segsort/common.py:270-408):
    1. L2-normalize embeddings; append (y, x) - 0.5 location features and
       re-normalize.
    2. Per image: EM from the uniform grid initialization over valid pixels.
    3. Intersect k-means clusters with the label map into final segments
       (unique (label, cluster) pairs), capped at `max_segments` per image.

    Unlike the reference, segments stay per-image (id in [0, S)); callers
    form global ids as batch_index * S + segment_id, which reproduces the
    reference's global re-indexing up to renumbering.

    Args:
      embeddings: `[B, H, W, C]` float (NHWC, TPU-native layout).
      labels: `[B, H, W]` int panoptic labels or None (treated as zeros).
      num_clusters: (ky, kx) grid cluster counts.
      max_segments: static per-image segment cap S.
      local_features: `[B, H, W, L]` or None (default (y, x) - 0.5 grid).
      ignore_index: label value marking invalid pixels.
      iterations: EM iterations.
    """
    b, h, w, c = embeddings.shape
    p = h * w

    emb = common.normalize_embedding(embeddings)
    if local_features is None:
        loc = common.generate_location_features((h, w), 'float') - 0.5
        loc = jnp.broadcast_to(loc[None], (b, h, w, 2))
    else:
        loc = local_features
    emb_with_loc = common.normalize_embedding(
        jnp.concatenate([emb, loc.astype(emb.dtype)], axis=-1))

    if labels is None:
        labels = jnp.zeros((b, h, w), dtype=jnp.int32)
    labels = labels.astype(jnp.int32)
    if ignore_index is None:
        valid = jnp.ones((b, h, w), dtype=bool)
    else:
        valid = labels != ignore_index

    init = common.initialize_cluster_labels(num_clusters, (h, w))
    k = _grid_num_labels(num_clusters, (h, w))
    init_flat = jnp.broadcast_to(init.reshape(-1), (b, p))

    emb_flat = emb.reshape(b, p, c)
    embl_flat = emb_with_loc.reshape(b, p, -1)
    labels_flat = labels.reshape(b, p)
    valid_flat = valid.reshape(b, p)

    kmeans_labels = jax.vmap(
        lambda e, l, v: kmeans_with_initial_labels(e, l, k, iterations, v)
    )(embl_flat, init_flat, valid_flat)

    segs = jax.vmap(
        lambda lab, cid, v: segment_ops.partition_segments(
            lab, cid, v, k, max_segments)
    )(labels_flat, kmeans_labels, valid_flat)

    return SegmentByKmeans(
        embedding=emb_flat,
        embedding_with_loc=embl_flat,
        label=labels_flat,
        segment_id=segs.segment_ids,
        pixel_valid=segs.pixel_valid,
        segment_valid=segs.segment_valid,
        segment_label=segs.segment_label,
        kmeans_label=kmeans_labels,
    )
