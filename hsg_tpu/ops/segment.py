"""Static-shape segment re-indexing (the ragged->dense re-architecture).

The reference builds segments with `torch.unique(..., return_inverse=True)`
over variable-length concatenated tensors (segsort/common.py:270-408,
models/utils.py:127-217). On TPU everything must be fixed-shape, so unique
re-indexing becomes a sort-based dense op with a static segment cap and
validity masks. This module is the correctness-critical seam of the rebuild
(SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Sentinel for invalid keys; sorts after every real key. Keys are int32
# (JAX default integer width): callers must keep label * stride < 2**31 - 1.
# With the reference's label_divisor=2048 and <=288 k-means clusters the
# maximum key is ~1.5e8, well within range.
_BIG = jnp.iinfo(jnp.int32).max


class MaskedUnique(NamedTuple):
    """Result of `masked_unique`.

    values: `[size]` sorted unique keys, padded with the sentinel.
    inverse: `[N]` index of each element's key within `values`
      (clamped; only meaningful where `element_valid`).
    element_valid: `[N]` True where the element was valid AND its key
      survived truncation to `size`.
    unique_valid: `[size]` True for real (non-padding) unique slots.
    """
    values: jnp.ndarray
    inverse: jnp.ndarray
    element_valid: jnp.ndarray
    unique_valid: jnp.ndarray


def masked_unique(keys: jnp.ndarray, valid: jnp.ndarray, size: int) -> MaskedUnique:
    """Dense equivalent of `torch.unique(x, return_inverse=True)`.

    Unique values are returned sorted ascending (matching torch), re-indexed
    densely 0..n_unique-1. Invalid elements are excluded. If more than `size`
    unique keys exist, the largest keys overflow and their elements are
    flagged invalid (deterministic truncation).

    Works on int32/int64 keys; runs as one sort + one searchsorted, both of
    which XLA maps to efficient TPU sort networks.
    """
    keys = keys.astype(jnp.int32).reshape(-1)
    valid = valid.reshape(-1)
    k = jnp.where(valid, keys, _BIG)
    sorted_k = jnp.sort(k)
    is_new = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_k[1:] != sorted_k[:-1]])
    is_new = is_new & (sorted_k != _BIG)
    rank = jnp.cumsum(is_new) - 1  # unique rank of each sorted position
    # Scatter the first occurrence of each unique key into its rank slot;
    # ranks >= size are dropped (overflow).
    scatter_idx = jnp.where(is_new, rank, size)
    values = jnp.full((size,), _BIG, dtype=jnp.int32)
    values = values.at[scatter_idx].set(sorted_k, mode='drop')
    inverse = jnp.searchsorted(values, k)
    inverse = jnp.clip(inverse, 0, size - 1).astype(jnp.int32)
    element_valid = valid & (values[inverse] == k)
    unique_valid = values != _BIG
    return MaskedUnique(values, inverse, element_valid, unique_valid)


class DenseSegments(NamedTuple):
    """Per-image segment partition in dense padded form.

    segment_ids: `[P]` int32 in [0, S); per-pixel segment index.
    pixel_valid: `[P]` bool; pixel participates (not ignore, not overflow).
    segment_valid: `[S]` bool; segment slot is a real segment.
    segment_label: `[S]` int32 label key carried by each segment
      (padding slots hold -1).
    num_segments: `[]` int32 count of real segments.
    """
    segment_ids: jnp.ndarray
    pixel_valid: jnp.ndarray
    segment_valid: jnp.ndarray
    segment_label: jnp.ndarray
    num_segments: jnp.ndarray


def partition_segments(labels: jnp.ndarray,
                       cluster_ids: jnp.ndarray,
                       valid: jnp.ndarray,
                       num_clusters: int,
                       max_segments: int) -> DenseSegments:
    """Intersects label maps with cluster assignments into dense segments.

    Dense equivalent of the reference's two-step re-indexing
    (segsort/common.py:397-405 + prepare_prototype_labels): final segments
    are the unique (label, cluster) pairs; each segment carries its label.

    Args:
      labels: `[P]` integer label keys (e.g. panoptic = sem * divisor + inst).
      cluster_ids: `[P]` int k-means cluster ids in [0, num_clusters).
      valid: `[P]` bool validity (ignore pixels False).
      num_clusters: static k-means cluster count (key stride).
      max_segments: static segment cap S.
    """
    key = labels.astype(jnp.int32) * num_clusters + cluster_ids.astype(jnp.int32)
    mu = masked_unique(key, valid, max_segments)
    seg_label = jnp.where(mu.unique_valid, mu.values // num_clusters, -1)
    return DenseSegments(
        segment_ids=mu.inverse,
        pixel_valid=mu.element_valid,
        segment_valid=mu.unique_valid,
        segment_label=seg_label,
        num_segments=jnp.sum(mu.unique_valid).astype(jnp.int32),
    )


def prepare_prototype_labels(semantic_labels: jnp.ndarray,
                             instance_labels: jnp.ndarray,
                             valid: jnp.ndarray,
                             offset: int,
                             max_prototypes: int):
    """Dense parity with reference `prepare_prototype_labels`
    (segsort/common.py:192-218).

    Builds panoptic keys sem + inst * offset, uniquifies them, and returns
    (prototype_semantic_labels `[max_prototypes]` with -1 padding,
     per-element dense instance ids `[N]`, element_valid, prototype_valid).
    """
    panoptic = (semantic_labels.astype(jnp.int32)
                + instance_labels.astype(jnp.int32) * offset)
    mu = masked_unique(panoptic, valid, max_prototypes)
    proto_sem = jnp.where(mu.unique_valid, mu.values % offset, -1)
    return proto_sem, mu.inverse, mu.element_valid, mu.unique_valid
