"""Model-level utilities.

Capability parity with the remaining pieces of reference
`hsg/models/utils.py` that are not made obsolete by the SPMD design:

- `gather_and_reorder_image_indices` (utils.py:41-74), `gather_and_update_
  cluster_mappings` (:78-124), `gather_clustering_and_update_prototypes`
  (:127-217), `gather_and_update_datas` (:220-240) exist ONLY to shuttle
  ragged tensors between GPUs; in the global-batch jit program those
  gathers are the identity / a reshape (see hsg_tpu/models/predictions.py
  docstring for the global-id conventions). `reorder_image_indices` below
  keeps the occurring-order renumbering semantics available for data-side
  use.
- `gather_multiset_labels_per_batch_by_nearest_neighbor` (:243-309) is the
  feature-affinity pseudo-label generator and is reimplemented dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hsg_tpu.ops import common


def reorder_image_indices(image_indices: jnp.ndarray,
                          max_unique: int) -> jnp.ndarray:
    """Renumber ids densely by FIRST occurrence order.

    Parity with `gather_and_reorder_image_indices` (utils.py:41-74):
    e.g. [7, 7, 3, 9, 3] -> [0, 0, 1, 2, 1].

    Args:
      image_indices: `[N]` int ids.
      max_unique: static bound on distinct ids (use N).
    """
    n = image_indices.shape[0]
    # first_pos[v] = first position where value v-slot occurs.
    from hsg_tpu.ops import segment as segment_ops
    mu = segment_ops.masked_unique(image_indices,
                                   jnp.ones((n,), bool), max_unique)
    # position of first occurrence for each unique slot:
    pos = jnp.arange(n)
    first_pos = jnp.full((max_unique,), n, jnp.int32)
    first_pos = first_pos.at[mu.inverse].min(pos.astype(jnp.int32))
    # rank unique slots by first occurrence.
    order = jnp.argsort(first_pos)
    rank = jnp.zeros((max_unique,), jnp.int32).at[order].set(
        jnp.arange(max_unique, dtype=jnp.int32))
    return rank[mu.inverse]


def cluster_mapping(cluster_indices_1: jnp.ndarray,
                    cluster_indices_2: jnp.ndarray,
                    max_index_1: int,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mapping table from level-1 cluster ids to level-2 cluster ids.

    Parity with reference `gather_and_update_cluster_mappings`
    (utils.py:78-124): e.g. c1 = [0, 1, 2, 1, 3], c2 = [2, 5, 1, 5, 5]
    -> [2, 5, 1, 5, ...]. In the SPMD design this table is usually implicit
    (hierarchy ids are derived arithmetically, see predictions.py), but the
    explicit table remains useful for analysis/visualization.
    """
    c1 = cluster_indices_1.reshape(-1)
    c2 = cluster_indices_2.reshape(-1).astype(jnp.int32)
    if valid is not None:
        c1 = jnp.where(valid.reshape(-1), c1, max_index_1)
    table = jnp.zeros((max_index_1,), jnp.int32)
    return table.at[c1].set(c2, mode='drop')


def multiset_labels_by_nearest_neighbor(embeddings: jnp.ndarray,
                                        prototypes: jnp.ndarray,
                                        prototype_semantic_labels: jnp.ndarray,
                                        embedding_batch_labels: jnp.ndarray,
                                        prototype_batch_labels: jnp.ndarray,
                                        num_classes: int = 21,
                                        top_k: int = 3,
                                        threshold: float = 0.95,
                                        prototype_valid: jnp.ndarray | None = None
                                        ) -> jnp.ndarray:
    """Assign multi-hot pseudo-labels to pixels from NN labeled segments.

    Parity with `gather_multiset_labels_per_batch_by_nearest_neighbor`
    (utils.py:243-309): per pixel, retrieve the top-k most similar
    prototypes from the SAME batch element with a known class
    (< num_classes); retrievals below `threshold` similarity are ignored.
    Returns `[N, num_classes]` 0/1 multi-hot labels.
    """
    emb = embeddings.reshape(-1, embeddings.shape[-1])
    n = emb.shape[0]
    dists = jax.lax.dot_general(
        emb, prototypes, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    batch_ok = jnp.equal(embedding_batch_labels[:, None],
                         prototype_batch_labels[None, :])
    class_ok = (prototype_semantic_labels < num_classes)[None, :]
    ok = batch_ok & class_ok
    if prototype_valid is not None:
        ok = ok & prototype_valid[None, :]
    min_dist = jnp.min(dists)
    dists = jnp.where(ok, dists, min_dist - 1.0)
    nn_dists, nn_inds = jax.lax.top_k(dists, top_k)
    labels = prototype_semantic_labels[nn_inds]                # [N, k]
    labels = jnp.where(nn_dists < threshold, num_classes, labels)
    oh = common.one_hot(labels, num_classes + 1)
    multi = (jnp.sum(oh, axis=1) > 0).astype(jnp.int32)
    return multi[:, :num_classes]
