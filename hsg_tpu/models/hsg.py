"""HSG embedding model: FCN + clustering transformers + multiview grouping.

Capability parity with reference `hsg/models/embeddings/resnet_fcn_hsg.py`
(and the `_cs` variant, which differs only in head LR multipliers and the
dynamic segment cap, resnet_fcn_hsg_cs.py:499-502): learned 2-D position
embeddings, fine/coarse query embeddings, two `TransformerClustering`
heads, and the clustering pipeline

  k-means segments -> per-image padded prototypes -> fine transformer
  grouping -> coarse transformer grouping (Bayesian-composed logits)
  -> per-pixel fine/coarse cluster indices.

TPU re-architecture (all fixed shapes, one jitted program):
- the per-image-id Python loop (`_calculate_kmeans_prototypes`,
  resnet_fcn_hsg.py:1005-1136) becomes a reshape: the batch is arranged as
  `num_views` consecutive views per image, so grouping prototypes by image
  id is `[B, S, ...] -> [n_img, V * S, ...]` with validity masks. The
  merged per-image prototype tensor has exactly the reference's
  `max_num_clusters = V * max_segments_per_view` (= 256 by default,
  resnet_fcn_hsg.py:82);
- prototype extraction is a one-hot segment-pool matmul (MXU);
- hierarchy labels are argmaxes over dense `[n_img, K, M]` logit tensors.

Output dict (dense equivalents of resnet_fcn_hsg.py:935-966; `B` is the
flattened view-batch, `P` pixels/view, `S` segments/view, `M = V * S`,
`F`/`C2` fine/coarse cluster counts):
  embedding `[B, h, w, C]`, position_embedding, local_feature,
  cluster_embedding `[B, P, C]`, cluster_embedding_with_loc,
  cluster_semantic_label / cluster_instance_label `[B, P]`,
  cluster_index `[B, P]` (per-view segment id), pixel_valid `[B, P]`,
  segment_valid `[B, S]`,
  cluster_index_by_image `[B, P]` (merged per-image slot id v * S + s),
  nd_prototype `[n_img, M, C]`, nd_prototype_padding_mask `[n_img, M]`,
  nd_prototype_batch_index / _semantic_label / _instance_label
  `[n_img, M]`, nd_prototype_view_index `[n_img, M]`,
  finehrchy_nd_prototype_grouping_label `[n_img, M]`,
  finehrchy_nd_prototype_grouping_centroid `[n_img, F, C]`,
  finehrchy_nd_prototype_grouping_logit `[n_img, F, M]` (softmaxed),
  finehrchy_nd_prototype_encoder_memory `[n_img, M, C]`,
  coarsehrchy_* analogues (coarse logits composed over fine),
  finehrchy_cluster_index / coarsehrchy_cluster_index `[B, P]`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hsg_tpu.models.fcn import ResnetFcn, _bilinear_resize, _remat_cfg
from hsg_tpu.models.position import PositionEmbeddingLearned
from hsg_tpu.models.transformer import TransformerClustering
from hsg_tpu.ops import common


def collect_coarser_prototypes(prototypes: jnp.ndarray,
                               grouping_labels: jnp.ndarray,
                               node_valid: jnp.ndarray,
                               num_groups: int,
                               normalized: bool = True) -> jnp.ndarray:
    """Mean-pool node features into coarser groups (masked scatter-mean).

    Parity with reference `_collect_nd_coarser_prototype`
    (resnet_fcn_hsg.py:683-748). prototypes `[B, N, C]`, labels `[B, N]`,
    node_valid `[B, N]` -> `[B, num_groups, C]`.
    """
    w = node_valid.astype(prototypes.dtype)
    pooled = jax.vmap(
        lambda x, idx, ww: common.segment_mean(x, idx, num_groups, ww)
    )(prototypes, grouping_labels, w)
    if normalized:
        pooled = common.normalize_embedding(pooled)
    return pooled


class MultiviewResnetFcn(ResnetFcn):
    """HSG multiview embedding model (flagship).

    The batch must be arranged as `num_views` consecutive views per image
    (the loader guarantees this, mirroring SelfsupListDataset's collate,
    unsup_dataset.py:179-199).
    """
    num_views: int = 2
    fine_hrchy_clusters: int = 8
    coarse_hrchy_clusters: int = 4
    transformer_nhead: int = 4
    transformer_enc_layers: int = 2
    transformer_dec_layers: int = 2
    transformer_dropout: float = 0.1

    def setup(self):
        super().setup()
        dim = self.embedding_dim
        self.pos_embed = PositionEmbeddingLearned(dim // 2, name='pos_embed')
        self.fine_query_embed = self.param(
            'fine_query_embed', nn.initializers.normal(1.0),
            (self.fine_hrchy_clusters, dim))
        self.coarse_query_embed = self.param(
            'coarse_query_embed', nn.initializers.normal(1.0),
            (self.coarse_hrchy_clusters, dim))
        kw = dict(d_model=dim, nhead=self.transformer_nhead,
                  num_encoder_layers=self.transformer_enc_layers,
                  num_decoder_layers=self.transformer_dec_layers,
                  dim_feedforward=dim * 2, dropout=self.transformer_dropout,
                  # >= f32 whatever the backbone compute dtype (bf16
                  # backbones run the clustering heads in f32; the f64
                  # sharded-equality gate must stay f64 end to end).
                  dtype=jnp.promote_types(jnp.float32, self.dtype))
        self.fine_hrchy_transformer = TransformerClustering(
            num_clusters=self.fine_hrchy_clusters,
            name='fine_hrchy_transformer', **kw)
        self.coarse_hrchy_transformer = TransformerClustering(
            num_clusters=self.coarse_hrchy_clusters,
            name='coarse_hrchy_transformer', **kw)

    # -- embeddings ---------------------------------------------------------

    def generate_embeddings(self, images, resize_as_input=False, train=False):
        """Adds the learned position embedding to the FCN outputs
        (resnet_fcn_hsg.py:93-128)."""
        _, _, _, res5 = self.resnet_backbone(images, train)
        # Clustering runs in >= float32 whatever the backbone compute dtype
        # (bf16 backbones upcast here; float64 x64 parity runs stay f64).
        emb = self.conv_out(res5, train)
        emb = emb.astype(jnp.promote_types(jnp.float32, emb.dtype))
        pos = self.pos_embed(res5)
        if resize_as_input:
            emb = _bilinear_resize(emb, images.shape[1:3])
            pos = _bilinear_resize(pos, images.shape[1:3])
        local = self.lfn(images, size=emb.shape[1:3])
        return {'embedding': emb, 'local_feature': local,
                'position_embedding': pos}

    # -- clustering ---------------------------------------------------------

    def generate_clusters(self, embeddings, semantic_labels, instance_labels,
                          local_features=None, pos_embeddings=None,
                          train=False):
        """Full HSG clustering pipeline (see module docstring)."""
        base = super().generate_clusters(
            embeddings, semantic_labels, instance_labels, local_features)

        b, p, c = base['cluster_embedding'].shape
        v = self.num_views
        s = self.max_segments
        n_img = b // v
        m = v * s

        # Step 2 (dense): per-view prototypes + merge by image.
        pix_w = base['pixel_valid'].astype(jnp.float32)
        protos = jax.vmap(
            lambda e, idx, w: common.calculate_prototypes_from_labels(
                e, idx, s, w)
        )(base['cluster_embedding'], base['cluster_index'], pix_w)  # [B,S,C]

        seg_valid = base['segment_valid']                            # [B, S]
        seg_sem = base['segment_semantic_label']
        seg_inst = base['segment_instance_label']

        nd_prototype = protos.reshape(n_img, m, c)
        nd_valid = seg_valid.reshape(n_img, m)
        nd_padding_mask = ~nd_valid
        nd_sem = seg_sem.reshape(n_img, m)
        nd_inst = seg_inst.reshape(n_img, m)
        # Global flattened view index of each slot (-1 for padding).
        view_of_slot = jnp.repeat(jnp.arange(v), s)                  # [M]
        batch_index = (jnp.arange(n_img)[:, None] * v
                       + view_of_slot[None, :])
        nd_batch_index = jnp.where(nd_valid, batch_index, -1)
        nd_view_index = jnp.broadcast_to(view_of_slot[None],
                                         (n_img, m))

        # Positional-embedding prototypes (segment_mean over valid pixels,
        # resnet_fcn_hsg.py:555-562). Pos embeddings are NOT normalized.
        if pos_embeddings is not None:
            pos_flat = pos_embeddings.reshape(b, p, -1)
            pos_protos = jax.vmap(
                lambda x, idx, w: common.segment_mean(x, idx, s, w)
            )(pos_flat, base['cluster_index'], pix_w)
            nd_pos_prototype = pos_protos.reshape(n_img, m, -1)
        else:
            nd_pos_prototype = None

        # Step 3: hierarchical grouping with transformers
        # (resnet_fcn_hsg.py:580-681).
        (fine_centroids, fine_centroid_feats, fine_logits,
         fine_memory) = self.fine_hrchy_transformer(
            nd_prototype, nd_padding_mask, self.fine_query_embed,
            nd_pos_prototype, train)
        fine_probs = jax.nn.softmax(fine_logits, axis=1)     # [n,F,M]
        fine_labels = jnp.argmax(fine_probs, axis=1)          # [n,M]

        fine_pos = collect_coarser_prototypes(
            nd_pos_prototype, fine_labels, nd_valid,
            self.fine_hrchy_clusters, normalized=False
        ) if nd_pos_prototype is not None else None

        (coarse_centroids, _, coarse_logits,
         coarse_memory) = self.coarse_hrchy_transformer(
            fine_centroid_feats, None, self.coarse_query_embed,
            fine_pos, train)
        coarse_probs = jax.nn.softmax(coarse_logits, axis=1)  # [n,C2,F]
        # Bayesian composition over the fine assignment
        # (resnet_fcn_hsg.py:667-670).
        coarse_probs = jnp.einsum('nkf,nfm->nkm', coarse_probs, fine_probs)
        coarse_labels = jnp.argmax(coarse_probs, axis=1)      # [n,M]

        # Per-pixel hierarchical indices (resnet_fcn_hsg.py:751-780):
        # pixel -> merged slot -> group label.
        view_ids = jnp.arange(b) % v                           # [B]
        slot_ids = view_ids[:, None] * s + base['cluster_index']  # [B, P]
        img_ids = jnp.arange(b) // v                           # [B]
        fine_per_pixel = fine_labels[img_ids[:, None], slot_ids]
        coarse_per_pixel = coarse_labels[img_ids[:, None], slot_ids]

        base.update({
            'cluster_index_by_image': slot_ids,
            'nd_prototype': nd_prototype,
            'nd_prototype_padding_mask': nd_padding_mask,
            'nd_prototype_batch_index': nd_batch_index,
            'nd_prototype_view_index': nd_view_index,
            'nd_prototype_semantic_label': nd_sem,
            'nd_prototype_instance_label': nd_inst,
            'nd_pos_prototype': nd_pos_prototype,
            'finehrchy_nd_prototype_grouping_label': fine_labels,
            'finehrchy_nd_prototype_grouping_centroid': fine_centroids,
            'finehrchy_nd_prototype_grouping_logit': fine_probs,
            'finehrchy_nd_prototype_encoder_memory': fine_memory,
            'coarsehrchy_nd_prototype_grouping_label': coarse_labels,
            'coarsehrchy_nd_prototype_grouping_centroid': coarse_centroids,
            'coarsehrchy_nd_prototype_grouping_logit': coarse_probs,
            'coarsehrchy_nd_prototype_encoder_memory': coarse_memory,
            'finehrchy_cluster_index': fine_per_pixel,
            'coarsehrchy_cluster_index': coarse_per_pixel,
        })
        return base

    def __call__(self, images, semantic_labels=None, instance_labels=None,
                 resize_as_input=False, train=False):
        outputs = self.generate_embeddings(images, resize_as_input, train)
        size = outputs['embedding'].shape[1:3]
        if semantic_labels is not None:
            semantic_labels = common.resize_labels(semantic_labels, size)
        if instance_labels is not None:
            instance_labels = common.resize_labels(instance_labels, size)
        outputs.update(self.generate_clusters(
            outputs['embedding'], semantic_labels, instance_labels,
            outputs['local_feature'], outputs['position_embedding'], train))
        return outputs


def _build_multiview(depth, strides, dilations, config):
    net = config.network
    # Optional depth override (no reference analog): lets smoke tests and
    # micro configs run the full CLI surface with a shallow backbone.
    depth = tuple(net.get('backbone_depth') or depth)
    return MultiviewResnetFcn(
        backbone_depth=depth, strides=strides, dilations=dilations,
        embedding_dim=net.embedding_dim,
        label_divisor=net.label_divisor,
        semantic_ignore_index=config.dataset.semantic_ignore_index,
        kmeans_num_clusters=tuple(net.kmeans_num_clusters),
        kmeans_iterations=net.kmeans_iterations,
        max_segments=net.max_segments_per_view,
        remat=_remat_cfg(net.get('remat', False)),
        num_views=net.num_views,
        fine_hrchy_clusters=config.train.fine_hrchy_clusters,
        coarse_hrchy_clusters=config.train.coarse_hrchy_clusters,
        dtype=jnp.bfloat16 if net.get('compute_dtype') == 'bfloat16'
        else jnp.float32)


def resnet_50_fcn_multiview(config):
    """Flagship HSG model (resnet_fcn_hsg.py:1157-1160)."""
    return _build_multiview((3, 4, 6, 3), (1, 2, 2, 1), (1, 1, 1, 2), config)


def resnet_101_fcn_multiview(config):
    return _build_multiview((3, 4, 23, 3), (1, 2, 2, 1), (1, 1, 1, 2), config)
