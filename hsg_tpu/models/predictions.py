"""Prediction models: loss containers + NN-retrieval inference.

Capability parity with reference `hsg/models/predictions/{hsg,hsg_cs,
segsort}.py` plus the cross-GPU synchronization the reference performs in
the training script (pyscripts/train/train.py:169-257 with
hsg/models/utils.py): in this SPMD design the "gather prototypes from all
GPUs, re-index globally, broadcast back" dance disappears — the losses are
written over the *global* batch, and when the batch is sharded over a
`data` mesh XLA inserts the all-gathers over ICI automatically.

Global id conventions (replacing the reference's `torch.unique` global
re-indexing, models/utils.py:180-194):
  - global segment id      = flat_view_index * S + segment_id
  - global fine cluster id = image_index * F + fine_label
  - global coarse id       = image_index * C2 + coarse_label
  - image_index            = flat_view_index // num_views
These reproduce the reference's partition exactly up to renumbering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hsg_tpu.losses import segsort as segsort_loss
from hsg_tpu.losses import graph as graph_loss
from hsg_tpu.ops import common


def _flat_global_prototypes(datas):
    """Flattens per-view segment prototypes into the global prototype set.

    Returns dict with prototype `[B*S, C]`, valid `[B*S]`, and the pixel ->
    global prototype index map `[B, P]`.
    """
    emb = datas['cluster_embedding']            # [B, P, C]
    b, p, c = emb.shape
    s = datas['segment_valid'].shape[1]
    pix_w = datas['pixel_valid'].astype(jnp.float32)
    protos = jax.vmap(
        lambda e, idx, w: common.calculate_prototypes_from_labels(e, idx, s, w)
    )(emb, datas['cluster_index'], pix_w)        # [B, S, C]
    proto_flat = protos.reshape(b * s, c)
    valid_flat = datas['segment_valid'].reshape(b * s)
    global_pid = (jnp.arange(b)[:, None] * s
                  + datas['cluster_index'])      # [B, P]
    return proto_flat, valid_flat, global_pid


class Hsg:
    """HSG loss container.

    Parity with reference `Hsg` (predictions/hsg.py:16-267): builds
    img_sim / fine_hrchy / coarse_hrchy SegSort losses, DMoN + collapse on
    the transformer assignment logits, and the cross-image centroid
    contrastive loss; reports top-5 retrieval accuracy.

    `variant='cs'` reproduces `HsgCs` (predictions/hsg_cs.py): DMoN without
    the per-view K-NN graph restriction.
    """

    def __init__(self, config, variant: str = 'default'):
        t = config.train
        # MXU dtype for the Pallas NCA route (train.nca_compute_dtype;
        # 'bfloat16' = ~2x kernel throughput, <1e-2 nll error).
        nca = t.get('nca_compute_dtype', 'float32')
        # train.nca_impl overrides the pixel-level NCA route ('auto' |
        # 'dense' | 'chunked' | 'pallas'): at exactly-threshold scales
        # (stage-1's 8,192 prototypes) the dense route materializes a
        # [25088, 8192] f32 similarity matrix (~820 MB + two bf16
        # transposed copies) that the fused Pallas kernel avoids.
        impl = t.get('nca_impl', 'auto')
        self.img_sim = (segsort_loss.SegSortLoss(t.img_sim_concentration,
                                                 nca_dtype=nca, impl=impl)
                        if t.img_sim_loss_types == 'segsort' else None)
        self.img_sim_weight = t.img_sim_loss_weight
        self.fine_hrchy = (segsort_loss.SegSortLoss(t.fine_hrchy_concentration,
                                                    nca_dtype=nca)
                           if t.fine_hrchy_loss_types == 'segsort' else None)
        self.fine_hrchy_weight = t.fine_hrchy_loss_weight
        self.coarse_hrchy = (
            segsort_loss.SegSortLoss(t.coarse_hrchy_concentration,
                                     nca_dtype=nca)
            if t.coarse_hrchy_loss_types == 'segsort' else None)
        self.coarse_hrchy_weight = t.coarse_hrchy_loss_weight
        self.dmon = (graph_loss.DMonLoss(adj_knn=t.dmon_knn)
                     if t.dmon_loss_types == 'dmon' else None)
        self.dmon_weight = t.dmon_loss_weight
        self.centroid_cont = (
            segsort_loss.SegSortLoss(t.centroid_cont_concentration,
                                     nca_dtype=nca)
            if t.centroid_cont_loss_types == 'segsort' else None)
        self.centroid_cont_weight = t.centroid_cont_loss_weight
        self.label_divisor = config.network.label_divisor
        self.num_views = config.network.num_views
        self.variant = variant

    # ------------------------------------------------------------------

    def losses(self, datas, targets=None):
        """Returns (img_sim_loss, hrchy_group_loss, clustering_loss, acc).

        `datas` is the embedding-model output dict; `targets` may carry
        'image_index' `[B]` (defaults to the static arrangement arange//V).
        """
        targets = targets or {}
        emb = datas['cluster_embedding']
        b, p, c = emb.shape
        v = self.num_views
        pixel_valid = datas['pixel_valid']

        image_index = targets.get('image_index')
        if image_index is None:
            image_index = jnp.arange(b) // v

        proto_flat, proto_valid, global_pid = _flat_global_prototypes(datas)
        s = datas['segment_valid'].shape[1]

        emb_flat = emb.reshape(b * p, c)
        pix_valid_flat = pixel_valid.reshape(b * p)
        pid_flat = global_pid.reshape(b * p)

        img_sim_loss = None
        img_sim_acc = None
        hrchy_loss = None
        clustering_loss = None

        if self.img_sim is not None:
            # Pixel/prototype grouping label: instance * divisor + image id
            # (predictions/hsg.py:86-110) — same superpixel in both views of
            # an image shares a label, which is the multiview cosegmentation
            # signal.
            pix_inst = datas['cluster_instance_label']                # [B, P]
            pix_img = image_index[:, None]
            pix_label = (pix_inst * self.label_divisor + pix_img)
            seg_inst = datas['segment_instance_label']                # [B, S]
            seg_label = seg_inst * self.label_divisor + image_index[:, None]
            seg_label = jnp.where(datas['segment_valid'], seg_label, -1)

            img_sim_loss = self.img_sim(
                emb_flat, pix_label.reshape(-1), pid_flat,
                proto_flat, seg_label.reshape(-1),
                pixel_valid=pix_valid_flat, prototype_valid=proto_valid)
            img_sim_loss = img_sim_loss * self.img_sim_weight

            # Top-5 retrieval accuracy metric (predictions/hsg.py:113).
            # Chunked scan keeps it exact at stage-1 scale (~32k global
            # prototypes) without a quadratic [G, G] affinity in memory.
            sl = seg_label.reshape(-1)
            img_sim_acc = segsort_loss.top_k_accuracy_chunked(
                proto_flat, sl, proto_flat, sl, 5,
                query_valid=proto_valid, prototype_valid=proto_valid)

        for name, loss_fn, weight in (
                ('finehrchy', self.fine_hrchy, self.fine_hrchy_weight),
                ('coarsehrchy', self.coarse_hrchy, self.coarse_hrchy_weight)):
            if loss_fn is None:
                continue
            labels_px = datas[name + '_cluster_index']                # [B, P]
            group_labels = datas[name + '_nd_prototype_grouping_label']
            # Global hierarchy id = image_index * K + label; K is static
            # (fine/coarse cluster count, from the logits' shape).
            num_groups = datas[name + '_nd_prototype_grouping_logit'].shape[1]
            px_global = (image_index[:, None] * num_groups + labels_px)
            # Per-segment hierarchy id, aligned with the flat prototype set:
            # slot (view v, seg s) of image i -> group_labels[i, v*S+s].
            # Indexing uses the STATIC view arrangement (consecutive views);
            # `image_index` is only label semantics.
            img_row = jnp.arange(b) // v
            seg_slot = (jnp.arange(b)[:, None] % v) * s + jnp.arange(s)[None, :]
            seg_group = group_labels[img_row[:, None], seg_slot]      # [B, S]
            seg_global = (image_index[:, None] * num_groups + seg_group)
            seg_global = jnp.where(datas['segment_valid'], seg_global, -1)

            term = loss_fn(
                emb_flat, px_global.reshape(-1), pid_flat,
                proto_flat, seg_global.reshape(-1),
                pixel_valid=pix_valid_flat, prototype_valid=proto_valid)
            term = term * weight
            hrchy_loss = term if hrchy_loss is None else hrchy_loss + term

        if self.dmon is not None:
            nd_protos = datas['nd_prototype']                  # [n, M, C]
            nd_valid = ~datas['nd_prototype_padding_mask']
            if self.variant == 'cs':
                group_ids, num_groups = None, 1
            else:
                group_ids = datas['nd_prototype_view_index']
                num_groups = v
            terms = []
            for key in ('coarsehrchy', 'finehrchy'):
                probs = datas[key + '_nd_prototype_grouping_logit']
                s_assign = jnp.swapaxes(probs, 1, 2)           # [n, M, K]
                dmon, collapse = self.dmon(
                    s_assign, nd_protos, nd_valid, group_ids, num_groups)
                terms.extend([dmon, collapse])
            clustering_loss = sum(terms) * self.dmon_weight

        if self.centroid_cont is not None:
            terms = []
            for key in ('coarsehrchy', 'finehrchy'):
                centroids = datas[key + '_nd_prototype_grouping_centroid']
                n_img, k, c_dim = centroids.shape
                flat = common.normalize_embedding(
                    centroids.reshape(n_img * k, c_dim))
                labels = jnp.arange(n_img * k)
                terms.append(self.centroid_cont(
                    flat, labels, labels, flat, labels))
            term = sum(terms) * self.centroid_cont_weight
            clustering_loss = (term if clustering_loss is None
                               else clustering_loss + term)

        return img_sim_loss, hrchy_loss, clustering_loss, img_sim_acc

    def __call__(self, datas, targets=None, with_loss=True,
                 with_prediction=False):
        outputs = {}
        if with_loss:
            img_sim, hrchy, clustering, acc = self.losses(datas, targets)
            outputs.update({
                'img_sim_loss': img_sim,
                'hrchy_group_loss': hrchy,
                'clustering_loss': clustering,
                'accuracy': acc if acc is not None else jnp.float32(0),
            })
        return outputs


def hsg(config):
    """Factory parity with predictions/hsg.py:270."""
    return Hsg(config, variant='default')


def hsg_cs(config):
    """Factory parity with predictions/hsg_cs.py:269."""
    return Hsg(config, variant='cs')


class Segsort:
    """SegSort prediction model: supervised-flavor losses + THE inference
    path (NN retrieval against a memory bank).

    Parity with reference `Segsort` (predictions/segsort.py:15-281).
    """

    def __init__(self, config):
        t = config.train
        nca = t.get('nca_compute_dtype', 'float32')
        self.sem_ann = (segsort_loss.SegSortLoss(t.sem_ann_concentration,
                                                 nca_dtype=nca)
                        if t.sem_ann_loss_types == 'segsort' else None)
        self.sem_ann_weight = t.sem_ann_loss_weight
        self.sem_occ = (segsort_loss.SetSegSortLoss(t.sem_occ_concentration)
                        if t.sem_occ_loss_types == 'segsort' else None)
        self.sem_occ_weight = t.sem_occ_loss_weight
        self.img_sim = (segsort_loss.SegSortLoss(t.img_sim_concentration,
                                                 nca_dtype=nca)
                        if t.img_sim_loss_types == 'segsort' else None)
        self.img_sim_weight = t.img_sim_loss_weight
        # Feature-affinity regularization: a SetSegSort over NN pseudo-
        # labels. The reference constructs this loss (predictions/
        # segsort.py:41-47, converting 'segsort' -> set_segsort) and ships
        # the pseudo-label generator (models/utils.py:243-309); here the
        # loss is also wired into `losses()`.
        self.feat_aff = (segsort_loss.SetSegSortLoss(t.feat_aff_concentration)
                         if t.feat_aff_loss_types == 'segsort' else None)
        self.feat_aff_weight = t.feat_aff_loss_weight
        self.feat_aff_top_k = int(t.get('feat_aff_top_k', 3))
        self.feat_aff_threshold = float(t.get('feat_aff_threshold', 0.95))
        self.num_classes = config.dataset.num_classes
        self.label_divisor = config.network.label_divisor
        self.semantic_ignore_index = config.dataset.semantic_ignore_index

    def predictions(self, datas, targets=None, top_k: int = 20):
        """Label test segments by top-k NN retrieval + majority vote.

        Parity with predictions/segsort.py:66-123 — the reference chunks
        prototypes into <=10 groups to bound GPU memory; on TPU one
        `[S, G_mem]` matmul is both smaller and faster, so chunking is
        unnecessary.

        Returns (semantic_pred `[B, P]`, semantic_topk `[B, P, top_k]`).
        """
        targets = targets or {}
        memory = targets.get('semantic_memory_prototype')
        memory_labels = targets.get('semantic_memory_prototype_label')
        emb = datas.get('cluster_embedding')
        cluster_index = datas.get('cluster_index')
        if memory is None or memory_labels is None or emb is None:
            return None, None

        b, p, c = emb.shape
        s = datas['segment_valid'].shape[1]
        pix_w = datas['pixel_valid'].astype(jnp.float32)
        protos = jax.vmap(
            lambda e, idx, w: common.calculate_prototypes_from_labels(
                e, idx, s, w)
        )(emb, cluster_index, pix_w)                      # [B, S, C]

        def retrieve(proto_img):
            _, topk_labels = segsort_loss.top_k_ranking(
                proto_img, jnp.zeros((s,), jnp.int32), memory,
                memory_labels, top_k)
            maj = segsort_loss.majority_label_from_topk(
                topk_labels, self.num_classes)
            return maj, topk_labels

        maj, topk_labels = jax.vmap(retrieve)(protos)      # [B,S], [B,S,K]
        semantic_pred = jnp.take_along_axis(maj, cluster_index, axis=1)
        semantic_topk = jnp.take_along_axis(
            topk_labels, cluster_index[:, :, None], axis=1)
        return semantic_pred, semantic_topk

    def losses(self, datas, targets=None):
        """Supervised-flavor losses (sem_ann/sem_occ/img_sim).

        Parity with predictions/segsort.py:125-241. These are dormant in
        the HSG recipes but part of the API surface; img_sim here follows
        the reference's per-image prototype variant with location features.
        """
        targets = targets or {}
        sem_ann_loss = None
        sem_occ_loss = None
        img_sim_loss = None
        sem_ann_acc = None

        if self.sem_ann is not None:
            emb = datas['cluster_embedding']
            b, p, c = emb.shape
            proto_flat, proto_valid, global_pid = _flat_global_prototypes(datas)
            pix_sem = datas['cluster_semantic_label'].reshape(-1)
            seg_sem = jnp.where(
                datas['segment_valid'],
                datas['segment_semantic_label'], -1).reshape(-1)
            # Append memory-bank prototypes behind the live set
            # (predictions/segsort.py:151-181). Pixels never point at
            # memory entries, so `global_pid` stays valid.
            mem_protos = targets.get('memory_prototype')
            mem_labels = targets.get('memory_prototype_semantic_label')
            if mem_protos is not None and mem_labels is not None:
                mem_valid = targets.get('memory_prototype_valid')
                if isinstance(mem_protos, (list, tuple)):
                    mem_protos = jnp.concatenate(list(mem_protos), axis=0)
                    mem_labels = jnp.concatenate(list(mem_labels), axis=0)
                    if mem_valid is not None:
                        mem_valid = jnp.concatenate(list(mem_valid), axis=0)
                if mem_valid is None:
                    mem_valid = jnp.ones((mem_protos.shape[0],), bool)
                proto_flat = jnp.concatenate([proto_flat, mem_protos], axis=0)
                seg_sem = jnp.concatenate(
                    [seg_sem, mem_labels.reshape(-1)], axis=0)
                proto_valid = jnp.concatenate(
                    [proto_valid, mem_valid.reshape(-1)], axis=0)
            pix_ok = (datas['pixel_valid'].reshape(-1)
                      & (pix_sem < self.num_classes) & (pix_sem >= 0))
            proto_ok = proto_valid & (seg_sem < self.num_classes) & (seg_sem >= 0)
            sem_ann_loss = self.sem_ann(
                emb.reshape(-1, c), pix_sem, global_pid.reshape(-1),
                proto_flat, seg_sem,
                pixel_valid=pix_ok, prototype_valid=proto_ok)
            sem_ann_loss = sem_ann_loss * self.sem_ann_weight
            sem_ann_acc, _ = segsort_loss.top_k_ranking(
                proto_flat, seg_sem, proto_flat, seg_sem, 5,
                query_valid=proto_ok, prototype_valid=proto_ok)

        if self.sem_occ is not None:
            # Image-tag co-occurrence loss (predictions/segsort.py:144-209):
            # multi-hot per-view tags over classes 1..num_classes-1
            # (background column dropped); each pixel/prototype carries its
            # view's tag vector. Tags come from targets['semantic_tag']
            # `[B, num_classes]` or are derived from the GT labels.
            emb = datas['cluster_embedding']
            b, p, c = emb.shape
            proto_flat, proto_valid, global_pid = _flat_global_prototypes(
                datas)
            tags = targets.get('semantic_tag')
            if tags is None:
                sem_px = datas['cluster_semantic_label']
                oh = common.one_hot(
                    jnp.where(datas['pixel_valid'], sem_px, -1),
                    self.num_classes)
                tags = (jnp.sum(oh, axis=1) > 0).astype(jnp.int32)
            tags = tags[:, 1:self.num_classes]                    # [B, k-1]
            pix_tags = jnp.repeat(tags, p, axis=0)                # [B*P, k-1]
            s = datas['segment_valid'].shape[1]
            proto_tags = jnp.repeat(tags, s, axis=0)              # [B*S, k-1]
            sem_occ_loss = self.sem_occ(
                emb.reshape(-1, c), pix_tags, global_pid.reshape(-1),
                proto_flat, proto_tags,
                pixel_valid=datas['pixel_valid'].reshape(-1),
                prototype_valid=proto_valid)
            sem_occ_loss = sem_occ_loss * self.sem_occ_weight

        feat_aff_loss = None
        if self.feat_aff is not None:
            # SetSegSort over nearest-neighbor pseudo-labels: each pixel /
            # prototype gets a multi-hot tag of the classes of its top-k
            # most-similar labeled segments in the SAME batch element
            # (generator: models/utils.py:243-309; loss construction:
            # predictions/segsort.py:41-47).
            from hsg_tpu.models import model_utils
            emb = datas['cluster_embedding']
            b, p, c = emb.shape
            s = datas['segment_valid'].shape[1]
            proto_flat, proto_valid, global_pid = _flat_global_prototypes(
                datas)
            seg_sem = jnp.where(
                datas['segment_valid'],
                datas['segment_semantic_label'], -1).reshape(-1)
            # Route unlabeled (<0) segments out of the generator: it keeps
            # only prototypes with label < num_classes.
            gen_sem = jnp.where(seg_sem >= 0, seg_sem, self.num_classes)
            pix_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
            seg_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s)
            pseudo = lambda q, qb: jax.lax.stop_gradient(
                model_utils.multiset_labels_by_nearest_neighbor(
                    q, proto_flat, gen_sem, qb, seg_batch,
                    num_classes=self.num_classes,
                    top_k=self.feat_aff_top_k,
                    threshold=self.feat_aff_threshold,
                    prototype_valid=proto_valid))
            pix_tags = pseudo(emb.reshape(-1, c), pix_batch)
            proto_tags = pseudo(proto_flat, seg_batch)
            feat_aff_loss = self.feat_aff(
                emb.reshape(-1, c), pix_tags, global_pid.reshape(-1),
                proto_flat, proto_tags,
                pixel_valid=datas['pixel_valid'].reshape(-1),
                prototype_valid=proto_valid)
            feat_aff_loss = feat_aff_loss * self.feat_aff_weight

        if self.img_sim is not None:
            emb = datas['cluster_embedding_with_loc']
            b, p, c = emb.shape
            s = datas['segment_valid'].shape[1]
            pix_w = datas['pixel_valid'].astype(jnp.float32)
            protos = jax.vmap(
                lambda e, idx, w: common.calculate_prototypes_from_labels(
                    e, idx, s, w)
            )(emb, datas['cluster_index'], pix_w)

            def per_image(e, inst, pid, pr, seg_inst, pv, sv):
                labels = jnp.where(sv, seg_inst, -1)
                return self.img_sim(
                    e, inst, pid, pr, labels,
                    pixel_valid=pv, prototype_valid=sv)

            per = jax.vmap(per_image)(
                emb, datas['cluster_instance_label'],
                datas['cluster_index'], protos,
                datas['segment_instance_label'],
                datas['pixel_valid'], datas['segment_valid'])
            img_sim_loss = jnp.mean(per) * self.img_sim_weight

        return (sem_ann_loss, sem_occ_loss, img_sim_loss, feat_aff_loss,
                sem_ann_acc)

    def __call__(self, datas, targets=None, with_loss=True,
                 with_prediction=False):
        outputs = {}
        if with_prediction:
            pred, topk = self.predictions(datas, targets)
            outputs.update({'semantic_prediction': pred,
                            'semantic_score': topk})
        if with_loss:
            sem_ann, sem_occ, img_sim, feat_aff, acc = self.losses(
                datas, targets)
            outputs.update({'sem_ann_loss': sem_ann,
                            'sem_occ_loss': sem_occ,
                            'img_sim_loss': img_sim,
                            'feat_aff_loss': feat_aff,
                            'accuracy': acc if acc is not None
                            else jnp.float32(0)})
        return outputs


def segsort(config):
    """Factory parity with predictions/segsort.py:278."""
    return Segsort(config)
