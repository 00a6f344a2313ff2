"""Shared in-process train+eval harness over synthetic datasets.

Used by tools/superpixel_sweep.py (superpixel-source sensitivity) and
tools/variant_ab.py (hsg vs hsg_cs quality A/B): stages a small synthetic
dataset into HBM, trains with the real jitted train step
(device-resident, on-device augmentation), then runs the full
prototype -> retrieval -> mIoU protocol with the real eval programs —
one process, so jitted programs compile once and are reused across
sweep points with identical shapes.
"""

from __future__ import annotations

import os
import time

import numpy as np
from PIL import Image


def load_split_raw(root, split, n, hw):
    """Stages a split's images as fixed-size uint8 canvases."""
    imgs = np.zeros((n, hw[0], hw[1], 3), np.uint8)
    for i in range(n):
        name = f'{split}_{i:05d}'
        imgs[i] = np.asarray(Image.open(
            os.path.join(root, split, 'images', name + '.jpg')), np.uint8)
    true_hw = np.full((n, 2), (hw[0], hw[1]), np.int32)
    return imgs, true_hw


def train_resident(cfg, embedding_model, prediction_model, step_fn_cache,
                   imgs, superpixels, true_hw, steps, batch_images,
                   log_prefix='', log_every=500):
    """Trains from scratch on an HBM-resident dataset; returns variables.

    `step_fn_cache` is a dict carrying the jitted step across calls with
    identical shapes (one compile per process).
    """
    import jax
    import jax.numpy as jnp
    from hsg_tpu.parallel import mesh as mesh_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import resident as res_lib
    from hsg_tpu.train import train_step as ts_lib
    from pyscripts.common import head_multipliers

    n_train = imgs.shape[0]
    mesh = step_fn_cache.setdefault('mesh', mesh_lib.create_mesh(1))
    data = jax.device_put({
        'image_raw': jnp.asarray(imgs),
        'instance_raw': jnp.asarray(superpixels.astype(np.uint16)),
        'true_hw': jnp.asarray(true_hw),
    }, mesh_lib.replicated(mesh))

    crop = int(cfg.train.crop_size[0])
    rows = batch_images * cfg.network.num_views
    init_batch = {
        'image': np.zeros((rows, crop, crop, 3), np.float32),
        'semantic_label': np.zeros((rows, crop, crop), np.int32),
        'instance_label': np.zeros((rows, crop, crop), np.int32),
    }
    hw_mult, hb_mult = head_multipliers(cfg)
    state, update_fn = ts_lib.create_train_state(
        embedding_model, jax.random.PRNGKey(0), init_batch,
        head_weight_mult=hw_mult, head_bias_mult=hb_mult,
        momentum=cfg.train.momentum, weight_decay=cfg.train.weight_decay)
    key = (id(embedding_model), id(prediction_model), rows, crop, n_train)
    if step_fn_cache.get('key') != key:
        schedule = opt_lib.schedule_from_config(cfg)
        base_step = ts_lib.make_train_step(
            embedding_model, prediction_model, schedule, update_fn,
            device_photometric={
                'mean': tuple(cfg.network.pixel_means),
                'std': tuple(cfg.network.pixel_stds),
                'geometric': {
                    'crop': crop, 'num_views': cfg.network.num_views,
                    'scale_min': float(cfg.train.get('scale_min', 0.5)),
                    'scale_max': float(cfg.train.get('scale_max', 1.5)),
                    'mirror_p': 0.5, 'ignore_index': 255},
            })
        step_fn_cache['fn'] = jax.jit(
            res_lib.make_resident_step(base_step, n_train, batch_images,
                                       mesh),
            donate_argnums=(0,))
        step_fn_cache['key'] = key
    step_fn = step_fn_cache['fn']
    state = mesh_lib.replicate(state, mesh)

    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    for it in range(steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, data, sub)
        if log_every and it % log_every == 0:
            print(f'[{log_prefix}] {it}/{steps}: loss='
                  f'{float(metrics["loss"]):.3f}', flush=True)
    train_s = time.time() - t0
    import jax
    return ({'params': jax.device_get(state.params),
             'batch_stats': jax.device_get(state.batch_stats)}, train_s)


def build_bank(cfg, embed_fn, cluster_fn, root, n_train, classes):
    """Prototype memory bank over the train split (majority GT labels)."""
    import jax.numpy as jnp
    from hsg_tpu.ops import common as ops_common
    from pyscripts import eval_common

    protos_all, labels_all = [], []
    mean = np.asarray(cfg.network.pixel_means)
    std = np.asarray(cfg.network.pixel_stds)
    for i in range(n_train):
        name = f'train_{i:05d}'
        img = np.asarray(Image.open(os.path.join(
            root, 'train/images', name + '.jpg')), np.float32) / 255
        sem = np.asarray(Image.open(os.path.join(
            root, 'train/segcls', name + '.png')), np.int32)
        img = (img - mean) / std
        image_np, (sem_r, _), (rh, rw) = eval_common.preprocess_image(
            img, sem, None, cfg)
        canvas, out = eval_common.compute_canvas_and_clusters(
            embed_fn, cluster_fn, image_np, rh, rw, cfg)
        seg_valid = np.asarray(out['segment_valid'][0])
        s = seg_valid.shape[0]
        pix_w = out['pixel_valid'][0].astype(jnp.float32)
        protos = ops_common.calculate_prototypes_from_labels(
            out['cluster_embedding'][0], out['cluster_index'][0], s, pix_w)
        h, w = canvas.shape[:2]
        sem_canvas = np.full((h, w), 255, np.int32)
        sem_canvas[:rh, :rw] = sem_r
        _, majority = ops_common.find_majority_label_index(
            jnp.asarray(sem_canvas).reshape(-1),
            out['cluster_index'][0], s, 256,
            valid=out['pixel_valid'][0])
        nseg = int(seg_valid.sum())
        protos_all.append(np.asarray(protos)[:nseg])
        labels_all.append(np.asarray(majority)[:nseg])
    memory = np.concatenate(protos_all)
    memory_labels = np.concatenate(labels_all)
    keep = memory_labels != 255
    return memory[keep], memory_labels[keep]


def eval_miou(cfg, embed_fn, cluster_fn, memory, memory_labels, root,
              n_val, classes):
    """Retrieval inference over the val split -> (mIoU %, pixel acc %)."""
    import jax
    import jax.numpy as jnp
    from hsg_tpu.data import transforms
    from hsg_tpu.eval import miou as miou_lib
    from hsg_tpu.losses import segsort as segsort_loss
    from hsg_tpu.ops import common as ops_common
    from pyscripts import eval_common

    memory = jnp.asarray(memory)
    memory_labels = jnp.asarray(memory_labels)

    @jax.jit
    def retrieve(cluster_embedding, cluster_index, pixel_valid, seg_valid,
                 memory, memory_labels):
        s = seg_valid.shape[0]
        protos = ops_common.calculate_prototypes_from_labels(
            cluster_embedding, cluster_index, s,
            pixel_valid.astype(jnp.float32))
        _, topk_labels = segsort_loss.top_k_ranking(
            protos, jnp.zeros((s,), jnp.int32), memory, memory_labels, 20)
        majority = segsort_loss.majority_label_from_topk(
            topk_labels, classes)
        return majority[cluster_index]

    mean = np.asarray(cfg.network.pixel_means)
    std = np.asarray(cfg.network.pixel_stds)
    stats = None
    for i in range(n_val):
        name = f'val_{i:05d}'
        img = np.asarray(Image.open(os.path.join(
            root, 'val/images', name + '.jpg')), np.float32) / 255
        gt = np.asarray(Image.open(os.path.join(
            root, 'val/segcls', name + '.png')), np.int32)
        img = (img - mean) / std
        image_np, _, (rh, rw) = eval_common.preprocess_image(
            img, None, None, cfg)
        canvas, out = eval_common.compute_canvas_and_clusters(
            embed_fn, cluster_fn, image_np, rh, rw, cfg)
        h, w = canvas.shape[:2]
        pred = retrieve(out['cluster_embedding'][0],
                        out['cluster_index'][0], out['pixel_valid'][0],
                        out['segment_valid'][0], memory, memory_labels)
        pred = np.asarray(pred).reshape(h, w)[:rh, :rw]
        pred = transforms._resize(pred.astype(np.uint8), gt.shape[1],
                                  gt.shape[0], nearest=True)
        s = miou_lib.iou_stats(pred, gt, classes)
        stats = s if stats is None else tuple(
            a + b for a, b in zip(stats, s))
    tp_fn, tp_fp, tp = stats
    iou = tp / np.maximum(tp_fn + tp_fp - tp, 1)
    return (float(iou.mean()) * 100,
            float(tp.sum() / np.maximum(tp_fn.sum(), 1)) * 100)
