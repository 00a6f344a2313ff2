"""Superpixel-quality sensitivity sweep (round-2 VERDICT next-step #7).

Trains the stage-1 recipe on the SAME synthetic images under different
superpixel sources and reports end-to-end mIoU per source, quantifying
how much the offline contour-detector quality (SURVEY.md §2.7 /
reference tools/generate_se_owt_ucm.m:20-40 — the one 'partial'
component) actually matters:

  grid    uniform blocks, no image information at all
  local   watershed over local gradient strength (tools/
          generate_superpixels.py --no_globalize)
  spb     + spectral globalization (the shipped OWT-UCM analog)
  gt      class-aligned oversegmentation (an oracle contour detector)

Everything runs in ONE process so the jitted train/eval programs compile
once and are reused across variants (identical shapes).

Run on the chip: python tools/superpixel_sweep.py [--steps 3000]
Prints one JSON line per variant plus a summary table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_dataset(root, n_train=128, n_val=48, train_hw=(128, 128),
                  val_hw=(256, 256), classes=19, seed=0):
    from tools.make_synthetic_dataset import make_split
    rng = np.random.default_rng(seed)
    palette = rng.uniform(0.05, 0.95, size=(classes, 3))
    make_split(root, 'train', n_train, train_hw, classes, palette,
               (8, 8), 8, seed + 1)
    make_split(root, 'val', n_val, val_hw, classes, palette,
               (16, 16), 8, seed + 2, superpixel=False)


def superpixel_variants(root, n_train, max_segments=48):
    """Returns {variant: [superpixel map per image]} over the train split."""
    from tools.generate_superpixels import generate
    out = {'grid': [], 'local': [], 'spb': [], 'gt': []}
    for i in range(n_train):
        name = f'train_{i:05d}'
        img = np.asarray(Image.open(
            os.path.join(root, 'train/images', name + '.jpg')),
            np.float32) / 255.0
        gt_sp = np.asarray(Image.open(
            os.path.join(root, 'train/superpixel', name + '.png')),
            np.int32)
        h, w = img.shape[:2]
        gy = np.minimum(np.arange(h) * 7 // h, 6)
        gx = np.minimum(np.arange(w) * 7 // w, 6)
        out['grid'].append((gy[:, None] * 7 + gx[None, :]).astype(np.int32))
        out['gt'].append(gt_sp)

        out['local'].append(generate(img, max_segments, globalize=False))
        out['spb'].append(generate(img, max_segments, globalize=True))
        if (i + 1) % 32 == 0:
            print(f'superpixels {i + 1}/{n_train}', flush=True)
    return out


def sweep_config(classes):
    from hsg_tpu.config import default_config
    cfg = default_config()
    cfg.network.backbone_types = 'fcn_50'
    cfg.network.prediction_types = 'hsg'
    cfg.network.embedding_dim = 128
    cfg.network.label_divisor = 2048
    cfg.network.kmeans_num_clusters = (1, 1)
    cfg.network.kmeans_iterations = 1
    cfg.network.max_segments_per_view = 64
    cfg.network.num_views = 2
    cfg.network.compute_dtype = 'bfloat16'
    cfg.dataset.num_classes = classes
    cfg.dataset.semantic_ignore_index = 255
    cfg.train.img_sim_loss_types = 'segsort'
    cfg.train.img_sim_concentration = 16
    cfg.train.img_sim_loss_weight = 1.0
    cfg.train.nca_impl = 'auto'
    cfg.train.base_lr = 0.1
    cfg.train.lr_policy = 'step'
    cfg.train.warmup_iteration = 100
    cfg.train.weight_decay = 1e-4
    cfg.train.momentum = 0.9
    cfg.train.crop_size = (96, 96)
    cfg.test.image_size = 256
    cfg.test.crop_size = (256, 256)
    cfg.test.stride = (256, 256)
    return cfg


def stage_raw(root, n_train, hw):
    imgs = np.zeros((n_train, hw[0], hw[1], 3), np.uint8)
    for i in range(n_train):
        name = f'train_{i:05d}'
        imgs[i] = np.asarray(Image.open(
            os.path.join(root, 'train/images', name + '.jpg')), np.uint8)
    true_hw = np.full((n_train, 2), (hw[0], hw[1]), np.int32)
    return imgs, true_hw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/sp_sweep')
    ap.add_argument('--steps', type=int, default=3000)
    ap.add_argument('--n_train', type=int, default=128)
    ap.add_argument('--n_val', type=int, default=48)
    ap.add_argument('--batch_images', type=int, default=16)
    ap.add_argument('--variants', default='grid,local,spb,gt')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from hsg_tpu.eval import miou as miou_lib
    from hsg_tpu.losses import segsort as segsort_loss
    from hsg_tpu.ops import common as ops_common
    from hsg_tpu.parallel import mesh as mesh_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import resident as res_lib
    from hsg_tpu.train import train_step as ts_lib
    from pyscripts import eval_common
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model, head_multipliers)

    classes = 19
    train_hw, val_hw = (128, 128), (256, 256)
    if not os.path.exists(os.path.join(args.root, 'val.txt')):
        build_dataset(args.root, args.n_train, args.n_val, train_hw,
                      val_hw, classes)
    variants = superpixel_variants(args.root, args.n_train)

    cfg = sweep_config(classes)
    cfg.train.max_iteration = args.steps
    imgs, true_hw = stage_raw(args.root, args.n_train, train_hw)

    embedding_model = build_embedding_model(cfg)
    prediction_model = build_prediction_model(cfg)
    crop = cfg.train.crop_size[0]
    rows = args.batch_images * 2
    init_batch = {
        'image': np.zeros((rows, crop, crop, 3), np.float32),
        'semantic_label': np.zeros((rows, crop, crop), np.int32),
        'instance_label': np.zeros((rows, crop, crop), np.int32),
    }
    schedule = opt_lib.schedule_from_config(cfg)
    mesh = mesh_lib.create_mesh(1)
    base_step = None
    step_fn = None

    # Eval model/programs are built ONCE with the eval clustering knobs
    # (the flax modules capture config values at construction).
    cfg.network.kmeans_num_clusters = (6, 6)
    cfg.network.kmeans_iterations = 10
    test_model = build_embedding_model(cfg, test=True)
    results = {}
    for variant in args.variants.split(','):
        sp = np.stack([v.astype(np.uint16) for v in variants[variant]])
        data = jax.device_put({
            'image_raw': jnp.asarray(imgs),
            'instance_raw': jnp.asarray(sp),
            'true_hw': jnp.asarray(true_hw),
        }, mesh_lib.replicated(mesh))

        hw_mult, hb_mult = head_multipliers(cfg)
        state, update_fn = ts_lib.create_train_state(
            embedding_model, jax.random.PRNGKey(0), init_batch,
            head_weight_mult=hw_mult, head_bias_mult=hb_mult,
            momentum=cfg.train.momentum,
            weight_decay=cfg.train.weight_decay)
        if step_fn is None:
            base_step = ts_lib.make_train_step(
                embedding_model, prediction_model, schedule, update_fn,
                device_photometric={
                    'mean': tuple(cfg.network.pixel_means),
                    'std': tuple(cfg.network.pixel_stds),
                    'geometric': {'crop': crop, 'num_views': 2,
                                  'scale_min': 0.5, 'scale_max': 1.5,
                                  'mirror_p': 0.5, 'ignore_index': 255},
                })
            step_fn = jax.jit(
                res_lib.make_resident_step(base_step, args.n_train,
                                           args.batch_images, mesh),
                donate_argnums=(0,))
        state = mesh_lib.replicate(state, mesh)

        rng = jax.random.PRNGKey(42)
        t0 = time.time()
        for it in range(args.steps):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, data, sub)
            if it % 500 == 0:
                print(f'[{variant}] {it}: loss='
                      f'{float(metrics["loss"]):.3f}', flush=True)
        train_s = time.time() - t0

        # ---- eval: prototype bank over train, retrieval on val ----
        variables = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        embed_fn = eval_common.make_embed_fn(test_model, variables)
        cluster_fn = eval_common.make_cluster_fn(test_model, variables)

        protos_all, labels_all = [], []
        for i in range(args.n_train):
            name = f'train_{i:05d}'
            img = np.asarray(Image.open(os.path.join(
                args.root, 'train/images', name + '.jpg')), np.float32) / 255
            sem = np.asarray(Image.open(os.path.join(
                args.root, 'train/segcls', name + '.png')), np.int32)
            img = (img - np.asarray(cfg.network.pixel_means)) / np.asarray(
                cfg.network.pixel_stds)
            image_np, (sem_r, _), (rh, rw) = eval_common.preprocess_image(
                img, sem, None, cfg)
            canvas, out = eval_common.compute_canvas_and_clusters(
                embed_fn, cluster_fn, image_np, rh, rw, cfg)
            seg_valid = np.asarray(out['segment_valid'][0])
            s = seg_valid.shape[0]
            pix_w = out['pixel_valid'][0].astype(jnp.float32)
            protos = ops_common.calculate_prototypes_from_labels(
                out['cluster_embedding'][0], out['cluster_index'][0], s,
                pix_w)
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
        memory = jnp.asarray(memory[keep])
        memory_labels = jnp.asarray(memory_labels[keep])

        @jax.jit
        def retrieve(cluster_embedding, cluster_index, pixel_valid,
                     seg_valid, memory, memory_labels):
            s = seg_valid.shape[0]
            protos = ops_common.calculate_prototypes_from_labels(
                cluster_embedding, cluster_index, s,
                pixel_valid.astype(jnp.float32))
            _, topk_labels = segsort_loss.top_k_ranking(
                protos, jnp.zeros((s,), jnp.int32), memory, memory_labels,
                20)
            majority = segsort_loss.majority_label_from_topk(
                topk_labels, classes)
            return majority[cluster_index]

        stats = None
        for i in range(args.n_val):
            name = f'val_{i:05d}'
            img = np.asarray(Image.open(os.path.join(
                args.root, 'val/images', name + '.jpg')), np.float32) / 255
            gt = np.asarray(Image.open(os.path.join(
                args.root, 'val/segcls', name + '.png')), np.int32)
            img = (img - np.asarray(cfg.network.pixel_means)) / np.asarray(
                cfg.network.pixel_stds)
            image_np, _, (rh, rw) = eval_common.preprocess_image(
                img, None, None, cfg)
            canvas, out = eval_common.compute_canvas_and_clusters(
                embed_fn, cluster_fn, image_np, rh, rw, cfg)
            h, w = canvas.shape[:2]
            pred = retrieve(out['cluster_embedding'][0],
                            out['cluster_index'][0],
                            out['pixel_valid'][0],
                            out['segment_valid'][0], memory, memory_labels)
            pred = np.asarray(pred).reshape(h, w)[:rh, :rw]
            from hsg_tpu.data import transforms
            pred = transforms._resize(pred.astype(np.uint8), gt.shape[1],
                                      gt.shape[0], nearest=True)
            s = miou_lib.iou_stats(pred, gt, classes)
            stats = s if stats is None else tuple(
                a + b for a, b in zip(stats, s))
        tp_fn, tp_fp, tp = stats
        iou = tp / np.maximum(tp_fn + tp_fp - tp, 1)
        miou = float(iou.mean()) * 100
        acc = float(tp.sum() / np.maximum(tp_fn.sum(), 1)) * 100
        results[variant] = {'miou': round(miou, 2),
                            'pixel_acc': round(acc, 2),
                            'train_s': round(train_s, 1)}
        print(json.dumps({'variant': variant, **results[variant]}),
              flush=True)

    print('\n== superpixel sweep summary ==')
    for v, r in results.items():
        print(f'  {v:<6s} mIoU {r["miou"]:6.2f}  acc {r["pixel_acc"]:6.2f}')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
