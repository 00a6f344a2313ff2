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
  pmi     PMI crisp-boundaries detector + globalization (the
          generate_pmi_owt_ucm.m analog)
  se      trained contour CNN + globalization (the generate_se_owt_ucm.m
          analog; needs artifacts/edge_detector/params.npz — pass
          --variants grid,local,spb,pmi,se,gt to include it)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_dataset(root, n_train, n_val, train_hw, val_hw, classes, seed=0):
    from tools.make_synthetic_dataset import make_split
    rng = np.random.default_rng(seed)
    palette = rng.uniform(0.05, 0.95, size=(classes, 3))
    make_split(root, 'train', n_train, train_hw, classes, palette,
               (8, 8), 8, seed + 1)
    make_split(root, 'val', n_val, val_hw, classes, palette,
               (16, 16), 8, seed + 2, superpixel=False)


def cap_class_aligned(sp, sem, max_segments):
    """Reduce a class-aligned oversegmentation to <= max_segments by
    merging the smallest same-class segments — class purity (the oracle
    property) is preserved exactly, only granularity is reduced. Without
    this the 'gt' variant silently loses every segment past the model's
    static cap, scoring WORSE than learned detectors."""
    ids, counts = np.unique(sp, return_counts=True)
    if len(ids) <= max_segments:
        return sp
    seg_class = {s: int(np.bincount(sem[sp == s].reshape(-1)).argmax())
                 for s in ids}
    by_class: dict = {}
    for s, c in seg_class.items():
        by_class.setdefault(c, []).append(s)
    sizes = dict(zip(ids.tolist(), counts.tolist()))
    remap = {s: s for s in ids.tolist()}
    n = len(ids)
    while n > max_segments:
        # Merge the two smallest segments of the most-fragmented class.
        c = max(by_class, key=lambda k: len(by_class[k]))
        if len(by_class[c]) < 2:
            break
        by_class[c].sort(key=lambda s: sizes[s])
        a, b = by_class[c][0], by_class[c][1]
        by_class[c] = by_class[c][1:]
        sizes[b] += sizes.pop(a)
        for s, t in remap.items():
            if t == a:
                remap[s] = b
        n -= 1
    out = sp.copy()
    for s, t in remap.items():
        if s != t:
            out[sp == s] = t
    _, out = np.unique(out, return_inverse=True)
    return out.reshape(sp.shape).astype(np.int32)


def superpixel_variants(root, n_train, max_segments=48, wanted=None):
    """{variant: [B, H, W] superpixel maps} over the train split."""
    from tools.generate_superpixels import generate
    out = {'grid': [], 'local': [], 'spb': [], 'pmi': [], 'se': [],
           'gt': []}
    if wanted:
        out = {k: v for k, v in out.items() if k in wanted}
    for i in range(n_train):
        name = f'train_{i:05d}'
        img = np.asarray(Image.open(
            os.path.join(root, 'train/images', name + '.jpg')),
            np.float32) / 255.0
        sem = np.asarray(Image.open(
            os.path.join(root, 'train/segcls', name + '.png')), np.int32)
        h, w = img.shape[:2]
        gy = np.minimum(np.arange(h) * 7 // h, 6)
        gx = np.minimum(np.arange(w) * 7 // w, 6)
        if 'grid' in out:
            out['grid'].append(
                (gy[:, None] * 7 + gx[None, :]).astype(np.int32))
        if 'gt' in out:
            # The oracle capping merge loop is expensive; only pay for it
            # when the gt variant was actually requested.
            out['gt'].append(cap_class_aligned(np.asarray(Image.open(
                os.path.join(root, 'train/superpixel', name + '.png')),
                np.int32), sem, max_segments))
        if 'local' in out:
            out['local'].append(generate(img, max_segments,
                                         globalize=False))
        if 'spb' in out:
            out['spb'].append(generate(img, max_segments, globalize=True))
        if 'pmi' in out:
            out['pmi'].append(generate(img, max_segments, globalize=True,
                                       detector='pmi'))
        if 'se' in out:
            out['se'].append(generate(img, max_segments, globalize=True,
                                      detector='se'))
        if (i + 1) % 32 == 0:
            print(f'superpixels {i + 1}/{n_train}', flush=True)
    return {k: np.stack(v) for k, v in out.items()}


def sweep_config(classes, steps):
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
    cfg.train.base_lr = 0.1
    cfg.train.lr_policy = 'step'
    cfg.train.max_iteration = steps
    cfg.train.warmup_iteration = 100
    cfg.train.weight_decay = 1e-4
    cfg.train.momentum = 0.9
    cfg.train.crop_size = (96, 96)
    cfg.test.image_size = 256
    cfg.test.crop_size = (256, 256)
    cfg.test.stride = (256, 256)
    return cfg


def main():
    from pyscripts.common import _apply_platform_override
    _apply_platform_override()   # HSG_TPU_PLATFORM=cpu for smokes
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/sp_sweep')
    ap.add_argument('--steps', type=int, default=3000)
    ap.add_argument('--n_train', type=int, default=128)
    ap.add_argument('--n_val', type=int, default=48)
    ap.add_argument('--batch_images', type=int, default=16)
    ap.add_argument('--variants', default='grid,local,spb,pmi,gt')
    args = ap.parse_args()

    # Latch the training backend BEFORE any superpixel generation: the
    # 'se' variant's detector defensively forces jax onto CPU when it
    # initializes jax first (so the offline CLI never grabs the chip),
    # which would silently move this sweep's 3000-step trainings to CPU.
    import jax
    jax.devices()

    from pyscripts import eval_common
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model)
    from tools import synth_harness as H

    classes = 19
    train_hw, val_hw = (128, 128), (256, 256)
    if not os.path.exists(os.path.join(args.root, 'val.txt')):
        build_dataset(args.root, args.n_train, args.n_val, train_hw,
                      val_hw, classes)
    variants = superpixel_variants(args.root, args.n_train,
                                   wanted=set(args.variants.split(',')))
    imgs, true_hw = H.load_split_raw(args.root, 'train', args.n_train,
                                     train_hw)

    cfg = sweep_config(classes, args.steps)
    embedding_model = build_embedding_model(cfg)
    prediction_model = build_prediction_model(cfg)
    # Eval programs are built once with the eval clustering knobs (the
    # flax modules capture config values at construction).
    cfg.network.kmeans_num_clusters = (6, 6)
    cfg.network.kmeans_iterations = 10
    test_model = build_embedding_model(cfg, test=True)

    cache = {}
    results = {}
    for variant in args.variants.split(','):
        variables, train_s = H.train_resident(
            cfg, embedding_model, prediction_model, cache,
            imgs, variants[variant], true_hw, args.steps,
            args.batch_images, log_prefix=variant)
        embed_fn = eval_common.make_embed_fn(test_model, variables)
        cluster_fn = eval_common.make_cluster_fn(test_model, variables)
        memory, memory_labels = H.build_bank(
            cfg, embed_fn, cluster_fn, args.root, args.n_train, classes)
        miou, acc = H.eval_miou(cfg, embed_fn, cluster_fn, memory,
                                memory_labels, args.root, args.n_val,
                                classes)
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
