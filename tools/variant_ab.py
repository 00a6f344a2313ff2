"""hsg vs hsg_cs quality A/B on the synthetic benchmark (VERDICT #5).

The `_cs` variant differs from `hsg` in exactly two ways (reference
resnet_fcn_hsg_cs.py:499-502,1061-1064 + predictions/hsg_cs.py): the
clustering-transformer heads train at x1/x2 LR multipliers instead of
x10/x20, and DMoN runs without the per-view K-NN graph restriction. This
tool trains both variants on the SAME synthetic data/schedule and
reports end-to-end mIoU for each, giving the `_cs` path its first
quality datapoint (round 2 only rehearsed its step time).

Run on the chip:  python tools/variant_ab.py [--steps 6000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def ab_config(classes, steps, variant):
    from hsg_tpu.config import default_config
    cfg = default_config()
    cfg.network.backbone_types = f'fcn_50_{variant}'
    cfg.network.prediction_types = variant
    cfg.network.embedding_dim = 128
    cfg.network.label_divisor = 2048
    cfg.network.kmeans_num_clusters = (2, 2)
    cfg.network.kmeans_iterations = 10
    cfg.network.max_segments_per_view = 64
    cfg.network.num_views = 2
    cfg.network.compute_dtype = 'bfloat16'
    cfg.dataset.num_classes = classes
    cfg.dataset.semantic_ignore_index = 255
    # Cityscapes-recipe loss set/weights (configs/cityscapes.yaml).
    cfg.train.img_sim_loss_types = 'segsort'
    cfg.train.img_sim_concentration = 16
    cfg.train.img_sim_loss_weight = 1.0
    cfg.train.fine_hrchy_loss_types = 'segsort'
    cfg.train.fine_hrchy_concentration = 16
    cfg.train.fine_hrchy_loss_weight = 0.1
    cfg.train.coarse_hrchy_loss_types = 'segsort'
    cfg.train.coarse_hrchy_concentration = 16
    cfg.train.coarse_hrchy_loss_weight = 0.1
    cfg.train.dmon_loss_types = 'dmon'
    cfg.train.dmon_knn = 4
    cfg.train.dmon_loss_weight = 0.2
    cfg.train.centroid_cont_loss_types = 'segsort'
    cfg.train.centroid_cont_concentration = 16
    cfg.train.centroid_cont_loss_weight = 0.2
    cfg.train.fine_hrchy_clusters = 8
    cfg.train.coarse_hrchy_clusters = 4
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
    ap.add_argument('--steps', type=int, default=6000)
    ap.add_argument('--n_train', type=int, default=128)
    ap.add_argument('--n_val', type=int, default=48)
    ap.add_argument('--batch_images', type=int, default=16)
    args = ap.parse_args()

    from pyscripts import eval_common
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model)
    from tools import synth_harness as H
    from tools.superpixel_sweep import build_dataset

    classes = 19
    train_hw, val_hw = (128, 128), (256, 256)
    if not os.path.exists(os.path.join(args.root, 'val.txt')):
        build_dataset(args.root, args.n_train, args.n_val, train_hw,
                      val_hw, classes)
    imgs, true_hw = H.load_split_raw(args.root, 'train', args.n_train,
                                     train_hw)
    sp = np.stack([np.asarray(Image.open(os.path.join(
        args.root, 'train/superpixel', f'train_{i:05d}.png')), np.int32)
        for i in range(args.n_train)])

    results = {}
    for variant in ('hsg', 'hsg_cs'):
        cfg = ab_config(classes, args.steps, variant)
        embedding_model = build_embedding_model(cfg)
        prediction_model = build_prediction_model(cfg)
        cfg.network.kmeans_num_clusters = (6, 6)
        cfg.network.kmeans_iterations = 10
        test_model = build_embedding_model(cfg, test=True)
        cfg.network.kmeans_num_clusters = (2, 2)
        cfg.network.kmeans_iterations = 10

        cache = {}  # separate compile per variant (different models)
        variables, train_s = H.train_resident(
            cfg, embedding_model, prediction_model, cache,
            imgs, sp, true_hw, args.steps, args.batch_images,
            log_prefix=variant)
        cfg.network.kmeans_num_clusters = (6, 6)
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

    print('\n== hsg vs hsg_cs ==')
    for v, r in results.items():
        print(f'  {v:<7s} mIoU {r["miou"]:6.2f}  acc {r["pixel_acc"]:6.2f}')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
