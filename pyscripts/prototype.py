"""Builds the prototype memory bank from the training split.

Capability parity with reference `pyscripts/inference/prototype.py`:
sliding-window embeddings -> per-image k-means -> segment prototypes +
majority ground-truth labels -> one `.npy` per image (plus cluster-index
and colorized PNGs). This is where training-set GT enters the evaluation
protocol (SURVEY.md §3.3).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    from pyscripts.common import parse_args, build_embedding_model
    args, config = parse_args('Inference for generating memory banks.')

    import jax
    import jax.numpy as jnp
    from hsg_tpu.data.dataset import ListDataset
    from hsg_tpu.eval import memory_bank
    from hsg_tpu.ops import common as ops_common
    from hsg_tpu.train import checkpoint as ckpt_lib
    from hsg_tpu.utils import vis
    from pyscripts import eval_common

    prototype_dir = os.path.join(args.save_dir, 'semantic_prototype')
    cluster_dir = os.path.join(args.save_dir, 'semantic_cluster')
    cluster_rgb_dir = os.path.join(args.save_dir, 'semantic_color')
    for d in (prototype_dir, cluster_dir, cluster_rgb_dir):
        os.makedirs(d, exist_ok=True)
    color_map = vis.load_color_map(config.dataset.color_map_path or None)

    # Segment cap must cover the k-means cluster count at eval.
    k = int(np.prod(config.network.kmeans_num_clusters))
    config.network.max_segments_per_view = max(
        config.network.max_segments_per_view, k)

    dataset = ListDataset(
        args.data_dir or config.dataset.data_dir,
        args.data_list or config.dataset.train_data_list,
        img_mean=config.network.pixel_means,
        img_std=config.network.pixel_stds,
        size=None, training=False)

    model = build_embedding_model(config, test=True)
    step = ckpt_lib.latest_step(args.snapshot_dir)
    assert step is not None, f'no checkpoint in {args.snapshot_dir}'
    variables = ckpt_lib.restore_variables(args.snapshot_dir, step)
    # Shard the window batch over all local devices (linear val-set
    # scaling over ICI; no-op on one chip — see eval_common.make_embed_fn).
    # Eval scripts are single-process: use local devices so a stray
    # jax.distributed context can't hand us a multi-process global mesh
    # that host-local numpy arrays couldn't feed.
    eval_mesh = None
    if len(jax.local_devices()) > 1 and jax.process_count() == 1:
        from hsg_tpu.parallel import mesh as mesh_lib
        eval_mesh = mesh_lib.create_mesh(len(jax.local_devices()))
        print(f'eval: sharding windows over {eval_mesh.size} devices')
    embed_fn = eval_common.make_embed_fn(model, variables, mesh=eval_mesh)
    cluster_fn = eval_common.make_cluster_fn(model, variables)

    n = len(dataset)
    if args.num_images:
        n = min(n, args.num_images)
    todo = list(range(n))
    if args.skip_existing:
        def _load_npy(p):
            np.load(p, allow_pickle=True)

        def _load_png(p):
            Image.open(p).load()

        def artifact_paths(idx):
            base = os.path.basename(dataset.image_paths[idx])
            stem = os.path.splitext(base)[0]
            return [(os.path.join(prototype_dir, stem + '.npy'), _load_npy),
                    (os.path.join(cluster_dir, stem + '.png'), _load_png),
                    (os.path.join(cluster_rgb_dir, stem + '.png'),
                     _load_png)]

        todo = eval_common.filter_existing(todo, artifact_paths)

    def save_outputs(base, protos_np, majority_np, num_segments,
                     cluster_index):
        memory_bank.save_memory_bank(
            os.path.join(prototype_dir, base.replace('.png', '.npy')),
            protos_np[:num_segments], majority_np[:num_segments])
        Image.fromarray(cluster_index.astype(np.uint16)).save(
            os.path.join(cluster_dir, base))
        Image.fromarray(
            vis.convert_label_to_color(cluster_index % 256,
                                       color_map)).save(
            os.path.join(cluster_rgb_dir, base))

    def process(pos, idx, inputs, labels, submit):
        base = os.path.basename(dataset.image_paths[idx])
        base = os.path.splitext(base)[0] + '.png'

        image_np, (sem_np, inst_np), (rh, rw) = eval_common.preprocess_image(
            inputs['image'], labels['semantic_label'],
            labels['instance_label'], config)
        canvas, out = eval_common.compute_canvas_and_clusters(
            embed_fn, cluster_fn, image_np, rh, rw, config)

        seg_valid = np.asarray(out['segment_valid'][0])
        num_segments = int(seg_valid.sum())
        s = seg_valid.shape[0]

        # Prototypes over valid pixels.
        pix_w = out['pixel_valid'][0].astype(jnp.float32)
        protos = ops_common.calculate_prototypes_from_labels(
            out['cluster_embedding'][0], out['cluster_index'][0], s, pix_w)

        # Majority GT label per segment (prototype.py:199-202). 256 classes
        # statically covers semantic ids incl. the 255 ignore label, which
        # inference later drops (inference.py:96-108).
        h, w = canvas.shape[:2]
        sem_canvas = np.full((h, w), config.dataset.semantic_ignore_index,
                             np.int32)
        sem_canvas[:rh, :rw] = sem_np
        _, majority = ops_common.find_majority_label_index(
            jnp.asarray(sem_canvas).reshape(-1),
            out['cluster_index'][0], s, 256,
            valid=out['pixel_valid'][0])

        cluster_index = np.asarray(
            out['cluster_index'][0]).reshape(h, w)[:rh, :rw]
        submit(save_outputs, base, np.asarray(protos), np.asarray(majority),
               num_segments, cluster_index)

    t = eval_common.eval_image_loop(dataset, todo, process,
                                    'prototypes saved')
    if todo:
        import json
        print(f'prototype: {t["images"]} images in {t["wall_s"]:.1f}s '
              f'({t["images"] / t["wall_s"]:.2f} img/s)', flush=True)
        print(json.dumps({
            'images': t['images'], 'wall_s': round(t['wall_s'], 1),
            'img_per_s': round(t['images'] / t['wall_s'], 2),
            'host_load_s': round(t['host_load_s'], 1),
            'device_s': round(t['device_s'], 1),
        }), flush=True)


if __name__ == '__main__':
    main()
