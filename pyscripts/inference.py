"""Inference: label test images by NN retrieval against the memory bank.

Capability parity with reference `pyscripts/inference/inference.py`:
sliding-window embeddings -> per-image k-means -> per-segment top-20
retrieval against the memory prototypes -> majority vote -> per-pixel
predictions saved as grayscale + colorized PNGs at original resolution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    from pyscripts.common import parse_args, build_embedding_model
    args, config = parse_args('Inference for semantic segmentation.')

    import jax
    import jax.numpy as jnp
    from hsg_tpu.data import transforms
    from hsg_tpu.data.dataset import ListDataset
    from hsg_tpu.eval import memory_bank
    from hsg_tpu.train import checkpoint as ckpt_lib
    from hsg_tpu.utils import vis
    from pyscripts import eval_common

    semantic_dir = os.path.join(args.save_dir, 'semantic_gray')
    semantic_rgb_dir = os.path.join(args.save_dir, 'semantic_color')
    for d in (semantic_dir, semantic_rgb_dir):
        os.makedirs(d, exist_ok=True)
    color_map = vis.load_color_map(config.dataset.color_map_path or None)

    k = int(np.prod(config.network.kmeans_num_clusters))
    config.network.max_segments_per_view = max(
        config.network.max_segments_per_view, k)

    dataset = ListDataset(
        args.data_dir or config.dataset.data_dir,
        args.data_list or config.dataset.test_data_list,
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

    # Memory bank, with ignore-labeled prototypes dropped
    # (inference.py:96-108).
    assert args.semantic_memory_dir, '--semantic_memory_dir required'
    memory, memory_labels = memory_bank.load_memory_banks(
        args.semantic_memory_dir)
    keep = memory_labels != config.dataset.semantic_ignore_index
    memory = jnp.asarray(memory[keep])
    memory_labels = jnp.asarray(memory_labels[keep])

    retrieve = eval_common.make_retrieve_fn(config, memory, memory_labels)

    n = len(dataset)
    if args.num_images:
        n = min(n, args.num_images)
    todo = list(range(n))
    if args.skip_existing:
        def _load_png(p):
            Image.open(p).load()

        def artifact_paths(i):
            base = os.path.basename(dataset.image_paths[i])
            stem = os.path.splitext(base)[0]
            return [(os.path.join(semantic_dir, stem + '.png'), _load_png),
                    (os.path.join(semantic_rgb_dir, stem + '.png'),
                     _load_png)]

        todo = eval_common.filter_existing(todo, artifact_paths)

    import json

    def save_pred(pred, orig_w, orig_h, base):
        pred = transforms._resize(pred, orig_w, orig_h, nearest=True)
        Image.fromarray(pred, mode='L').save(
            os.path.join(semantic_dir, base))
        Image.fromarray(vis.convert_label_to_color(pred, color_map)).save(
            os.path.join(semantic_rgb_dir, base))

    def process(pos, idx, inputs, labels, submit):
        orig_h, orig_w = inputs['image'].shape[:2]
        base = os.path.basename(dataset.image_paths[idx])
        base = os.path.splitext(base)[0] + '.png'

        image_np, _, (rh, rw) = eval_common.preprocess_image(
            inputs['image'], None, None, config)
        scales = [s for s in config.test.get('scales', (0,)) if s]
        use_flip = bool(config.test.get('flip', False))
        if scales and (scales != [1.0] or use_flip):
            canvas, out = eval_common.compute_canvas_tta(
                embed_fn, cluster_fn, image_np, rh, rw, config,
                scales, use_flip)
        else:
            canvas, out = eval_common.compute_canvas_and_clusters(
                embed_fn, cluster_fn, image_np, rh, rw, config)
        h, w = canvas.shape[:2]

        pred = retrieve(out['cluster_embedding'][0], out['cluster_index'][0],
                        out['pixel_valid'][0], out['segment_valid'][0])
        pred = np.asarray(pred).reshape(h, w)[:rh, :rw].astype(np.uint8)
        submit(save_pred, pred, orig_w, orig_h, base)

    t = eval_common.eval_image_loop(dataset, todo, process,
                                    'predictions saved')
    if todo:
        print(json.dumps({
            'images': t['images'], 'wall_s': round(t['wall_s'], 1),
            'img_per_s': round(t['images'] / t['wall_s'], 2),
            'host_load_s': round(t['host_load_s'], 1),
            'device_s': round(t['device_s'], 1),
        }), flush=True)


if __name__ == '__main__':
    main()
