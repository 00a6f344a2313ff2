"""Export a trained snapshot + memory bank as a standalone serving artifact.

The reference ships no deployment path (its inference is the eager
per-image loop, reference pyscripts/inference/inference.py:111-252).
This packages the full label-an-image pipeline into one `jax.export`
artifact (see hsg_tpu/eval/export_lib.py): the serving host needs only
jax and the .bin file — no Flax model defs, checkpoint, or memory-bank
files.

Usage:
  python pyscripts/export.py \
      --snapshot_dir snapshots/run/stage2 \
      --semantic_memory_dir snapshots/run/stage2/results/train/semantic_prototype \
      --save_dir snapshots/run/stage2/serving \
      --kmeans_num_clusters 6,6 --label_divisor 2048 \
      --cfg_path snapshots/run/stage2/config.yaml [--platforms tpu,cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pyscripts.common import parse_args, build_embedding_model

    extra = [(('--platforms',),
              dict(type=str, default=None,
                   help='comma list of lowering platforms, e.g. tpu,cpu '
                        '(default: current backend only)')),
             (('--no_fold_bn',),
              dict(action='store_true',
                   help='skip folding BatchNorm running stats into conv '
                        'kernels before export (fold is exact math; it '
                        'shrinks the artifact, not TPU step time — XLA '
                        'already fuses eval-mode BN)')),
             (('--serve_batch',),
              dict(type=int, default=4,
                   help='also export serving_batch.bin, a vmapped '
                        'N-window variant for batched serving '
                        '(0 disables)'))]
    args, config = parse_args('Export a standalone serving artifact.',
                              extra_args=extra)

    import jax
    import jax.numpy as jnp
    from hsg_tpu.eval import export_lib, memory_bank
    from hsg_tpu.train import checkpoint as ckpt_lib

    k = int(np.prod(config.network.kmeans_num_clusters))
    config.network.max_segments_per_view = max(
        config.network.max_segments_per_view, k)

    model = build_embedding_model(config, test=True)
    step = ckpt_lib.latest_step(args.snapshot_dir)
    assert step is not None, f'no checkpoint in {args.snapshot_dir}'
    variables = ckpt_lib.restore_variables(args.snapshot_dir, step)
    ch, cw = (int(s) for s in config.test.crop_size)
    if not args.no_fold_bn:
        from hsg_tpu.models import fold as fold_lib
        # The snapshot may hold a richer train model (HSG transformer
        # heads) than the plain-FCN eval architecture; prune to the eval
        # model's structure before folding — the transformer BN1d layers
        # are not foldable and are not part of this model anyway.
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, ch, cw, 3), jnp.float32),
                               None, None, train=False))
        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), template)
        # Hard-fail on any eval-model leaf the checkpoint didn't provide
        # WITH A MATCHING SHAPE: partial_overlay only warns (and skips
        # shape-mismatched leaves), and a silently zero-initialized conv
        # would survive the artifact self-check below (which compares the
        # artifact against the same broken fn).
        from flax import traverse_util
        flat_tpl = traverse_util.flatten_dict(template)
        flat_ckpt = traverse_util.flatten_dict(variables)
        missing = sorted(
            '/'.join(map(str, p)) for p, leaf in flat_tpl.items()
            if p not in flat_ckpt
            or tuple(flat_ckpt[p].shape) != tuple(leaf.shape))
        assert not missing, (
            'checkpoint is missing (or shape-mismatches) eval-model '
            'parameters (refusing to export zero-initialized weights): '
            + ', '.join(missing))
        variables = ckpt_lib.partial_overlay(template, variables)
        model, variables = fold_lib.fold_inference(model, variables)

    assert args.semantic_memory_dir, '--semantic_memory_dir required'
    memory, memory_labels = memory_bank.load_memory_banks(
        args.semantic_memory_dir)
    keep = memory_labels != config.dataset.semantic_ignore_index
    memory, memory_labels = memory[keep], memory_labels[keep]

    os.makedirs(args.save_dir, exist_ok=True)
    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    config)
    example = (jnp.zeros((ch, cw, 3), jnp.float32),
               jnp.int32(ch), jnp.int32(cw))
    platforms = tuple(args.platforms.split(',')) if args.platforms else None
    artifact = os.path.join(args.save_dir, 'serving.bin')
    export_lib.export_serving(fn, example, artifact, platforms=platforms)
    meta = export_lib.write_sidecar(
        os.path.join(args.save_dir, 'serving.json'), config, memory.shape[0],
        serve_batch=args.serve_batch)

    if args.serve_batch:
        # Batched variant: one MXU-friendly dispatch for N windows
        # (vmap over the per-window fn; valid extents become per-window
        # vectors). serve.py chunks /label_batch requests through it.
        b = args.serve_batch
        batch_example = (jnp.zeros((b, ch, cw, 3), jnp.float32),
                         jnp.full((b,), ch, jnp.int32),
                         jnp.full((b,), cw, jnp.int32))
        export_lib.export_serving(
            jax.vmap(fn), batch_example,
            os.path.join(args.save_dir, 'serving_batch.bin'),
            platforms=platforms)

    # Self-check: the deserialized artifact must reproduce the direct
    # jitted fn on a random input.
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(ch, cw, 3)), jnp.float32)
    vh, vw = jnp.int32(ch * 3 // 4), jnp.int32(cw * 3 // 4)
    want = np.asarray(jax.jit(fn)(image, vh, vw))
    got = np.asarray(export_lib.load_serving(artifact)(image, vh, vw))
    assert (want == got).all(), 'deserialized artifact mismatch'
    size_mb = os.path.getsize(artifact) / 2**20
    print(f'exported {artifact} ({size_mb:.1f} MiB, '
          f'{meta["memory_prototypes"]} memory prototypes, '
          f'platforms={platforms or "current"}, '
          f'fold_bn={not args.no_fold_bn}); self-check OK')


if __name__ == '__main__':
    main()
