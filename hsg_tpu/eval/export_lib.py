"""AOT serving export: one fixed-shape segment-retrieval inference fn.

The reference has no deployment story — its eval is a per-image Python
loop (reference pyscripts/inference/inference.py:111-252) that re-runs
eager torch per window. For serving, this module packages the whole
label-an-image pipeline (embed -> spherical k-means -> top-k retrieval
against a baked-in prototype memory -> majority vote -> per-pixel
labels) as ONE jitted, fixed-shape function and serializes it with
`jax.export` into a standalone artifact: the runtime that loads it needs
jax + the artifact file, not this package, its Flax model defs, or the
checkpoint/memory-bank files.

Shapes are static by construction (TPU-friendly): the input is a padded
`[crop_h, crop_w, 3]` normalized image plus its valid extent
`(valid_h, valid_w)` — exactly the eval scripts' resize-with-pad
contract (pyscripts/eval_common.preprocess_image). Images larger than
the crop should be tiled by the caller (sliding window) or exported at a
larger crop.
"""

from __future__ import annotations

import json
import os

import numpy as np


def make_serving_fn(model, variables, memory, memory_labels, config):
    """Builds `(image [ch,cw,3] f32, valid_h, valid_w) -> [ch,cw] uint8`.

    `image` is mean/std-normalized (the sidecar written by
    `export_serving` records the normalization constants). `memory` /
    `memory_labels` are baked into the exported graph as constants.
    Mirrors pyscripts/inference.py's single-window path: embeddings ->
    `generate_clusters` (padding marked ignore) -> prototypes -> top-20
    NN retrieval -> majority vote -> per-pixel gather (reference
    predictions/segsort.py:66-123).
    """
    import jax
    import jax.numpy as jnp

    from hsg_tpu.losses import segsort as segsort_loss
    from hsg_tpu.ops import common as ops_common

    crop_h, crop_w = (int(s) for s in config.test.crop_size)
    ignore = int(config.dataset.semantic_ignore_index)
    num_classes = int(config.dataset.num_classes)
    mem = jnp.asarray(memory, jnp.float32)
    mem_labels = jnp.asarray(memory_labels, jnp.int32)
    top_k = min(20, mem.shape[0])

    def fn(image, valid_h, valid_w):
        emb = model.apply(
            variables, image[None],
            method=lambda m, x: m.generate_embeddings(
                x, resize_as_input=True, train=False))['embedding']
        yy = jax.lax.broadcasted_iota(jnp.int32, (crop_h, crop_w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (crop_h, crop_w), 1)
        inside = (yy < valid_h) & (xx < valid_w)
        fake = jnp.where(inside, 0, ignore).astype(jnp.int32)
        out = model.apply(
            variables, emb, fake[None], fake[None],
            method=lambda m, e, s, i: m.generate_clusters(e, s, i))
        cluster_embedding = out['cluster_embedding'][0]
        cluster_index = out['cluster_index'][0]
        pixel_valid = out['pixel_valid'][0]
        num_segments = out['segment_valid'].shape[1]
        protos = ops_common.calculate_prototypes_from_labels(
            cluster_embedding, cluster_index, num_segments,
            pixel_valid.astype(jnp.float32))
        _, topk_labels = segsort_loss.top_k_ranking(
            protos, jnp.zeros((num_segments,), jnp.int32), mem, mem_labels,
            top_k)
        majority = segsort_loss.majority_label_from_topk(
            topk_labels, num_classes)
        pred = majority[cluster_index].reshape(crop_h, crop_w)
        return jnp.where(inside, pred, 0).astype(jnp.uint8)

    return fn


def export_serving(fn, example_args, path, platforms=None):
    """Serialize a jitted serving fn to `path` (+ returns the Exported).

    `platforms` lowers for several backends in one artifact (e.g.
    `('tpu', 'cpu')`) so the same file serves on TPU and on a CPU host.
    """
    import jax

    exported = jax.export.export(
        jax.jit(fn), platforms=platforms)(*example_args)
    with open(path, 'wb') as f:
        f.write(exported.serialize())
    return exported


def write_sidecar(path, config, memory_size, serve_batch=0):
    """Client-facing metadata next to the artifact (preprocessing

    contract: resize larger side to image_size, pad to crop, normalize).
    `serve_batch` > 0 records that a vmapped `serving_batch.bin`
    companion artifact with that fixed window-batch size exists."""
    meta = {
        'crop_size': [int(s) for s in config.test.crop_size],
        'image_size': int(config.test.image_size),
        'pixel_means': [float(v) for v in config.network.pixel_means],
        'pixel_stds': [float(v) for v in config.network.pixel_stds],
        'num_classes': int(config.dataset.num_classes),
        'embedding_dim': int(config.network.embedding_dim),
        'kmeans_num_clusters': [int(v) for v in
                                config.network.kmeans_num_clusters],
        'memory_prototypes': int(memory_size),
        'input': '(image[crop_h,crop_w,3] f32 normalized, valid_h i32, '
                 'valid_w i32) -> labels[crop_h,crop_w] u8',
    }
    if serve_batch:
        meta['serve_batch'] = int(serve_batch)
        meta['batch_input'] = (
            f'(image[{int(serve_batch)},crop_h,crop_w,3] f32 normalized, '
            f'valid_h i32[N], valid_w i32[N]) -> labels[N,crop_h,crop_w] u8')
    with open(path, 'w') as f:
        json.dump(meta, f, indent=2)
    return meta


def load_serving(path):
    """Deserialize an exported artifact -> callable (no model defs needed)."""
    import jax

    with open(path, 'rb') as f:
        data = f.read()
    exported = jax.export.deserialize(bytearray(data))
    return exported.call


__all__ = ['make_serving_fn', 'export_serving', 'write_sidecar',
           'load_serving']
