"""Shared front-half of the eval scripts (prototype.py / inference.py).

Mirrors the reference's eval preprocessing (pyscripts/inference/
inference.py:111-217): resize the larger side to test.image_size, pad to
crop_size, sliding-window embeddings averaged into a full-resolution
canvas, then per-image k-means clustering with padding marked ignore.
"""

from __future__ import annotations

import numpy as np


def make_embed_fn(model, variables):
    """Jitted `[N, ch, cw, 3] -> [N, ch, cw, C]` window embedder
    (resize_as_input upsampling inside, unnormalized)."""
    import jax

    @jax.jit
    def fn(images):
        out = model.apply(
            variables, images,
            method=lambda m, x: m.generate_embeddings(
                x, resize_as_input=True, train=False))
        return out['embedding']

    return fn


def make_cluster_fn(model, variables):
    """Jitted clustering of a full-resolution embedding canvas."""
    import jax

    @jax.jit
    def fn(embedding, semantic, instance):
        return model.apply(
            variables, embedding, semantic, instance,
            method=lambda m, e, s, i: m.generate_clusters(e, s, i))

    return fn


def preprocess_image(image_np, sem_np, inst_np, config):
    """Resize larger side + pad to crop. Returns (padded image, resized
    (sem, inst), (resize_h, resize_w))."""
    from hsg_tpu.data import transforms

    if config.test.image_size > 0:
        image_np = transforms.resize_with_interpolation(
            image_np, config.test.image_size)
        if sem_np is not None:
            sem_np = transforms.resize_with_interpolation(
                sem_np, config.test.image_size, nearest=True)
        if inst_np is not None:
            inst_np = transforms.resize_with_interpolation(
                inst_np, config.test.image_size, nearest=True)
    rh, rw = image_np.shape[:2]
    image_np = transforms.resize_with_pad(
        image_np, tuple(config.test.crop_size), 0)
    return image_np, (sem_np, inst_np), (rh, rw)


def compute_canvas_and_clusters(embed_fn, cluster_fn, image_np, rh, rw,
                                config):
    """Sliding-window embeddings + k-means on the padded canvas.

    Padding outside (rh, rw) is marked ignore so clustering matches the
    reference's fake-label scheme (inference.py:143-153).
    """
    import jax.numpy as jnp
    from hsg_tpu.eval import sliding

    image = jnp.asarray(image_np, jnp.float32)
    canvas = sliding.sliding_window_embeddings(
        embed_fn, image, tuple(config.test.crop_size),
        tuple(config.test.stride))
    h, w, _ = canvas.shape
    ignore = config.dataset.semantic_ignore_index
    fake_sem = np.full((h, w), ignore, np.int32)
    fake_sem[:rh, :rw] = 0
    fake_inst = fake_sem.copy()
    out = cluster_fn(canvas[None], jnp.asarray(fake_sem)[None],
                     jnp.asarray(fake_inst)[None])
    return canvas, out
