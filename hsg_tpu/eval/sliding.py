"""Sliding-window dense embedding inference.

Capability parity with the reference's patch loop
(pyscripts/inference/inference.py:160-207): the padded image is covered by
crop-size windows at the configured stride; per-window embeddings (bilinear
upsampled to window resolution and L2-normalized) are accumulated into a
full-resolution canvas and averaged by visit counts.

TPU-first: windows are batched into ONE `[num_windows, crop_h, crop_w, 3]`
model call (static shape -> single compiled program; the MXU sees one big
batch instead of a serialized per-window Python loop), and the
accumulation is a scatter-add on device.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from hsg_tpu.ops import common


def window_starts(image_size: int, crop: int, stride: int) -> np.ndarray:
    """End-aligned window grid, matching the reference's linspace of patch
    end indices (inference.py:162-167)."""
    n = int(math.ceil((image_size - crop) / stride)) + 1
    ends = np.linspace(crop, image_size, n).astype(np.int64)
    return ends - crop


def sliding_window_embeddings(embed_fn, image: jnp.ndarray,
                              crop_size, stride) -> jnp.ndarray:
    """Computes averaged full-resolution embeddings.

    Args:
      embed_fn: jittable `[N, ch, cw, 3] -> [N, ch, cw, C]` window embedder
        (already resized to input resolution and unnormalized).
      image: `[H, W, 3]` padded input (H >= crop_h, W >= crop_w).
      crop_size: (ch, cw) window size.
      stride: (sh, sw).

    Returns `[H, W, C]` L2-normalized averaged embeddings.
    """
    h, w, _ = image.shape
    ch, cw = crop_size
    ys = window_starts(h, ch, stride[0])
    xs = window_starts(w, cw, stride[1])
    windows = []
    coords = []
    for y in ys:
        for x in xs:
            windows.append(image[y:y + ch, x:x + cw])
            coords.append((int(y), int(x)))
    batch = jnp.stack(windows)                     # [N, ch, cw, 3]
    embs = embed_fn(batch)                         # [N, ch, cw, C]
    embs = common.normalize_embedding(embs)

    c = embs.shape[-1]
    # Accumulators follow the embedding dtype (f32 in production; the f64
    # reference-parity run must not round the canvas through f32).
    acc_dtype = jnp.promote_types(jnp.float32, embs.dtype)
    canvas = jnp.zeros((h, w, c), acc_dtype)
    counts = jnp.zeros((h, w, 1), acc_dtype)
    for (y, x), e in zip(coords, embs):
        canvas = canvas.at[y:y + ch, x:x + cw].add(e)
        counts = counts.at[y:y + ch, x:x + cw].add(1.0)
    return canvas / jnp.maximum(counts, 1.0)
