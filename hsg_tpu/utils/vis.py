"""Visualization: color maps, label colorization, embedding-to-RGB.

Capability parity with reference `hsg/utils/general/vis.py`: colormap
loading (the reference ships .mat colormaps in misc/; here .mat is
supported via scipy plus built-in generators so no binary assets are
needed), label colorization, and PCA projection of embeddings to RGB for
tensorboard panels.
"""

from __future__ import annotations

import numpy as np


def voc_color_map(n: int = 256) -> np.ndarray:
    """Standard Pascal VOC color map (bit-interleaving scheme), uint8."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        cid = i
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        cmap[i] = (r, g, b)
    return cmap


CITYSCAPES_COLORS = np.asarray([
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100),
    (0, 80, 100), (0, 0, 230), (119, 11, 32)], dtype=np.uint8)


def cityscapes_color_map(n: int = 256) -> np.ndarray:
    cmap = voc_color_map(n)
    cmap[:len(CITYSCAPES_COLORS)] = CITYSCAPES_COLORS
    return cmap


def load_color_map(path: str | None) -> np.ndarray:
    """Loads a colormap: .mat file (reference format), 'voc', 'cityscapes',
    or None -> VOC default."""
    if not path or path == 'voc':
        return voc_color_map()
    if path == 'cityscapes':
        return cityscapes_color_map()
    if path.endswith('.mat'):
        from scipy.io import loadmat
        data = loadmat(path)
        key = [k for k in data if not k.startswith('__')][0]
        cmap = np.asarray(data[key])
        if cmap.max() <= 1.0:
            cmap = (cmap * 255).astype(np.uint8)
        out = np.zeros((256, 3), np.uint8)
        out[:len(cmap)] = cmap[:256]
        return out
    raise ValueError(f'unknown colormap: {path}')


def convert_label_to_color(label: np.ndarray, color_map: np.ndarray):
    """`[..., H, W] int -> [..., H, W, 3] uint8` via the colormap."""
    return color_map[np.asarray(label).astype(np.int64) % len(color_map)]


def embedding_to_rgb(embeddings: np.ndarray, projection: str = 'pca'):
    """Projects `[..., C]` embeddings to uint8 RGB via PCA (vis.py:63-102)."""
    from hsg_tpu.ops import common
    import jax.numpy as jnp
    if projection != 'pca':
        raise ValueError(projection)
    shape = embeddings.shape
    flat = np.asarray(embeddings).reshape(-1, shape[-1])
    proj = np.asarray(common.pca(jnp.asarray(flat), 3))
    lo, hi = proj.min(0, keepdims=True), proj.max(0, keepdims=True)
    rgb = (proj - lo) / np.maximum(hi - lo, 1e-12)
    return (rgb.reshape(*shape[:-1], 3) * 255).astype(np.uint8)
