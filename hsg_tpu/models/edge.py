"""Trained contour detector for the offline superpixel pipeline.

The reference's superpixel preprocessing (tools/generate_se_owt_ucm.m:20-40)
runs P. Dollar's Structured Edges — a BSDS-trained random forest mapping
image patches to boundary-probability maps — as step 1 of
SE -> oriented watershed -> UCM. This module is its TPU-native analog: a
small fully-convolutional holistically-nested edge network (HED-style,
Xie & Tu ICCV 2015) in Flax, trained by tools/train_edge_detector.py on
procedurally textured scenes whose ground-truth boundaries are known.
Inference entry point: `--detector se` in tools/generate_superpixels.py.

Design notes (why not a literal random forest): the SE forest's
structured leaves exist to make per-patch CPU inference cheap; on
TPU/XLA a tiny dense CNN is both faster (conv lowers onto the MXU, one
fused program per image instead of 10^5 patch lookups) and strictly more
expressive. GroupNorm keeps inference batch-size independent, the
network is purely convolutional so any image size works, and ~75k
parameters keep the committed checkpoint small.

Shape contract: images [B, H, W, 3] float32 in [0, 1], H and W multiples
of 4 (callers pad; see `detect`). Returns per-side-output logits; the
fused head is the detector output.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _Block(nn.Module):
    """Two 3x3 convs with GroupNorm + relu."""

    features: int

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), use_bias=False)(x)
            x = nn.GroupNorm(num_groups=4)(x)
            x = nn.relu(x)
        return x


class EdgeNet(nn.Module):
    """HED-lite: 3-scale trunk, one side output per scale, fused head.

    Side outputs give deep supervision at every scale (the HED recipe);
    the fused head is a learned 1x1 combination of the upsampled side
    logits and is what `detect` returns.
    """

    features: Sequence[int] = (16, 32, 64)

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict:
        h, w = images.shape[1], images.shape[2]
        x = images
        sides = []
        for i, feats in enumerate(self.features):
            if i:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = _Block(feats, name=f'block{i + 1}')(x)
            side = nn.Conv(1, (1, 1), name=f'side{i + 1}')(x)
            if i:
                side = jax.image.resize(side, (side.shape[0], h, w, 1),
                                        method='bilinear')
            sides.append(side)
        fused = nn.Conv(1, (1, 1), name='fuse')(
            jnp.concatenate(sides, axis=-1))
        return {'fused': fused[..., 0], 'sides': [s[..., 0] for s in sides]}


def balanced_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Class-balanced sigmoid cross-entropy (HED eq. 2).

    Boundary pixels are ~5% of a scene, so unweighted BCE collapses to
    the all-background predictor; weight positives by the negative-class
    frequency and vice versa, computed per batch.
    """
    pos = targets.mean()
    w = jnp.where(targets > 0.5, 1.0 - pos, pos)
    ce = (jnp.maximum(logits, 0) - logits * targets
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return (w * ce).sum() / jnp.maximum(w.sum(), 1e-6)


def save_params(path: str, params) -> None:
    """Flatten the param pytree into an npz (small, git-friendly)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    np.savez(path, **arrays)


def load_params(path: str):
    """Rebuild the param pytree from `save_params` output."""
    data = np.load(path)
    model = EdgeNet()
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 3), jnp.float32))['params']
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tmpl in flat:
        arr = data[jax.tree_util.keystr(kp)]
        assert arr.shape == tmpl.shape, (
            f'{jax.tree_util.keystr(kp)}: checkpoint {arr.shape} '
            f'vs model {tmpl.shape}')
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


_DETECT_CACHE: dict = {}


def detect(image: np.ndarray, params) -> np.ndarray:
    """Boundary strength in [0, 1] for one [H, W, 3] float image.

    Pads H/W up to multiples of 4 (the trunk's total downsampling),
    runs the fused head, crops back. The jitted apply is cached per
    padded shape — offline superpixel generation calls this over many
    same-sized images.
    """
    h, w = image.shape[:2]
    ph, pw = -h % 4, -w % 4
    padded = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode='edge')
    key = padded.shape
    if key not in _DETECT_CACHE:
        model = EdgeNet()
        _DETECT_CACHE[key] = jax.jit(
            lambda p, im: jax.nn.sigmoid(
                model.apply({'params': p}, im)['fused']))
    out = _DETECT_CACHE[key](params, padded[None].astype(np.float32))
    return np.asarray(out[0, :h, :w], np.float32)
