"""Location / color feature network (parameter-free or Gaussian-smoothed).

Capability parity with reference `hsg/models/embeddings/local_model.py`:
`LocationColorNetwork` emits per-pixel (y, x) - 0.5 coordinates and/or
(optionally Gaussian-smoothed, mean/max-normalized) RGB colors at a target
resolution. The shipped recipes use location only (resnet_fcn.py:44).
Returns NHWC `[B, H, W, L]`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hsg_tpu.ops import common


def gaussian_kernel(ksize: int = 5) -> np.ndarray:
    """The reference's distance-profile kernel (local_model.py:25-27):
    w[i, j] = sqrt((i - c)^2 + (j - c)^2), normalized by its sum."""
    d2 = (np.arange(ksize, dtype=np.float32) - ksize // 2) ** 2
    w = np.sqrt(d2[None, :] + d2[:, None])
    return w / w.sum()


def _bilinear_resize(x: jnp.ndarray, size) -> jnp.ndarray:
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method='bilinear')


class LocationColorNetwork:
    """Functional (parameter-free) equivalent of the reference module."""

    def __init__(self, use_color=False, use_location=True,
                 norm_color=False, smooth_ksize=None):
        self.use_color = use_color
        self.use_location = use_location
        self.norm_color = norm_color
        self.smooth_ksize = smooth_ksize
        if smooth_ksize:
            self._kernel = jnp.asarray(gaussian_kernel(smooth_ksize))

    def __call__(self, images: jnp.ndarray, size=None) -> jnp.ndarray:
        """images: `[B, H, W, 3]` NHWC. Returns `[B, h, w, L]`."""
        n, h, w, c = images.shape
        if size:
            h, w = size
        features = []
        if self.use_location:
            loc = common.generate_location_features((h, w), 'float') - 0.5
            features.append(jnp.broadcast_to(loc[None], (n, h, w, 2)))
        if self.use_color:
            x = images
            if self.smooth_ksize:
                k = self._kernel[:, :, None, None]  # HWIO depthwise
                k = jnp.tile(k, (1, 1, 1, 1))
                x = jax.lax.conv_general_dilated(
                    x, jnp.broadcast_to(k, (self.smooth_ksize,
                                            self.smooth_ksize, 1, 1)),
                    window_strides=(1, 1), padding='VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=c)
            if size:
                x = _bilinear_resize(x, size)
            if self.norm_color:
                flat = x.reshape(n, -1, x.shape[-1])
                mean = jnp.mean(flat, axis=1, keepdims=True)
                centered = flat - mean
                maxval = jnp.max(jnp.abs(centered), axis=1, keepdims=True)
                x = (centered / maxval).reshape(x.shape)
            features.append(x)
        return jnp.concatenate(features, axis=-1)
