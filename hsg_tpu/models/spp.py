"""Spatial pyramid pooling heads (ASPP / PSPP).

Capability parity with reference `hsg/models/heads/spp.py` (dormant —
never imported by the shipped recipes, but part of the public model-zoo
surface): ASPP sums four parallel 3x3 atrous convs; PSPP concatenates
adaptive-average-pooled + upsampled context branches with the input and
fuses via 3x3 conv + BN + ReLU.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hsg_tpu.models.resnet import BatchNorm, conv_init


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: sum of dilated 3x3 convs."""
    out_channels: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, d in enumerate(self.dilations):
            outs.append(nn.Conv(
                self.out_channels, (3, 3), padding=((d, d), (d, d)),
                kernel_dilation=(d, d), use_bias=True, dtype=self.dtype,
                kernel_init=conv_init, name=f'aspp_{i}')(x))
        return sum(outs)


class PSPP(nn.Module):
    """Pyramid scene parsing pooling: pooled context branches + fuse."""
    out_channels: int
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        branches = [x]
        for i, bins in enumerate(self.bins):
            # Adaptive average pool to (bins, bins).
            ph, pw = h // bins, w // bins
            pooled = x[:, :bins * ph, :bins * pw, :].reshape(
                b, bins, ph, bins, pw, c).mean(axis=(2, 4))
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, kernel_init=conv_init,
                        name=f'pool_conv_{i}')(pooled)
            y = BatchNorm(name=f'pool_bn_{i}')(y, train)
            y = nn.relu(y)
            y = jax.image.resize(y, (b, h, w, self.out_channels),
                                 method='bilinear')
            branches.append(y)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, kernel_init=conv_init,
                    name='fuse_conv')(y)
        y = BatchNorm(name='fuse_bn')(y, train)
        return nn.relu(y)
