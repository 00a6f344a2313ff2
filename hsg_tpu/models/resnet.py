"""Bottleneck ResNet backbone with DeepLab multi-grid dilation (Flax/NHWC).

Capability parity with reference `hsg/models/backbones/resnet.py`:
- stem: 7x7/2 conv -> BN -> ReLU -> 3x3/2 maxpool;
- four bottleneck stages (res2..res5) with per-stage stride/dilation;
- res5 uses multi-grid [1, 2, 4] (resnet.py:110-112); a stage configured
  with dilation d uses first-block dilation 1 (d in {1,2}) or 2 (d == 4),
  then d * grid[i] for the rest (resnet.py:136-148);
- He (fan-out normal) conv init, BN gamma=1 beta=0 (resnet.py:114-121),
  BN momentum 0.1 (torch) == 0.9 decay here, eps 1e-5.

TPU-first: NHWC layout, optional bfloat16 compute with float32 BN stats &
params, and BatchNorm over the *global* batch axis — under a sharded `jit`
this compiles to per-device partial moments + an ICI all-reduce, which IS
the reference's SyncBN (lib/nn/sync_batchnorm/) without any of its
thread/queue machinery.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# He-normal over fan-out: std = sqrt(2 / (kh * kw * out_ch)), matching the
# reference's manual init (resnet.py:116-117).
conv_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


class BatchNorm(nn.Module):
    """BatchNorm with float32 stats/params regardless of compute dtype.

    `fold=True` makes the module an identity with no parameters: the
    inference-time affine (running stats) is assumed pre-folded into the
    preceding conv's kernel/bias by `hsg_tpu.models.fold.fold_batchnorm`.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.fold:
            return x
        orig_dtype = x.dtype
        # Stats/params are at least float32 so bf16 compute never degrades
        # the BN moments; float64 inputs (x64 parity tests vs the torch
        # reference) keep full double precision.
        stat_dtype = jnp.promote_types(jnp.float32, orig_dtype)
        # HSG_BN_LOWP=1 (A/B knob, docs/DESIGN.md): keep the moment
        # reductions f32 (flax force_float32_reductions) but run the
        # normalize/affine apply in the compute dtype instead of casting
        # the whole activation up — halves the BN epilogue's HBM traffic
        # for bf16 backbones. Stats/params stay f32 either way, so the
        # variable tree (and checkpoints) are identical.
        lowp = os.environ.get('HSG_BN_LOWP') == '1'
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=orig_dtype if lowp else stat_dtype,
            param_dtype=stat_dtype,
        )(x if lowp else x.astype(stat_dtype))
        return y.astype(orig_dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation) -> 1x1(x4) with projection shortcut."""
    planes: int
    stride: int = 1
    dilation: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        fold = self.fold_bn
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=fold, dtype=self.dtype,
                    kernel_init=conv_init, name='conv1')(x)
        y = BatchNorm(name='bn1', fold=fold)(y, train)
        y = nn.relu(y)
        d = self.dilation
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((d, d), (d, d)), kernel_dilation=(d, d),
                    use_bias=fold, dtype=self.dtype,
                    kernel_init=conv_init, name='conv2')(y)
        y = BatchNorm(name='bn2', fold=fold)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=fold, dtype=self.dtype,
                    kernel_init=conv_init, name='conv3')(y)
        y = BatchNorm(name='bn3', fold=fold)(y, train)
        if self.use_projection:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=fold, dtype=self.dtype,
                               kernel_init=conv_init, name='proj_conv')(x)
            residual = BatchNorm(name='proj_bn', fold=fold)(residual, train)
        return nn.relu(y + residual)


def _stage_dilations(blocks: int, dilation: int, grids: Sequence[int] | None):
    """Per-block dilations for one stage (see module docstring)."""
    if grids is None:
        grids = [1] * blocks
    if dilation in (1, 2):
        first = 1
    elif dilation == 4:
        first = 2
    else:
        raise ValueError(f'unknown dilation size: {dilation}')
    return [first] + [dilation * grids[i] for i in range(1, blocks)]


class ResNetBackbone(nn.Module):
    """Returns (res2, res3, res4, res5) feature maps, NHWC.

    `remat=True` rematerializes each bottleneck block in the backward pass
    (jax.checkpoint), trading ~30% extra FLOPs for O(depth) less activation
    memory — lets the global batch grow on HBM-limited chips.

    Selective remat: `remat='res2,res3'` rematerializes only the named
    stages. The early stages hold the LARGEST activations (highest
    spatial extent) but the CHEAPEST recompute (fewest channels), so
    remat'ing res2-3 only buys most of the memory back at a fraction of
    full-backbone remat's recompute FLOPs (A/B in docs/DESIGN.md).
    """
    blocks: Sequence[int] = (3, 4, 6, 3)
    strides: Sequence[int] = (1, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    remat: Any = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=self.fold_bn, dtype=self.dtype,
                    kernel_init=conv_init, name='conv1')(x)
        x = BatchNorm(name='bn1', fold=self.fold_bn)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        if isinstance(self.remat, str):
            remat_stages = {s.strip() for s in self.remat.split(',') if s.strip()}
        else:
            remat_stages = ({'res2', 'res3', 'res4', 'res5'} if self.remat
                            else set())
        remat_cls = nn.remat(Bottleneck, static_argnums=(2,))
        for stage in range(4):
            block_cls = (remat_cls if f'res{stage + 2}' in remat_stages
                         else Bottleneck)
            grids = [1, 2, 4] if stage == 3 else None
            dils = _stage_dilations(self.blocks[stage],
                                    self.dilations[stage], grids)
            for i in range(self.blocks[stage]):
                stride = self.strides[stage] if i == 0 else 1
                x = block_cls(
                    planes[stage], stride=stride, dilation=dils[i],
                    use_projection=(i == 0), dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    name=f'res{stage + 2}_{i}')(x, train)
            feats.append(x)
        return tuple(feats)
