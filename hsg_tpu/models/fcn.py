"""ResNet-FCN pixel-embedding model (plain; no clustering transformers).

Capability parity with reference `hsg/models/embeddings/resnet_fcn.py`:
backbone -> 1x1 conv head (2048 -> 2048 -> BN -> ReLU -> embedding_dim) +
parameter-free location features, and a `generate_clusters` that runs the
dense spherical k-means pipeline. Factories mirror the reference's
output-stride variants: train OS-16 (strides [1,2,2,1], dilations
[1,1,1,2], resnet_fcn.py:247-256) and test OS-8 (strides [1,2,1,1],
dilations [1,1,2,4], resnet_fcn.py:236-245).

The model returns a dict keyed like the reference's output contract
(resnet_fcn_hsg.py:935-966) but with dense padded shapes — see
`hsg_tpu/models/hsg.py` for the full key list.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hsg_tpu.models.resnet import ResNetBackbone, BatchNorm, conv_init
from hsg_tpu.models.local_features import LocationColorNetwork
from hsg_tpu.ops import common, kmeans


def _bilinear_resize(x, size):
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method='bilinear')


class EmbeddingHead(nn.Module):
    """conv1x1(2048) -> BN -> ReLU -> conv1x1(embedding_dim)."""
    embedding_dim: int = 128
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(2048, (1, 1), use_bias=self.fold_bn, dtype=self.dtype,
                    kernel_init=conv_init, name='conv_out_0')(x)
        x = BatchNorm(name='conv_out_bn', fold=self.fold_bn)(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.embedding_dim, (1, 1), use_bias=True,
                    dtype=self.dtype, kernel_init=conv_init,
                    name='conv_out_1')(x)
        return x


class ResnetFcn(nn.Module):
    """Plain FCN embedding model.

    Config-driven attributes mirror the reference constructor
    (resnet_fcn.py:17-56).
    """
    backbone_depth: Sequence[int] = (3, 4, 6, 3)
    strides: Sequence[int] = (1, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    embedding_dim: int = 128
    label_divisor: int = 255
    semantic_ignore_index: int = 255
    kmeans_num_clusters: Sequence[int] = (5, 5)
    kmeans_iterations: int = 10
    max_segments: int = 128
    remat: Any = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    def setup(self):
        self.resnet_backbone = ResNetBackbone(
            tuple(self.backbone_depth), tuple(self.strides),
            tuple(self.dilations), remat=self.remat, dtype=self.dtype,
            fold_bn=self.fold_bn, name='resnet_backbone')
        self.conv_out = EmbeddingHead(self.embedding_dim, dtype=self.dtype,
                                      fold_bn=self.fold_bn, name='conv_out')
        self.lfn = LocationColorNetwork(use_color=False, use_location=True,
                                        norm_color=False, smooth_ksize=None)

    def generate_embeddings(self, images, resize_as_input=False,
                            train=False):
        """images: `[B, H, W, 3]` NHWC. Returns dict with 'embedding'
        `[B, h, w, C]` and 'local_feature' `[B, h, w, 2]`.

        Parity with resnet_fcn.py:58-88.
        """
        _, _, _, res5 = self.resnet_backbone(images, train)
        # Clustering runs in >= float32 whatever the backbone compute dtype
        # (bf16 backbones upcast here; float64 x64 parity runs stay f64).
        emb = self.conv_out(res5, train)
        emb = emb.astype(jnp.promote_types(jnp.float32, emb.dtype))
        if resize_as_input:
            emb = _bilinear_resize(emb, images.shape[1:3])
        local = self.lfn(images, size=emb.shape[1:3])
        return {'embedding': emb, 'local_feature': local}

    def generate_clusters(self, embeddings, semantic_labels, instance_labels,
                          local_features=None):
        """Dense spherical k-means within each image.

        Parity with resnet_fcn.py:90-148: panoptic labels are
        semantic * label_divisor + instance, with ignore where the semantic
        label equals `semantic_ignore_index`.
        """
        if semantic_labels is not None and instance_labels is not None:
            labels = (semantic_labels.astype(jnp.int32) * self.label_divisor
                      + instance_labels.astype(jnp.int32))
            valid_mask = semantic_labels != self.semantic_ignore_index
            # Route ignore pixels to a sentinel the masked pipeline drops.
            ignore = -1
            labels = jnp.where(valid_mask, labels, ignore)
        else:
            labels = None
            ignore = None

        out = kmeans.segment_by_kmeans(
            embeddings, labels, tuple(self.kmeans_num_clusters),
            max_segments=self.max_segments,
            local_features=local_features,
            ignore_index=ignore,
            iterations=self.kmeans_iterations)

        seg_label = out.segment_label
        return {
            'cluster_embedding': out.embedding,
            'cluster_embedding_with_loc': out.embedding_with_loc,
            'cluster_semantic_label': out.label // self.label_divisor,
            'cluster_instance_label': out.label % self.label_divisor,
            'cluster_index': out.segment_id,
            'pixel_valid': out.pixel_valid,
            'segment_valid': out.segment_valid,
            'segment_semantic_label': jnp.where(
                out.segment_valid, seg_label // self.label_divisor, -1),
            'segment_instance_label': jnp.where(
                out.segment_valid, seg_label % self.label_divisor, -1),
            'kmeans_label': out.kmeans_label,
        }

    def __call__(self, images, semantic_labels=None, instance_labels=None,
                 resize_as_input=False, train=False):
        """Full forward: embeddings + per-image clustering.

        Parity with resnet_fcn.py:150-180 (labels are resized to the
        embedding resolution with nearest interpolation).
        """
        outputs = self.generate_embeddings(images, resize_as_input, train)
        size = outputs['embedding'].shape[1:3]
        if semantic_labels is not None:
            semantic_labels = common.resize_labels(semantic_labels, size)
        if instance_labels is not None:
            instance_labels = common.resize_labels(instance_labels, size)
        outputs.update(self.generate_clusters(
            outputs['embedding'], semantic_labels, instance_labels,
            outputs['local_feature']))
        return outputs


def _remat_cfg(v):
    """Config remat knob: False/True or a stage list like 'res2,res3'
    (selective remat — see ResNetBackbone docstring)."""
    if isinstance(v, str):
        return v
    return bool(v)


def _build(depth, strides, dilations, config):
    net = config.network
    # Optional depth override (no reference analog): lets smoke tests and
    # micro configs run the full CLI surface with a shallow backbone.
    depth = tuple(net.get('backbone_depth') or depth)
    return ResnetFcn(
        backbone_depth=depth, strides=strides, dilations=dilations,
        embedding_dim=net.embedding_dim,
        label_divisor=net.label_divisor,
        semantic_ignore_index=config.dataset.semantic_ignore_index,
        kmeans_num_clusters=tuple(net.kmeans_num_clusters),
        kmeans_iterations=net.kmeans_iterations,
        max_segments=net.max_segments_per_view,
        remat=_remat_cfg(net.get('remat', False)),
        dtype=jnp.bfloat16 if net.get('compute_dtype') == 'bfloat16'
        else jnp.float32)


def resnet_50_fcn(config):
    """Train variant, output stride 16 (resnet_fcn.py:253)."""
    return _build((3, 4, 6, 3), (1, 2, 2, 1), (1, 1, 1, 2), config)


def resnet_50_fcn_test(config):
    """Eval variant, output stride 8 (resnet_fcn.py:242)."""
    return _build((3, 4, 6, 3), (1, 2, 1, 1), (1, 1, 2, 4), config)


def resnet_101_fcn(config):
    return _build((3, 4, 23, 3), (1, 2, 2, 1), (1, 1, 1, 2), config)


def resnet_101_fcn_test(config):
    return _build((3, 4, 23, 3), (1, 2, 1, 1), (1, 1, 2, 4), config)
