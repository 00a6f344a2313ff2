"""Import torchvision ResNet weights into the Flax backbone.

Capability parity with the reference's checkpoint name mapping
(hsg/models/embeddings/base_model.py:14-52): the reference warm-starts from
ImageNet-pretrained torchvision ResNet-50 by renaming `layer1..4` ->
`res2..5` with shape-checked partial loading. Here the same mapping
produces a Flax param/batch-stats tree (OIHW -> HWIO conv transpose).

Because Flax param names are stride/dilation-agnostic, the same import
works for both the OS-16 train variant and the OS-8 `_test` eval variant
(the reference's dilation-reinterpretation property).
"""

from __future__ import annotations

import warnings

import numpy as np


def _set(tree, path, value, expect_shape=None):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if expect_shape is not None and tuple(value.shape) != tuple(expect_shape):
        warnings.warn(f'shape mismatch at {path}: {value.shape} vs '
                      f'{expect_shape}; skipping')
        return False
    node[path[-1]] = value
    return True


def torch_resnet_to_flax(state_dict) -> tuple[dict, dict]:
    """Converts a torchvision ResNet state dict (tensors or ndarrays) into
    (params, batch_stats) subtrees for `ResNetBackbone`.

    Unknown keys (e.g. `fc.*`) are skipped with a warning, mirroring the
    reference's tolerant partial load.
    """
    params: dict = {}
    stats: dict = {}

    def to_np(v):
        return np.asarray(getattr(v, 'numpy', lambda: v)())

    for key, value in state_dict.items():
        v = to_np(value)
        parts = key.split('.')
        if parts[0] == 'conv1':
            _set(params, ('conv1', 'kernel'), v.transpose(2, 3, 1, 0))
        elif parts[0] == 'bn1':
            _emit_bn(params, stats, ('bn1',), parts[1], v)
        elif parts[0].startswith('layer'):
            stage = int(parts[0][len('layer'):]) + 1     # layer1 -> res2
            block = int(parts[1])
            prefix = (f'res{stage}_{block}',)
            sub = parts[2]
            if sub.startswith('conv'):
                _set(params, prefix + (sub, 'kernel'),
                     v.transpose(2, 3, 1, 0))
            elif sub.startswith('bn'):
                _emit_bn(params, stats, prefix + (sub,), parts[3], v)
            elif sub == 'downsample':
                if parts[3] == '0':
                    _set(params, prefix + ('proj_conv', 'kernel'),
                         v.transpose(2, 3, 1, 0))
                else:
                    _emit_bn(params, stats, prefix + ('proj_bn',),
                             parts[4], v)
            else:
                warnings.warn(f'unexpected key {key}; skipping')
        elif parts[0] in ('fc',):
            continue  # classifier head: not used by the FCN
        else:
            warnings.warn(f'unexpected key {key}; skipping')
    return params, stats


def _emit_bn(params, stats, prefix, field, v):
    inner = prefix + ('BatchNorm_0',)
    if field == 'weight':
        _set(params, inner + ('scale',), v)
    elif field == 'bias':
        _set(params, inner + ('bias',), v)
    elif field == 'running_mean':
        _set(stats, inner + ('mean',), v)
    elif field == 'running_var':
        _set(stats, inner + ('var',), v)
    elif field == 'num_batches_tracked':
        pass
    else:
        warnings.warn(f'unexpected BN field {field} at {prefix}')


def load_pretrained_backbone(variables: dict, torch_path: str) -> dict:
    """Overlays torchvision weights onto a model's variables dict.

    The backbone subtree is `resnet_backbone`; non-backbone params are left
    untouched (the reference's missing-key warnings correspond to our
    freshly initialized head/transformer params).
    """
    import torch

    state_dict = torch.load(torch_path, map_location='cpu',
                            weights_only=True)
    if 'state_dict' in state_dict:
        state_dict = state_dict['state_dict']
    params, stats = torch_resnet_to_flax(state_dict)

    import jax

    def overlay(dst, src, path=()):
        for k, v in src.items():
            if k not in dst:
                warnings.warn(f'import: {path + (k,)} missing in model')
                continue
            if isinstance(v, dict):
                overlay(dst[k], v, path + (k,))
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    warnings.warn(
                        f'import: shape mismatch at {path + (k,)}')
                    continue
                dst[k] = jax.numpy.asarray(v, dst[k].dtype)

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    import flax
    variables = flax.core.unfreeze(variables) if hasattr(
        flax.core, 'unfreeze') else dict(variables)
    overlay(variables['params']['resnet_backbone'], params)
    overlay(variables['batch_stats']['resnet_backbone'], stats)
    return variables
