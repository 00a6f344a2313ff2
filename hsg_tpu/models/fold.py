"""Inference-time BatchNorm folding for the FCN embedding models.

At eval time every BatchNorm is an affine with constants (running stats):
``y = (x - mean) * gamma / sqrt(var + eps) + beta``. Because each BN in
the ResNet/FCN follows a bias-free conv, the affine folds exactly into
the conv: ``kernel' = kernel * s`` (per output channel, with
``s = gamma / sqrt(var + eps)``) and ``bias' = beta - mean * s``. This
removes all 54 f32 normalize epilogues from the eval forward — the
backbone is HBM-bound there, so the fold is a pure bandwidth win with
identical math up to float rounding (reference analog: the PyTorch
checkpoints keep BN separate; torch users apply the same standard fold
via ``torch.fx`` fusers for deployment).

Only the conv->BN pairs named in ``_BN_TO_CONV`` are folded (the ResNet
backbone, SURVEY.md hsg/models/backbones/resnet.py, and the FCN head,
resnet_fcn.py:37-41). The transformer's BatchNorm1d layers are NOT
foldable (they follow residual adds, not convs) — ``fold_batchnorm``
raises if it meets a BN it does not know, so the HSG variables cannot be
folded silently wrong.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

# BN module name -> sibling conv whose output it normalizes.
_BN_TO_CONV = {
    'bn1': 'conv1',
    'bn2': 'conv2',
    'bn3': 'conv3',
    'proj_bn': 'proj_conv',
    'conv_out_bn': 'conv_out_0',
}

_EPS = 1e-5  # hsg_tpu.models.resnet.BatchNorm.epsilon


def _is_bn(subtree) -> bool:
    return (isinstance(subtree, Mapping) and set(subtree) == {'BatchNorm_0'}
            and {'scale', 'bias'} <= set(subtree['BatchNorm_0']))


def _fold_level(params: Mapping[str, Any], stats: Mapping[str, Any]):
    out = {}
    for key, sub in params.items():
        if _is_bn(sub):
            if key not in _BN_TO_CONV or _BN_TO_CONV[key] not in params:
                raise ValueError(
                    f'BatchNorm {key!r} has no known preceding conv; '
                    'fold_batchnorm only supports the FCN/backbone models')
            continue  # folded into its conv below
        if isinstance(sub, Mapping) and 'kernel' in sub:
            conv = dict(sub)
            bn_name = next(
                (b for b, c in _BN_TO_CONV.items() if c == key), None)
            if bn_name is not None and bn_name in params:
                bn_p = params[bn_name]['BatchNorm_0']
                bn_s = stats[bn_name]['BatchNorm_0']
                scale = jnp.asarray(bn_p['scale'], jnp.float32)
                beta = jnp.asarray(bn_p['bias'], jnp.float32)
                mean = jnp.asarray(bn_s['mean'], jnp.float32)
                var = jnp.asarray(bn_s['var'], jnp.float32)
                s = scale / jnp.sqrt(var + _EPS)
                kernel = jnp.asarray(conv['kernel'], jnp.float32) * s
                conv['kernel'] = kernel.astype(sub['kernel'].dtype)
                if 'bias' in conv:
                    raise ValueError(f'conv {key!r} already has a bias')
                conv['bias'] = beta - mean * s
            out[key] = conv
        elif isinstance(sub, Mapping):
            out[key] = _fold_level(sub, stats.get(key, {}))
        else:
            out[key] = sub
    return out


def fold_batchnorm(variables: Mapping[str, Any]) -> dict:
    """Fold batch_stats into conv kernels; returns params-only variables.

    Input: variables of an unfolded ``ResnetFcn`` (``{'params',
    'batch_stats'}``). Output: ``{'params': ...}`` for the same model
    cloned with ``fold_bn=True``.
    """
    return {'params': _fold_level(variables['params'],
                                  variables.get('batch_stats', {}))}


def fold_inference(model, variables):
    """Return ``(folded_model, folded_variables)`` for eval-only use.

    ``model`` must expose a ``fold_bn`` attribute (``ResnetFcn`` does).
    The folded model has no batch_stats collection and must only be
    applied with ``train=False``.
    """
    return model.clone(fold_bn=True), fold_batchnorm(variables)
