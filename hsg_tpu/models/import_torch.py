"""Import torch weights (torchvision ResNet or full reference HSG
checkpoints) into the Flax models.

Two importers:
- `torch_resnet_to_flax`: torchvision ResNet state dicts (`layer1..4`
  names), the reference's ImageNet warm-start path
  (hsg/models/embeddings/base_model.py:14-52).
- `torch_hsg_to_flax`: complete reference `model-{iter}.pth` embedding
  state dicts — `resnet_backbone.*` (reference-internal `res2..5` names,
  hsg/models/backbones/resnet.py:93-134), `conv_out.{0,1,3}`
  (resnet_fcn.py:37-41), learned position embedding
  (heads/position_encoding.py:47-60), fine/coarse query embeddings
  (heads/query_encoding.py:7-20), and both clustering transformers incl.
  MultiheadAttention in_proj splits, `_BatchNorm1d` wrappers, `tgt_fc`,
  decoder norm and centroid heads (heads/transformer.py,
  embeddings/transformer_clusters.py:39-58). This makes published
  reference checkpoints loadable for eval-parity runs.

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


def _to_np(v):
    return np.asarray(getattr(v, 'numpy', lambda: v)())


def _linear(params, path, w, transpose=True):
    """torch Linear weight [out, in] -> Flax Dense kernel [in, out]."""
    _set(params, path + ('kernel',), w.T if transpose else w)


def _map_backbone_key(params, stats, parts, v, key):
    """`resnet_backbone.`-relative keys with reference-internal naming:
    conv1.conv1 / conv1.bn1 stem (resnet.py:66-91), res{2..5}.{b}.* blocks.
    Targets the `resnet_backbone` subtree of the Flax model.
    """
    root = ('resnet_backbone',)
    if parts[0] == 'conv1':
        if parts[1] == 'conv1':
            _set(params, root + ('conv1', 'kernel'), v.transpose(2, 3, 1, 0))
        elif parts[1] == 'bn1':
            _emit_bn(params, stats, root + ('bn1',), parts[2], v)
        else:
            warnings.warn(f'unexpected backbone key {key}; skipping')
    elif parts[0].startswith('res'):
        stage = int(parts[0][len('res'):])                 # res2 -> 2
        block = int(parts[1])
        prefix = root + (f'res{stage}_{block}',)
        sub = parts[2]
        if sub.startswith('conv'):
            _set(params, prefix + (sub, 'kernel'), v.transpose(2, 3, 1, 0))
        elif sub.startswith('bn'):
            _emit_bn(params, stats, prefix + (sub,), parts[3], v)
        elif sub == 'downsample':
            if parts[3] == '0':
                _set(params, prefix + ('proj_conv', 'kernel'),
                     v.transpose(2, 3, 1, 0))
            else:
                _emit_bn(params, stats, prefix + ('proj_bn',), parts[4], v)
        else:
            warnings.warn(f'unexpected backbone key {key}; skipping')
    else:
        warnings.warn(f'unexpected backbone key {key}; skipping')


def _map_attention_key(params, path, parts, v, key):
    """torch nn.MultiheadAttention -> {q,k,v,out}_proj Dense modules.

    `in_proj_weight` is the packed [3d, d] qkv projection; rows [0:d] are
    q, [d:2d] k, [2d:3d] v (torch F.multi_head_attention_forward).
    """
    if parts[0] == 'in_proj_weight':
        d = v.shape[1]
        for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
            _linear(params, path + (name,), v[i * d:(i + 1) * d])
    elif parts[0] == 'in_proj_bias':
        d = v.shape[0] // 3
        for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
            _set(params, path + (name, 'bias'), v[i * d:(i + 1) * d])
    elif parts[0] == 'out_proj':
        if parts[1] == 'weight':
            _linear(params, path + ('out_proj',), v)
        else:
            _set(params, path + ('out_proj', 'bias'), v)
    else:
        warnings.warn(f'unexpected attention key {key}; skipping')


def _map_transformer_layer_key(params, stats, path, parts, v, key,
                               is_decoder):
    """One encoder/decoder layer (heads/transformer.py:206-345)."""
    sub = parts[0]
    if sub == 'self_attn':
        _map_attention_key(params, path + ('self_attn',), parts[1:], v, key)
    elif sub == 'multihead_attn' and is_decoder:
        _map_attention_key(params, path + ('cross_attn',), parts[1:], v, key)
    elif sub in ('linear1', 'linear2'):
        if parts[1] == 'weight':
            _linear(params, path + (sub,), v)
        else:
            _set(params, path + (sub, 'bias'), v)
    elif sub in ('norm1', 'norm2', 'norm3'):
        # reference _BatchNorm1d wraps the BN as `.norm`.
        _emit_bn(params, stats, path + (sub,), parts[2], v)
    else:
        warnings.warn(f'unexpected transformer layer key {key}; skipping')


def _map_transformer_clustering_key(params, stats, name, parts, v, key):
    """`{fine,coarse}_hrchy_transformer.`-relative keys
    (transformer_clusters.py:39-58 module tree)."""
    path = (name,)
    if parts[0] == '_transformer':
        tpath = path + ('transformer',)
        sub = parts[1]
        if sub in ('encoder', 'decoder'):
            if parts[2] == 'layers':
                layer = int(parts[3])
                lname = (f'{sub}_layer_{layer}',)
                _map_transformer_layer_key(
                    params, stats, tpath + lname, parts[4:], v, key,
                    is_decoder=(sub == 'decoder'))
            elif parts[2] == 'norm':
                # decoder-final BN (encoder norm only exists pre-norm).
                target = ('decoder_norm' if sub == 'decoder'
                          else 'encoder_norm')
                _emit_bn(params, stats, tpath + (target,), parts[4], v)
            else:
                warnings.warn(f'unexpected key {key}; skipping')
        elif sub == 'tgt_fc':
            # Sequential(Linear no-bias, BN1d, ReLU, Linear)
            # (transformer.py:69-72).
            idx = parts[2]
            if idx == '0':
                _linear(params, tpath + ('tgt_fc1',), v)
            elif idx == '1':
                _emit_bn(params, stats, tpath + ('tgt_bn',), parts[3], v)
            elif idx == '3':
                if parts[3] == 'weight':
                    _linear(params, tpath + ('tgt_fc2',), v)
                else:
                    _set(params, tpath + ('tgt_fc2', 'bias'), v)
            else:
                warnings.warn(f'unexpected key {key}; skipping')
        else:
            warnings.warn(f'unexpected key {key}; skipping')
    elif parts[0] in ('centroid_fc', 'centroid_feat_fc'):
        # Sequential(ReLU, Linear no-bias, BN1d)
        # (transformer_clusters.py:50-57).
        idx = parts[1]
        if idx == '1':
            _linear(params, path + (f'{parts[0]}_dense',), v)
        elif idx == '2':
            _emit_bn(params, stats, path + (f'{parts[0]}_bn',), parts[2], v)
        else:
            warnings.warn(f'unexpected key {key}; skipping')
    else:
        warnings.warn(f'unexpected key {key}; skipping')


def torch_hsg_to_flax(state_dict) -> tuple[dict, dict]:
    """Converts a full reference HSG embedding-model state dict into
    (params, batch_stats) trees for `MultiviewResnetFcn` / `ResnetFcn`.

    Covers every module the reference constructs
    (resnet_fcn_hsg.py:37-90): resnet_backbone, conv_out, pos_embed,
    fine/coarse query embeddings and both clustering transformers. Plain
    FCN checkpoints (backbone + conv_out only) import through the same
    function. Unknown keys warn and are skipped (tolerant partial load,
    base_model.py:26-52).
    """
    params: dict = {}
    stats: dict = {}
    for key, value in state_dict.items():
        v = _to_np(value)
        parts = key.split('.')
        head = parts[0]
        if head == 'resnet_backbone':
            _map_backbone_key(params, stats, parts[1:], v, key)
        elif head == 'conv_out':
            # Sequential(Conv 1x1 no-bias, BN, ReLU, Conv 1x1)
            # (resnet_fcn.py:37-41) -> EmbeddingHead.
            idx = parts[1]
            if idx == '0':
                _set(params, ('conv_out', 'conv_out_0', 'kernel'),
                     v.transpose(2, 3, 1, 0))
            elif idx == '1':
                _emit_bn(params, stats, ('conv_out', 'conv_out_bn'),
                         parts[2], v)
            elif idx == '3':
                if parts[2] == 'weight':
                    _set(params, ('conv_out', 'conv_out_1', 'kernel'),
                         v.transpose(2, 3, 1, 0))
                else:
                    _set(params, ('conv_out', 'conv_out_1', 'bias'), v)
            else:
                warnings.warn(f'unexpected key {key}; skipping')
        elif head == 'pos_embed':
            # row_embed/col_embed nn.Embedding [50, d/2]
            # (position_encoding.py:52-54).
            if parts[1] in ('row_embed', 'col_embed') and parts[2] == 'weight':
                _set(params, ('pos_embed', parts[1], 'embedding'), v)
            else:
                warnings.warn(f'unexpected key {key}; skipping')
        elif head in ('fine_query_embed', 'coarse_query_embed'):
            # SimpleQueryEmbedding._query_embedding.weight [K, d]
            # -> direct param of the same name (models/hsg.py:95-100).
            params[head] = v
        elif head in ('fine_hrchy_transformer', 'coarse_hrchy_transformer'):
            _map_transformer_clustering_key(params, stats, head, parts[1:],
                                            v, key)
        elif head in ('fc', 'lfn'):
            continue  # classifier head / parameter-free local features
        else:
            warnings.warn(f'unexpected key {key}; skipping')
    return params, stats


def _overlay(dst, src, path=()):
    import jax

    for k, v in src.items():
        if k not in dst:
            warnings.warn(f'import: {path + (k,)} missing in model')
            continue
        if isinstance(v, dict):
            _overlay(dst[k], v, path + (k,))
        else:
            if tuple(dst[k].shape) != tuple(v.shape):
                warnings.warn(f'import: shape mismatch at {path + (k,)}')
                continue
            dst[k] = jax.numpy.asarray(v, dst[k].dtype)


def _copy_variables(variables):
    import jax
    import flax

    variables = jax.tree_util.tree_map(lambda x: x, variables)
    return flax.core.unfreeze(variables) if hasattr(
        flax.core, 'unfreeze') else dict(variables)


def apply_torch_state_dict(variables: dict, state_dict) -> dict:
    """Overlays any torch state dict (torchvision ResNet or reference HSG
    naming, auto-detected) onto a model's variables dict. Missing /
    shape-mismatched entries warn and are skipped (the reference's tolerant
    partial-load semantics, base_model.py:26-52)."""
    is_reference = any(k.startswith('resnet_backbone.') for k in state_dict)
    variables = _copy_variables(variables)
    if is_reference:
        params, stats = torch_hsg_to_flax(state_dict)
        _overlay(variables['params'], params)
        _overlay(variables['batch_stats'], stats)
    else:
        params, stats = torch_resnet_to_flax(state_dict)
        _overlay(variables['params']['resnet_backbone'], params)
        _overlay(variables['batch_stats']['resnet_backbone'], stats)
    return variables


def load_torch_checkpoint(variables: dict, torch_path: str) -> dict:
    """Loads a `.pth` file and overlays it: supports raw state dicts,
    `{'state_dict': ...}` wrappers, and the reference's trainer snapshots
    `{'embedding_model': ..., 'prediction_model': ...}`
    (pyscripts/train/train.py:350-356; the prediction model holds no
    parameters — its state dict is loss bookkeeping only)."""
    import torch

    state_dict = torch.load(torch_path, map_location='cpu',
                            weights_only=True)
    for wrapper in ('embedding_model', 'state_dict'):
        if wrapper in state_dict:
            state_dict = state_dict[wrapper]
            break
    return apply_torch_state_dict(variables, state_dict)


# Backward-compatible name used by pyscripts (now auto-detecting).
load_pretrained_backbone = load_torch_checkpoint
