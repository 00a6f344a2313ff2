"""Shared CLI plumbing for the entry-point scripts.

Flag surface parity with reference `hsg/config/parse_args.py:8-38`
(--snapshot_dir --save_dir --cfg_path --semantic_memory_dir --data_dir
--data_list --kmeans_num_clusters --label_divisor).
"""

from __future__ import annotations

import argparse
import os

from hsg_tpu.config import load_config


def _apply_platform_override():
    """HSG_TPU_PLATFORM=cpu forces the CPU backend (the environment's
    sitecustomize latches JAX_PLATFORMS before user code runs, so a plain
    env var cannot; jax.config still can because backends init lazily)."""
    plat = os.environ.get('HSG_TPU_PLATFORM')
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)


def parse_args(description='', extra_args=()):
    _apply_platform_override()
    parser = argparse.ArgumentParser(description=description)
    for flags, kwargs in extra_args:
        parser.add_argument(*flags, **kwargs)
    parser.add_argument('--snapshot_dir', required=True, type=str,
                        help='/path/to/snapshot/dir.')
    parser.add_argument('--save_dir', type=str,
                        help='/path/to/save/dir.')
    parser.add_argument('--cfg_path', required=True, type=str,
                        help='/path/to/specific/config/file.')
    parser.add_argument('--semantic_memory_dir', type=str, default=None,
                        help='/path/to/stored/memory/dir.')
    parser.add_argument('--data_dir', type=str, default=None,
                        help='/root/dir/to/data.')
    parser.add_argument('--data_list', type=str, default=None,
                        help='/path/to/data/list.')
    parser.add_argument('--kmeans_num_clusters', type=str, default=None,
                        help='H,W')
    parser.add_argument('--label_divisor', type=int, default=None,
                        help='2048')
    parser.add_argument('--max_steps', type=int, default=None,
                        help='optional cap on steps (smoke tests)')
    parser.add_argument('--num_images', type=int, default=None,
                        help='optional cap on eval images (smoke tests)')
    parser.add_argument('--skip_existing', action='store_true',
                        help='skip images whose outputs already exist '
                             '(restart an interrupted eval job)')
    args = parser.parse_args()
    config = load_config(args.cfg_path)
    if args.kmeans_num_clusters:
        config.network.kmeans_num_clusters = tuple(
            int(x) for x in args.kmeans_num_clusters.split(','))
    if args.label_divisor:
        config.network.label_divisor = args.label_divisor
    return args, config


def build_embedding_model(config, test: bool = False):
    """Backbone factory dispatch, parity with pyscripts/train/train.py:83-90
    and the eval scripts' `_test` variants (inference.py:64-67)."""
    from hsg_tpu.models import fcn as fcn_lib
    from hsg_tpu.models import hsg as hsg_lib

    kind = config.network.backbone_types
    if test:
        if 'fcn_50' in kind:
            return fcn_lib.resnet_50_fcn_test(config)
        if 'fcn_101' in kind:
            return fcn_lib.resnet_101_fcn_test(config)
        raise ValueError(f'Not support {kind}')
    if kind == 'fcn_50':
        return fcn_lib.resnet_50_fcn(config)
    if kind == 'fcn_101':
        return fcn_lib.resnet_101_fcn(config)
    if kind in ('fcn_50_hsg', 'fcn_50_hsg_cs'):
        return hsg_lib.resnet_50_fcn_multiview(config)
    if kind in ('fcn_101_hsg', 'fcn_101_hsg_cs'):
        return hsg_lib.resnet_101_fcn_multiview(config)
    raise ValueError(f'Not support {kind}')


def build_prediction_model(config):
    from hsg_tpu.models import predictions as pred_lib

    kind = config.network.prediction_types
    if kind == 'hsg':
        return pred_lib.hsg(config)
    if kind == 'hsg_cs':
        return pred_lib.hsg_cs(config)
    if kind == 'segsort':
        return pred_lib.segsort(config)
    raise ValueError(f'Not support {kind}')


def head_multipliers(config):
    """LR multipliers for the transformer heads: x10/x20 for `hsg`
    (resnet_fcn_hsg.py:375-439), x1/x2 for `hsg_cs`."""
    if config.network.backbone_types.endswith('_cs'):
        return 1.0, 2.0
    return 10.0, 20.0
