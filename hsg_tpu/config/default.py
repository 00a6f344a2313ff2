"""Layered configuration with the reference's knob names.

Parity with reference `hsg/config/default.py`: defaults <- YAML overlay
(<- CLI overrides applied by scripts). Implemented as a tiny attribute-dict
instead of a global singleton so configs stay functional/local, plus a few
TPU-specific knobs (static shape caps, mesh size, dtypes).
"""

from __future__ import annotations

import copy

import yaml


class Config(dict):
    """Minimal attribute-access dict (recursive)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def from_nested(cls, d):
        out = cls()
        for k, v in d.items():
            out[k] = cls.from_nested(v) if isinstance(v, dict) else v
        return out

    def copy(self):
        return copy.deepcopy(self)


def default_config() -> Config:
    """Defaults mirroring hsg/config/default.py:7-91 plus TPU knobs."""
    c = Config.from_nested({
        'embedding_model': '',
        'prediction_model': '',
        'num_threads': 4,
        'network': {
            'pixel_means': (0.485, 0.456, 0.406),
            'pixel_stds': (0.229, 0.224, 0.225),
            'pretrained': '',
            'use_syncbn': True,   # global-batch BN is free under SPMD
            'backbone_types': '',
            'prediction_types': '',
            'embedding_dim': 128,
            'label_divisor': 255,
            'kmeans_iterations': 10,
            'kmeans_num_clusters': (5, 5),
            # --- TPU-specific static shape caps ---
            # Per-view segment cap; the per-image transformer input is
            # num_views * max_segments_per_view (reference max_num_clusters
            # = 256, resnet_fcn_hsg.py:82).
            'max_segments_per_view': 128,
            'num_views': 2,
            # Optional backbone block-depth override, e.g. [1, 1, 1, 1]
            # for micro smoke-test models (None = the factory's depth).
            'backbone_depth': None,
            # Compute dtype for the backbone ('bfloat16' or 'float32').
            'compute_dtype': 'float32',
        },
        'dataset': {
            'data_dir': '',
            'train_data_list': '',
            'test_data_list': '',
            'color_map_path': '',
            'num_classes': 0,
            'semantic_ignore_index': 255,
        },
        'train': {
            'lr_policy': 'step',
            'random_mirror': True,
            'random_scale': True,
            'random_crop': True,
            'random_grayscale': True,
            'random_blur': False,
            'shuffle': True,
            'resume': False,
            'begin_iteration': 0,
            'max_iteration': 0,
            'warmup_iteration': 0,
            'decay_iterations': (0,),
            'snapshot_step': 0,
            'tensorboard_step': 0,
            # image-panel cadence; 0 = every tensorboard_step (the
            # reference couples them, pyscripts/train/train.py:272-308)
            'panel_step': 0,
            'base_lr': 1e-3,
            'weight_decay': 5e-3,
            'momentum': 0.9,
            'batch_size': 0,
            'crop_size': (0, 0),
            'memory_bank_size': 0,
            # MXU dtype for the tiled Pallas NCA loss kernel:
            # 'bfloat16' = ~2x kernel throughput, <1e-2 nll error,
            # f32 accumulation (ops/pallas/nca_kernel.py).
            'nca_compute_dtype': 'float32',
            # Pixel-level NCA route: 'auto' (dense below 8192 prototypes;
            # fused Pallas tiles at >= 8192 on TPU, chunked scan
            # elsewhere), 'dense', 'chunked', 'pallas'.
            'nca_impl': 'auto',
            'sem_ann_loss_types': 'none',
            'sem_occ_loss_types': 'none',
            'img_sim_loss_types': 'none',
            'feat_aff_loss_types': 'none',
            'fine_hrchy_loss_types': 'none',
            'coarse_hrchy_loss_types': 'none',
            'centroid_cont_loss_types': 'none',
            'dmon_loss_types': 'none',
            'sem_ann_concentration': 0,
            'sem_occ_concentration': 0,
            'img_sim_concentration': 0,
            'feat_aff_concentration': 0,
            'fine_hrchy_concentration': 0,
            'coarse_hrchy_concentration': 0,
            'centroid_cont_concentration': 0,
            'sem_ann_loss_weight': 0.0,
            'sem_occ_loss_weight': 0.0,
            'img_sim_loss_weight': 0.0,
            'feat_aff_loss_weight': 0.0,
            'fine_hrchy_loss_weight': 0.0,
            'coarse_hrchy_loss_weight': 0.0,
            'centroid_cont_loss_weight': 0.0,
            'dmon_loss_weight': 0.0,
            'fine_hrchy_clusters': 9,
            'coarse_hrchy_clusters': 4,
            'dmon_knn': 2,
        },
        'test': {
            'scales': (0,),
            'image_size': 0,
            'crop_size': (0, 0),
            'stride': (0, 0),
        },
        # --- TPU-specific ---
        'mesh': {
            'data': -1,  # -1: use all available devices on the data axis
        },
    })
    return c


def update_config(config: Config, config_file: str) -> Config:
    """Merges a YAML file over `config` (in place), returning it.

    Mirrors hsg/config/default.py:94-114 including the float coercion of
    train.base_lr / train.weight_decay (YAML '1e-1' parses as str).
    """
    with open(config_file) as f:
        overlay = yaml.safe_load(f) or {}
    for k, v in overlay.items():
        if k in config and isinstance(v, dict) and isinstance(config[k], dict):
            if k == 'train':
                for key in ('base_lr', 'weight_decay'):
                    if key in v:
                        v[key] = float(v[key])
            for vk, vv in v.items():
                config[k][vk] = (Config.from_nested(vv)
                                 if isinstance(vv, dict) else vv)
        else:
            config[k] = Config.from_nested(v) if isinstance(v, dict) else v
    return config


def load_config(config_file: str | None = None) -> Config:
    cfg = default_config()
    if config_file:
        update_config(cfg, config_file)
    return cfg
