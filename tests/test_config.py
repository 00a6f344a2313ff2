"""Config system: defaults, YAML merge, float coercion, CLI overrides."""

import os

import numpy as np
import pytest
import yaml

from hsg_tpu.config import Config, default_config, update_config, load_config


def test_defaults_mirror_reference_knobs():
    cfg = default_config()
    assert cfg.network.embedding_dim == 128
    assert cfg.network.label_divisor == 255
    assert tuple(cfg.network.kmeans_num_clusters) == (5, 5)
    assert cfg.train.fine_hrchy_clusters == 9
    assert cfg.train.coarse_hrchy_clusters == 4
    assert cfg.dataset.semantic_ignore_index == 255
    assert cfg.test.crop_size == (0, 0)


def test_yaml_merge_and_float_coercion(tmp_path):
    p = tmp_path / 'c.yaml'
    yaml.safe_dump({
        'network': {'backbone_types': 'fcn_50', 'embedding_dim': 64},
        'train': {'base_lr': '1e-1', 'weight_decay': '5e-4',
                  'batch_size': 12},
        'new_section': {'foo': 1},
    }, open(p, 'w'))
    cfg = load_config(str(p))
    # Merged values.
    assert cfg.network.backbone_types == 'fcn_50'
    assert cfg.network.embedding_dim == 64
    # Untouched defaults survive.
    assert cfg.network.label_divisor == 255
    # The reference's float coercion ('1e-1' parses as str in YAML).
    assert isinstance(cfg.train.base_lr, float)
    np.testing.assert_allclose(cfg.train.base_lr, 0.1)
    np.testing.assert_allclose(cfg.train.weight_decay, 5e-4)
    # New sections are inserted (default.py:112-114 parity).
    assert cfg.new_section.foo == 1


def test_config_attribute_access_and_copy():
    cfg = default_config()
    cfg.network.embedding_dim = 32
    clone = cfg.copy()
    clone.network.embedding_dim = 16
    assert cfg.network.embedding_dim == 32
    with pytest.raises(AttributeError):
        _ = cfg.network.nonexistent_key
    assert cfg.network.get('nonexistent_key') is None
