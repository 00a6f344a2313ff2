"""Prediction-model (loss container) wiring invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_train_step import _cfg, _model, _batch
from hsg_tpu.models import predictions as pred_lib


@pytest.fixture(scope='module')
def outputs():
    cfg = _cfg()
    model = _model(cfg)
    batch = _batch()
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           batch['image'], batch['semantic_label'],
                           batch['instance_label'], train=False)
    out = model.apply(variables, batch['image'], batch['semantic_label'],
                      batch['instance_label'], train=False)
    return cfg, out, batch


def test_pixel_hierarchy_label_matches_own_segment(outputs):
    """Each valid pixel's fine/coarse id must equal its own segment's
    grouping label — the invariant that makes the pixel's own prototype a
    'same-semantic' positive in the hierarchy SegSort losses."""
    cfg, out, batch = outputs
    b, p = out['cluster_index'].shape
    s = out['segment_valid'].shape[1]
    v = 2
    for name in ('finehrchy', 'coarsehrchy'):
        glab = np.asarray(out[name + '_nd_prototype_grouping_label'])
        per_px = np.asarray(out[name + '_cluster_index'])
        sid = np.asarray(out['cluster_index'])
        pv = np.asarray(out['pixel_valid'])
        for bi in range(b):
            img, view = bi // v, bi % v
            for pi in range(p):
                if pv[bi, pi]:
                    slot = view * s + sid[bi, pi]
                    assert per_px[bi, pi] == glab[img, slot]


def test_hsg_cs_variant_losses_finite(outputs):
    cfg, out, batch = outputs
    pred = pred_lib.hsg_cs(cfg)
    res = pred(out, {'image_index': batch['image_index']})
    for k in ('img_sim_loss', 'hrchy_group_loss', 'clustering_loss'):
        assert np.isfinite(float(res[k])), k


def test_segsort_prediction_model(outputs):
    cfg, out, batch = outputs
    model = pred_lib.segsort(cfg)
    # Memory bank: random prototypes with labels.
    rng = np.random.default_rng(0)
    mem = rng.normal(size=(50, out['cluster_embedding'].shape[-1]))
    mem /= np.linalg.norm(mem, axis=1, keepdims=True)
    targets = {
        'semantic_memory_prototype': jnp.asarray(mem, jnp.float32),
        'semantic_memory_prototype_label': jnp.asarray(
            rng.integers(0, cfg.dataset.num_classes, 50)),
    }
    res = model(out, targets, with_loss=False, with_prediction=True)
    pred = np.asarray(res['semantic_prediction'])
    assert pred.shape == out['cluster_index'].shape
    assert pred.max() < cfg.dataset.num_classes
    assert res['semantic_score'].shape[-1] == 20


def test_segsort_losses_run(outputs):
    cfg, out, batch = outputs
    cfg2 = cfg.copy()
    cfg2.train.sem_ann_loss_types = 'segsort'
    cfg2.train.sem_ann_concentration = 8
    cfg2.train.sem_ann_loss_weight = 1.0
    cfg2.train.img_sim_loss_types = 'segsort'
    cfg2.train.img_sim_concentration = 8
    cfg2.train.img_sim_loss_weight = 1.0
    model = pred_lib.segsort(cfg2)
    res = model(out, {}, with_loss=True)
    assert np.isfinite(float(res['sem_ann_loss']))
    assert np.isfinite(float(res['img_sim_loss']))


def test_segsort_sem_occ_and_memory_bank(outputs):
    cfg, out, batch = outputs
    cfg2 = cfg.copy()
    cfg2.train.sem_ann_loss_types = 'segsort'
    cfg2.train.sem_ann_concentration = 8
    cfg2.train.sem_ann_loss_weight = 1.0
    cfg2.train.sem_occ_loss_types = 'segsort'
    cfg2.train.sem_occ_concentration = 8
    cfg2.train.sem_occ_loss_weight = 0.5
    model = pred_lib.segsort(cfg2)
    rng = np.random.default_rng(1)
    mem = rng.normal(size=(30, out['cluster_embedding'].shape[-1]))
    mem /= np.linalg.norm(mem, axis=1, keepdims=True)
    targets = {
        'memory_prototype': jnp.asarray(mem, jnp.float32),
        'memory_prototype_semantic_label': jnp.asarray(
            rng.integers(0, cfg.dataset.num_classes, 30)),
    }
    res = model(out, targets, with_loss=True)
    assert np.isfinite(float(res['sem_ann_loss']))
    assert np.isfinite(float(res['sem_occ_loss']))
