"""Model forward-pass tests (tiny shapes) for FCN and HSG."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsg_tpu.config import default_config
from hsg_tpu.models import fcn as fcn_lib
from hsg_tpu.models import hsg as hsg_lib
from hsg_tpu.models.resnet import ResNetBackbone
from hsg_tpu.models.transformer import TransformerClustering


def tiny_config(**net_overrides):
    cfg = default_config()
    cfg.network.embedding_dim = 16
    cfg.network.kmeans_num_clusters = (2, 2)
    cfg.network.kmeans_iterations = 2
    cfg.network.max_segments_per_view = 8
    cfg.network.label_divisor = 255
    cfg.dataset.num_classes = 4
    cfg.dataset.semantic_ignore_index = 255
    cfg.train.fine_hrchy_clusters = 3
    cfg.train.coarse_hrchy_clusters = 2
    for k, v in net_overrides.items():
        cfg.network[k] = v
    return cfg


def test_backbone_output_strides():
    model = ResNetBackbone(blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    feats = model.apply(vars_, x, False)
    # OS: res2=4, res3=8, res4=16, res5=16 (stride 1 + dilation).
    assert feats[0].shape[1:3] == (16, 16)
    assert feats[1].shape[1:3] == (8, 8)
    assert feats[2].shape[1:3] == (4, 4)
    assert feats[3].shape[1:3] == (4, 4)
    assert feats[3].shape[-1] == 2048


def test_backbone_os8_variant():
    model = ResNetBackbone(blocks=(1, 1, 1, 1), strides=(1, 2, 1, 1),
                           dilations=(1, 1, 2, 4))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    feats = model.apply(vars_, x, False)
    assert feats[3].shape[1:3] == (8, 8)  # output stride 8


def test_fcn_forward_shapes():
    cfg = tiny_config()
    model = fcn_lib.ResnetFcn(
        backbone_depth=(1, 1, 1, 1), embedding_dim=16,
        kmeans_num_clusters=(2, 2), kmeans_iterations=2, max_segments=8)
    imgs = jnp.zeros((2, 32, 32, 3))
    sem = jnp.zeros((2, 32, 32), jnp.int32)
    inst = jnp.zeros((2, 32, 32), jnp.int32)
    vars_ = model.init(jax.random.PRNGKey(0), imgs, sem, inst)
    out = model.apply(vars_, imgs, sem, inst)
    h = w = 2  # 32 / 16
    p = h * w
    assert out['embedding'].shape == (2, h, w, 16)
    assert out['cluster_embedding'].shape == (2, p, 16)
    assert out['cluster_embedding_with_loc'].shape == (2, p, 18)
    assert out['cluster_index'].shape == (2, p)
    assert out['segment_valid'].shape == (2, 8)
    assert bool(jnp.all(out['pixel_valid']))


def test_fcn_resize_as_input():
    model = fcn_lib.ResnetFcn(backbone_depth=(1, 1, 1, 1), embedding_dim=16,
                              kmeans_num_clusters=(2, 2),
                              kmeans_iterations=1, max_segments=8)
    imgs = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(vars_, imgs, method=lambda m, x: m.generate_embeddings(
        x, resize_as_input=True))
    assert out['embedding'].shape == (1, 32, 32, 16)
    assert out['local_feature'].shape == (1, 32, 32, 2)


def test_transformer_clustering_shapes_and_permutation():
    model = TransformerClustering(
        num_clusters=3, d_model=16, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=32, dropout=0.0)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
    mask = jnp.zeros((2, 10), bool).at[:, 8:].set(True)
    query = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    vars_ = model.init(jax.random.PRNGKey(0), src, mask, query, None, False)
    centroids, feats, logits, memory = model.apply(
        vars_, src, mask, query, None, False)
    assert centroids.shape == (2, 3, 16)
    assert feats.shape == (2, 3, 16)
    assert logits.shape == (2, 3, 10)
    assert memory.shape == (2, 10, 16)
    # num_queries == num_clusters: top-k selection sorts by max activation.
    maxes = np.asarray(jnp.max(logits, axis=-1))
    assert np.all(np.diff(maxes, axis=1) <= 1e-5)


def test_hsg_multiview_forward():
    cfg = tiny_config()
    model = hsg_lib.MultiviewResnetFcn(
        backbone_depth=(1, 1, 1, 1), embedding_dim=16,
        kmeans_num_clusters=(2, 2), kmeans_iterations=2, max_segments=8,
        num_views=2, fine_hrchy_clusters=3, coarse_hrchy_clusters=2)
    n_img, v = 2, 2
    b = n_img * v
    imgs = jax.random.normal(jax.random.PRNGKey(0), (b, 32, 32, 3))
    sem = jnp.zeros((b, 32, 32), jnp.int32)
    inst = jnp.asarray(
        np.random.default_rng(0).integers(0, 3, (b, 32, 32)), jnp.int32)
    vars_ = model.init(jax.random.PRNGKey(1), imgs, sem, inst)
    out = model.apply(vars_, imgs, sem, inst,
                      rngs={'dropout': jax.random.PRNGKey(2)})
    p = 4  # (32/16)^2
    m = 16  # 2 views * 8 segments
    assert out['nd_prototype'].shape == (n_img, m, 16)
    assert out['nd_prototype_padding_mask'].shape == (n_img, m)
    assert out['finehrchy_nd_prototype_grouping_logit'].shape == (n_img, 3, m)
    assert out['coarsehrchy_nd_prototype_grouping_logit'].shape == (n_img, 2, m)
    assert out['finehrchy_cluster_index'].shape == (b, p)
    # Fine probs are a distribution over clusters.
    np.testing.assert_allclose(
        np.asarray(out['finehrchy_nd_prototype_grouping_logit']).sum(1),
        1.0, atol=1e-5)
    # Labels within range.
    assert int(jnp.max(out['finehrchy_cluster_index'])) < 3
    assert int(jnp.max(out['coarsehrchy_cluster_index'])) < 2
    # Slot mapping: pixel's slot belongs to its view's block.
    slots = np.asarray(out['cluster_index_by_image'])
    for bi in range(b):
        view = bi % 2
        assert np.all((slots[bi] >= view * 8) & (slots[bi] < (view + 1) * 8))
    # Prototype unit norms on valid slots.
    valid = ~np.asarray(out['nd_prototype_padding_mask'])
    norms = np.linalg.norm(np.asarray(out['nd_prototype']), axis=-1)
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-4)


def test_hsg_factory_from_config():
    cfg = tiny_config()
    model = hsg_lib.resnet_50_fcn_multiview(cfg)
    assert model.fine_hrchy_clusters == 3
    assert model.max_segments == 8


def test_selective_remat_matches_no_remat():
    """remat='res2,res3' (and full remat) are pure recompute schedules:
    outputs and grads must equal the no-remat graph exactly."""
    from jax.flatten_util import ravel_pytree

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    results = {}
    for mode in [False, True, 'res2,res3']:
        m = ResNetBackbone(blocks=(1, 1, 1, 1), remat=mode)
        v = m.init(jax.random.PRNGKey(0), x, True)

        def loss(p):
            feats = m.apply(
                {'params': p, 'batch_stats': v['batch_stats']},
                x, True, mutable=['batch_stats'])[0]
            return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats)

        l, g = jax.jit(jax.value_and_grad(loss))(v['params'])
        results[str(mode)] = (float(l), np.asarray(ravel_pytree(g)[0]))
    base_l, base_g = results['False']
    for mode in ['True', 'res2,res3']:
        l, g = results[mode]
        np.testing.assert_allclose(l, base_l, rtol=1e-6)
        # Recompute changes the f32 reduction order inside XLA fusions;
        # grads agree to reassociation noise, not bitwise.
        np.testing.assert_allclose(g, base_g, rtol=1e-3, atol=5e-3)


def test_bn_lowp_apply_keeps_variable_tree(monkeypatch):
    """HSG_BN_LOWP=1 changes only the apply precision: the variable tree
    (params + batch_stats, all f32) is identical, so checkpoints are
    interchangeable between the two modes."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)),
                    jnp.bfloat16)
    m = ResNetBackbone(blocks=(1, 1, 1, 1), dtype=jnp.bfloat16)
    v0 = m.init(jax.random.PRNGKey(0), x, True)
    monkeypatch.setenv('HSG_BN_LOWP', '1')
    v1 = m.init(jax.random.PRNGKey(0), x, True)
    t0 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v0)
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v1)
    assert t0 == t1
    # And a lowp forward accepts the f32-mode variables directly.
    feats, _ = m.apply(v0, x, True, mutable=['batch_stats'])
    assert all(f.dtype == jnp.bfloat16 for f in feats)
