"""Inference-time BN folding == unfolded eval forward (models/fold.py).

The fold is exact math (per-channel affine into the conv kernel/bias),
so the folded model must reproduce the unfolded eval forward to float
rounding on non-trivial running stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsg_tpu.config import default_config
from hsg_tpu.models import fcn as fcn_lib
from hsg_tpu.models import fold as fold_lib


def _small_model(dtype='float32'):
    cfg = default_config()
    cfg.network.embedding_dim = 16
    cfg.network.kmeans_num_clusters = (2, 2)
    cfg.network.kmeans_iterations = 2
    cfg.network.max_segments_per_view = 16
    cfg.network.compute_dtype = dtype
    return fcn_lib.resnet_50_fcn_test(cfg)


def _variables_with_real_stats(model, images):
    """Init, then one train-mode pass so running stats are non-trivial."""
    variables = model.init(jax.random.PRNGKey(0), images, None, None,
                           train=False)
    _, updated = model.apply(
        variables, images, mutable=['batch_stats'],
        method=lambda m, x: m.generate_embeddings(x, train=True))
    return {'params': variables['params'],
            'batch_stats': updated['batch_stats']}


def _embed(model, variables, images):
    return model.apply(
        variables, images,
        method=lambda m, x: m.generate_embeddings(x, train=False))


@pytest.mark.parametrize('dtype', ['float32', 'bfloat16'])
def test_folded_matches_unfolded(dtype):
    model = _small_model(dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = _variables_with_real_stats(model, images)

    folded_model, folded_vars = fold_lib.fold_inference(model, variables)
    assert 'batch_stats' not in folded_vars
    # Every BN subtree is gone; every previously bias-free conv gained one.
    stem = folded_vars['params']['resnet_backbone']
    assert 'bn1' not in stem and 'bias' in stem['conv1']
    assert 'bias' in stem['res2_0']['conv2']
    assert 'conv_out_bn' not in folded_vars['params']['conv_out']

    ref = _embed(model, variables, images)
    got = _embed(folded_model, folded_vars, images)
    # The fold is exact in exact arithmetic; in floats the re-rounded
    # kernels shift every conv's rounding, compounding over 50+ layers.
    # Scale the tolerance to the output magnitude (embeddings are
    # L2-normalized downstream, so absolute error vs the norm is what
    # matters).
    ref_emb = np.asarray(ref['embedding'], np.float32)
    got_emb = np.asarray(got['embedding'], np.float32)
    scale = float(np.abs(ref_emb).max())
    atol = scale * (1e-4 if dtype == 'float32' else 3e-2)
    np.testing.assert_allclose(got_emb, ref_emb, rtol=0, atol=atol)
    np.testing.assert_allclose(got['local_feature'], ref['local_feature'])


def test_full_forward_clusters_match():
    """The folded full forward (embeddings + k-means) is equivalent."""
    model = _small_model()
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = _variables_with_real_stats(model, images)
    folded_model, folded_vars = fold_lib.fold_inference(model, variables)

    ref = model.apply(variables, images, None, None, train=False)
    got = folded_model.apply(folded_vars, images, None, None, train=False)
    np.testing.assert_array_equal(np.asarray(got['cluster_index']),
                                  np.asarray(ref['cluster_index']))


def test_unknown_bn_rejected():
    """A BN with no known conv partner must raise, not fold wrong."""
    variables = {
        'params': {'odd_bn': {'BatchNorm_0': {
            'scale': jnp.ones((4,)), 'bias': jnp.zeros((4,))}}},
        'batch_stats': {'odd_bn': {'BatchNorm_0': {
            'mean': jnp.zeros((4,)), 'var': jnp.ones((4,))}}},
    }
    with pytest.raises(ValueError):
        fold_lib.fold_batchnorm(variables)
