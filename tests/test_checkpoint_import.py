"""Checkpoint roundtrip + torchvision import mapping tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsg_tpu.models.resnet import ResNetBackbone
from hsg_tpu.models import import_torch
from hsg_tpu.train import checkpoint as ckpt_lib
from hsg_tpu.train import train_step as ts_lib
from hsg_tpu.train import optimizer as opt_lib


def _fake_torch_state_dict(blocks=(1, 1, 1, 1)):
    """Builds a torchvision-resnet-named state dict out of numpy arrays."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cin, cout, k):
        sd[name + '.weight'] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32)

    def bn(name, c):
        sd[name + '.weight'] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + '.bias'] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + '.running_mean'] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + '.running_var'] = np.abs(
            rng.normal(size=(c,))).astype(np.float32) + 0.5

    conv('conv1', 3, 64, 7)
    bn('bn1', 64)
    inplanes = 64
    for stage, nblocks in enumerate(blocks):
        planes = 64 * (2 ** stage)
        for b in range(nblocks):
            pre = f'layer{stage + 1}.{b}'
            conv(pre + '.conv1', inplanes if b == 0 else planes * 4,
                 planes, 1)
            bn(pre + '.bn1', planes)
            conv(pre + '.conv2', planes, planes, 3)
            bn(pre + '.bn2', planes)
            conv(pre + '.conv3', planes, planes * 4, 1)
            bn(pre + '.bn3', planes * 4)
            if b == 0:
                conv(pre + '.downsample.0', inplanes, planes * 4, 1)
                bn(pre + '.downsample.1', planes * 4)
        inplanes = planes * 4
    sd['fc.weight'] = rng.normal(size=(10, 2048)).astype(np.float32)
    sd['fc.bias'] = rng.normal(size=(10,)).astype(np.float32)
    return sd


def test_torch_import_mapping():
    sd = _fake_torch_state_dict()
    params, stats = import_torch.torch_resnet_to_flax(sd)
    # conv1: OIHW -> HWIO.
    assert params['conv1']['kernel'].shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        params['conv1']['kernel'][0, 0, 0, 5],
        sd['conv1.weight'][5, 0, 0, 0])
    # layer3.0 -> res4_0, downsample -> proj.
    assert params['res4_0']['proj_conv']['kernel'].shape == (1, 1, 512, 1024)
    np.testing.assert_allclose(
        stats['res4_0']['bn2']['BatchNorm_0']['var'],
        sd['layer3.0.bn2.running_var'])
    assert 'fc' not in params


def test_torch_import_into_model_forward():
    sd = _fake_torch_state_dict()
    params, stats = import_torch.torch_resnet_to_flax(sd)
    model = ResNetBackbone(blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    # Overlay: every imported leaf must exist with matching shape.
    import flax
    flat_model = flax.traverse_util.flatten_dict(variables['params'])
    flat_import = flax.traverse_util.flatten_dict(params)
    for path, v in flat_import.items():
        assert path in flat_model, path
        assert flat_model[path].shape == v.shape, path
    # And the model still runs with the imported weights.
    new_params = flax.traverse_util.unflatten_dict(
        {**flat_model, **{k: jnp.asarray(v) for k, v in flat_import.items()}})
    flat_stats_model = flax.traverse_util.flatten_dict(
        variables['batch_stats'])
    flat_stats_import = flax.traverse_util.flatten_dict(stats)
    merged_stats = flax.traverse_util.unflatten_dict(
        {**flat_stats_model,
         **{k: jnp.asarray(v) for k, v in flat_stats_import.items()}})
    out = model.apply({'params': new_params, 'batch_stats': merged_stats},
                      x, False)
    assert np.all(np.isfinite(np.asarray(out[3])))


def test_checkpoint_roundtrip(tmp_path):
    model = ResNetBackbone(blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    init_fn, _ = opt_lib.sgd(0.9, 0.0)
    state = ts_lib.TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=init_fn(variables['params']))
    path = ckpt_lib.save_checkpoint(str(tmp_path), state)
    assert ckpt_lib.latest_step(str(tmp_path)) == 7
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), 7, template=state)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


@pytest.mark.slow
def test_partial_overlay_cross_model():
    """FCN snapshot -> HSG model: shared subtrees load, heads stay init."""
    import warnings
    from hsg_tpu.models import fcn as fcn_lib, hsg as hsg_lib

    fcn = fcn_lib.ResnetFcn(backbone_depth=(1, 1, 1, 1), embedding_dim=16,
                            kmeans_num_clusters=(2, 2), kmeans_iterations=1,
                            max_segments=8)
    hsg = hsg_lib.MultiviewResnetFcn(
        backbone_depth=(1, 1, 1, 1), embedding_dim=16,
        kmeans_num_clusters=(2, 2), kmeans_iterations=1, max_segments=8,
        num_views=2, fine_hrchy_clusters=3, coarse_hrchy_clusters=2)
    imgs = jnp.ones((2, 32, 32, 3))
    v_fcn = fcn.init(jax.random.PRNGKey(0), imgs)
    v_hsg = hsg.init(jax.random.PRNGKey(1), imgs)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        merged = ckpt_lib.partial_overlay(
            {'params': v_hsg['params'], 'batch_stats': v_hsg['batch_stats']},
            {'params': v_fcn['params'], 'batch_stats': v_fcn['batch_stats']})
    # Backbone copied from the FCN snapshot.
    np.testing.assert_array_equal(
        np.asarray(merged['params']['resnet_backbone']['conv1']['kernel']),
        np.asarray(v_fcn['params']['resnet_backbone']['conv1']['kernel']))
    # Transformer heads remain at the HSG init.
    assert 'fine_hrchy_transformer' in merged['params']
