"""Trained structured-edge contour detector (hsg_tpu/models/edge.py).

Parity target: the BSDS-trained Structured-Edges model that the
reference's tools/generate_se_owt_ucm.m:20-40 runs as step 1 of its
superpixel pipeline. Here the shipped checkpoint
(artifacts/edge_detector/params.npz) is trained on procedurally
textured scenes (tools/train_edge_detector.py); these tests pin the
model contract, the training loop, and the shipped checkpoint's quality
over the sobel baseline in the regime a trained detector exists for
(interior texture gradients stronger than true boundary contrast).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))

cv2 = pytest.importorskip('cv2')

from test_superpixels import _asa  # noqa: E402

CKPT = os.path.join(REPO, 'artifacts', 'edge_detector', 'params.npz')


def test_edgenet_contract_and_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from hsg_tpu.models import edge as edge_lib

    model = edge_lib.EdgeNet()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))['params']
    out = model.apply({'params': params},
                      jnp.zeros((2, 64, 48, 3), jnp.float32))
    assert out['fused'].shape == (2, 64, 48)
    assert all(s.shape == (2, 64, 48) for s in out['sides'])

    # detect() pads odd sizes to the trunk's stride and crops back.
    img = np.random.default_rng(0).uniform(0, 1, (47, 53, 3)) \
        .astype(np.float32)
    strength = edge_lib.detect(img, params)
    assert strength.shape == (47, 53)
    assert 0.0 <= strength.min() and strength.max() <= 1.0

    path = str(tmp_path / 'p.npz')
    edge_lib.save_params(path, params)
    loaded = edge_lib.load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_balanced_bce_weighs_rare_boundaries():
    import jax.numpy as jnp
    from hsg_tpu.models import edge as edge_lib

    # 4% positives: the all-background predictor must NOT be near-free.
    tgt = jnp.zeros((1, 10, 10)).at[0, 5].set(1.0)
    all_bg = jnp.full((1, 10, 10), -8.0)
    loss_bg = float(edge_lib.balanced_bce(all_bg, tgt))
    # A predictor that nails both classes is much better.
    good = jnp.where(tgt > 0, 8.0, -8.0)
    loss_good = float(edge_lib.balanced_bce(good, tgt))
    assert loss_bg > 10 * loss_good
    assert loss_good < 0.01


@pytest.mark.slow
def test_training_smoke_loss_decreases():
    """A short run of the real training loop must reduce the loss."""
    import jax
    from train_edge_detector import make_batch
    import train_edge_detector as trainer

    params = trainer.train(steps=150, batch=4, size=64, log_every=150)
    import jax.numpy as jnp
    from hsg_tpu.models import edge as edge_lib
    model = edge_lib.EdgeNet()
    rng = np.random.default_rng(123)
    imgs, tgts = make_batch(rng, 4, 64)
    out = model.apply({'params': params}, jnp.asarray(imgs))
    trained = float(edge_lib.balanced_bce(out['fused'], jnp.asarray(tgts)))
    fresh = model.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 64, 64, 3)))['params']
    out0 = model.apply({'params': fresh}, jnp.asarray(imgs))
    initial = float(edge_lib.balanced_bce(out0['fused'], jnp.asarray(tgts)))
    assert trained < initial * 0.9, (trained, initial)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason='shipped checkpoint not trained yet')
def test_shipped_detector_quality():
    """The committed checkpoint must (a) beat the sobel detector's
    boundary recall on held-out textured scenes at a matched
    boundary-pixel budget and (b) drive the full OWT-UCM pipeline to a
    sane partition (the role generate_se_owt_ucm.m's SE model plays)."""
    from hsg_tpu.models import edge as edge_lib
    from generate_superpixels import generate, boundary_strength
    from train_edge_detector import (textured_scene, boundary_target,
                                     _boundary_recall)

    params = edge_lib.load_params(CKPT)
    rng = np.random.default_rng(2024)  # disjoint from training seed 0
    se_br, sob_br, asas = [], [], []
    for _ in range(6):
        img, gt = textured_scene(rng, size=96)
        gt_b = boundary_target(gt)
        q = 1.0 - gt_b.mean()
        se = edge_lib.detect(img, params)
        sob = boundary_strength(img)
        se_br.append(_boundary_recall(gt_b, se >= np.quantile(se, q)))
        sob_br.append(_boundary_recall(gt_b, sob >= np.quantile(sob, q)))
        sp = generate(img, max_segments=48, detector='se')
        assert sp.max() + 1 <= 48
        asas.append(_asa(gt, sp))
    print(f'\nse: BR@2 {np.mean(se_br):.3f} vs sobel '
          f'{np.mean(sob_br):.3f} | pipeline ASA {np.mean(asas):.3f}')
    assert np.mean(se_br) > np.mean(sob_br) + 0.03
    assert np.mean(asas) > 0.93
