"""tf.data pipeline matches the Python loader's batch contract."""

import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from make_synthetic_data import make_dataset


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('tfsynth'))
    make_dataset(root, n_images=6, size=64)
    return root


def test_tf_loader_contract(synth):
    from hsg_tpu.data.tf_pipeline import TfDataLoader
    dl = TfDataLoader(synth, os.path.join(synth, 'list.txt'),
                      crop_size=(32, 32), batch_images=2, seed=0)
    for _ in range(3):
        batch = next(dl)
        assert batch['image'].shape == (4, 32, 32, 3)
        assert batch['semantic_label'].shape == (4, 32, 32)
        assert batch['instance_label'].shape == (4, 32, 32)
        assert batch['image'].dtype == np.float32
        # Views consecutive: ids [i, i, j, j].
        ids = batch['image_id']
        assert ids[0] == ids[1] and ids[2] == ids[3]
        # Superpixel labels present; padding (255) allowed.
        assert batch['instance_label'].max() > 0
        # Views differ (independent augmentation).
        assert np.abs(batch['image'][0] - batch['image'][1]).max() > 1e-3
        assert np.isfinite(batch['image']).all()


def test_tf_jitter_ops_match_numpy_exactly():
    """Each ColorJitter op in the tf path must equal the numpy path's
    torchvision-semantics implementation for the same factor (VERDICT.md
    round-1 item: tf.image's built-in brightness is additive and its
    contrast/saturation use different references — we use neither)."""
    from hsg_tpu.data import tf_pipeline as tfp
    from hsg_tpu.data import transforms as T
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    t = tf.constant(img)

    for f in (0.6, 1.0, 1.4):
        np.testing.assert_allclose(
            tfp.tf_adjust_brightness(t, f).numpy(),
            T.adjust_brightness(img, f), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            tfp.tf_adjust_contrast(t, f).numpy(),
            T.adjust_contrast(img, f), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            tfp.tf_adjust_saturation(t, f).numpy(),
            T.adjust_saturation(img, f), rtol=1e-5, atol=1e-6)
    for d in (-0.1, 0.05):
        np.testing.assert_allclose(
            tfp.tf_adjust_hue(t, d).numpy(),
            T.adjust_hue(img, d), rtol=1e-3, atol=5e-3)  # HSV roundtrips


def test_tf_jitter_order_matches_numpy_composition():
    """apply_color_jitter composes ops in the given order; compare a fixed
    permutation against the same composition on the numpy side."""
    from hsg_tpu.data import tf_pipeline as tfp
    from hsg_tpu.data import transforms as T
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(12, 12, 3)).astype(np.float32)
    fb, fc, fs, dh = 1.3, 0.7, 1.2, 0.04
    order = [2, 0, 3, 1]   # saturation, brightness, hue, contrast

    got = tfp.apply_color_jitter(
        tf.constant(img), fb, fc, fs, dh,
        tf.constant(order, tf.int32)).numpy()

    ops = [lambda im: T.adjust_brightness(im, fb),
           lambda im: T.adjust_contrast(im, fc),
           lambda im: T.adjust_saturation(im, fs),
           lambda im: T.adjust_hue(im, dh)]
    want = img
    for i in order:
        want = ops[i](want)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_tf_jitter_statistics(synth):
    """Statistical equivalence of the full augmented-view distribution:
    gate rates and factor independence. Draws many single views and
    checks (a) grayscale rate ~0.2, (b) jitter rate ~0.8, (c) the
    brightness magnitude is NOT correlated with the jitter gate (the
    round-1 bug reused one seed for both)."""
    from hsg_tpu.data import tf_pipeline as tfp
    rng = np.random.default_rng(2)
    img = tf.constant(rng.uniform(0.2, 0.8, (24, 24, 3)).astype(np.float32))
    inst = tf.zeros((24, 24), tf.int32)
    cfg = dict(random_mirror=False, random_scale=False, random_crop=False,
               random_grayscale=True)

    n = 400
    grays, jittered, means = [], [], []
    for i in range(n):
        seed = tf.constant([i, 17], tf.int32)
        v, _ = tfp._one_view(img, inst, (24, 24), (0.5, 0.5, 0.5), seed, cfg)
        v = v.numpy()
        is_gray = np.allclose(v[..., 0], v[..., 1], atol=1e-5)
        changed = not np.allclose(v, img.numpy(), atol=1e-5)
        grays.append(is_gray)
        jittered.append(changed)
        means.append(v.mean())
    gray_rate = np.mean(grays)
    jitter_rate = np.mean(jittered)
    assert 0.12 < gray_rate < 0.30, gray_rate
    assert 0.70 < jitter_rate < 0.95, jitter_rate
    # Jittered views must both brighten and darken (multiplicative factors
    # U(0.6, 1.4) around identity), not skew one way.
    base = float(img.numpy().mean())
    m = np.asarray(means)[np.asarray(jittered) & ~np.asarray(grays)]
    assert (m > base + 0.01).any() and (m < base - 0.01).any()


def test_tf_loader_throughput_smoke(synth):
    """Not a perf assertion — just that the pipeline streams repeatedly
    past one epoch (6 images, batch 4 -> repeat kicks in)."""
    from hsg_tpu.data.tf_pipeline import TfDataLoader
    dl = TfDataLoader(synth, os.path.join(synth, 'list.txt'),
                      crop_size=(32, 32), batch_images=4, seed=1)
    for _ in range(5):
        next(dl)


def test_tf_raw_loader_contract(synth):
    """Raw staging pipeline: uint8 canvases, true sizes, superpixels."""
    from hsg_tpu.data.tf_pipeline import TfRawLoader
    dl = TfRawLoader(synth, os.path.join(synth, 'list.txt'),
                     staging_size=48, batch_images=2, seed=0)
    for _ in range(3):
        b = next(dl)
        assert b['image_raw'].shape == (2, 48, 48, 3)
        assert b['image_raw'].dtype == np.uint8
        assert b['instance_raw'].shape == (2, 48, 48)
        assert b['true_hw'].shape == (2, 2)
        # Source is 64x64 > staging 48 -> downscaled to fit, true_hw
        # records the staged size.
        assert (b['true_hw'] == 48).all()
        assert b['instance_raw'].max() > 0


def test_tf_raw_loader_no_downscale(synth):
    from hsg_tpu.data.tf_pipeline import TfRawLoader
    dl = TfRawLoader(synth, os.path.join(synth, 'list.txt'),
                     staging_size=96, batch_images=2, seed=0)
    b = next(dl)
    assert b['image_raw'].shape == (2, 96, 96, 3)
    assert (b['true_hw'] == 64).all()
    # Padding beyond the true region is zero.
    assert b['image_raw'][:, 64:].max() == 0
    assert b['instance_raw'][:, :, 64:].max() == 0


def test_tf_raw_loader_rect_staging(synth):
    from hsg_tpu.data.tf_pipeline import TfRawLoader
    dl = TfRawLoader(synth, os.path.join(synth, 'list.txt'),
                     staging_size=(32, 96), batch_images=2, seed=0)
    b = next(dl)
    assert b['image_raw'].shape == (2, 32, 96, 3)
    # 64x64 source limited by height 32 -> staged 32x32.
    assert (b['true_hw'] == 32).all()
