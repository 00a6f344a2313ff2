"""On-device photometric augmentation: fidelity vs the host numpy path,
HSV correctness, distributions, and train-step integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hsg_tpu.data import device_aug
from hsg_tpu.data import transforms as T


def test_adjust_ops_match_numpy_transforms():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (14, 14, 3)).astype(np.float32)
    j = jnp.asarray(img)
    for f in (0.6, 1.0, 1.4):
        np.testing.assert_allclose(device_aug.adjust_brightness(j, f),
                                   T.adjust_brightness(img, f),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(device_aug.adjust_contrast(j, f),
                                   T.adjust_contrast(img, f),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(device_aug.adjust_saturation(j, f),
                                   T.adjust_saturation(img, f),
                                   rtol=1e-5, atol=1e-6)
    for d in (-0.1, 0.07):
        np.testing.assert_allclose(device_aug.adjust_hue(j, d),
                                   T.adjust_hue(img, d),
                                   rtol=1e-3, atol=5e-3)


def test_hsv_roundtrip_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (10, 10, 3)), jnp.float32)
    h, s, v = device_aug.rgb_to_hsv(img)
    back = device_aug.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img),
                               rtol=1e-5, atol=1e-5)


def test_random_photometric_distribution():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0.2, 0.8, (256, 8, 8, 3)), jnp.float32)
    out = jax.jit(device_aug.random_photometric)(imgs,
                                                 jax.random.PRNGKey(3))
    out = np.asarray(out)
    gray = np.isclose(out[..., 0], out[..., 1], atol=1e-5).all(axis=(1, 2))
    changed = ~np.isclose(out, np.asarray(imgs), atol=1e-5).all(axis=(1, 2, 3))
    assert 0.10 < gray.mean() < 0.32, gray.mean()
    assert 0.68 < changed.mean() < 0.97, changed.mean()
    means = out.reshape(256, -1).mean(axis=1)
    base = float(np.asarray(imgs).mean())
    assert (means > base + 0.01).any() and (means < base - 0.01).any()
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


@pytest.mark.slow
def test_train_step_device_photometric_matches_host_normalization():
    """With jitter and grayscale off, the on-device stage reduces to
    normalization — the step must produce the identical loss as the host-
    normalized path."""
    from test_train_step import _cfg, _model, _batch
    from hsg_tpu.models import predictions as pred_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib

    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    mean, std = (0.4, 0.45, 0.5), (0.2, 0.25, 0.3)

    raw = _batch(b=4)
    raw['image'] = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, raw['image'].shape),
        jnp.float32)
    normalized = dict(raw)
    normalized['image'] = ((raw['image'] - jnp.asarray(mean))
                           / jnp.asarray(std))

    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), normalized)
    schedule = opt_lib.schedule_from_config(cfg)

    host_step = jax.jit(ts_lib.make_train_step(
        model, prediction, schedule, update_fn))
    dev_step = jax.jit(ts_lib.make_train_step(
        model, prediction, schedule, update_fn,
        device_photometric={'mean': mean, 'std': std,
                            'jitter_p': 0.0, 'grayscale_p': 0.0}))

    # NB: the device path consumes one rng split for augmentation, so use
    # the same key and compare only the loss determinism of the math, with
    # dropout disabled (transformer_dropout=0 in _model).
    _, m_host = host_step(state, normalized, jax.random.PRNGKey(1))
    _, m_dev = dev_step(state, raw, jax.random.PRNGKey(1))
    # rtol covers XLA reassociation between the two compiled programs
    # (e.g. the fused normalize lowering to reciprocal-multiply): the
    # input-level ulp differences amplify to ~2e-5 in the loss.
    np.testing.assert_allclose(float(m_dev['loss']), float(m_host['loss']),
                               rtol=5e-5)


# ---------------------------------------------------------------------------
# Geometric warp (mirror -> scale -> pad -> crop as one fused gather).


def _host_view(img, lab, flip, ratio, u_y, u_x, crop, image_pad,
               label_pad=255):
    """The host chain with explicit params (transforms.py semantics)."""
    import cv2
    if flip:
        img, lab = img[:, ::-1].copy(), lab[:, ::-1].copy()
    h, w = img.shape[:2]
    h2, w2 = max(int(ratio * h), 1), max(int(ratio * w), 1)
    img = cv2.resize(img, (w2, h2), interpolation=cv2.INTER_LINEAR)
    lab = cv2.resize(lab.astype(np.float32), (w2, h2),
                     interpolation=cv2.INTER_NEAREST).astype(lab.dtype)
    img = T.resize_with_pad(img, (crop, crop), image_pad)
    lab = T.resize_with_pad(lab, (crop, crop), label_pad)
    ph, pw = img.shape[:2]
    sy = int(np.floor(u_y * (ph - crop)))
    sx = int(np.floor(u_x * (pw - crop)))
    return (img[sy:sy + crop, sx:sx + crop],
            lab[sy:sy + crop, sx:sx + crop])


def test_warp_view_matches_host_chain():
    import pytest
    pytest.importorskip('cv2')
    rng = np.random.default_rng(5)
    S, H, W, crop = 96, 80, 72, 48
    canvas = np.zeros((S, S, 3), np.float32)
    canvas[:H, :W] = rng.uniform(0, 1, (H, W, 3))
    lab_canvas = np.zeros((S, S), np.int32)
    lab_canvas[:H, :W] = rng.integers(0, 30, (H, W))
    pad = (0.4, 0.5, 0.6)

    for flip, ratio, u_y, u_x in [(False, 1.0, 0.0, 0.0),
                                  (True, 1.0, 0.3, 0.7),
                                  (False, 1.3, 0.5, 0.2),
                                  (True, 0.55, 0.0, 0.9),
                                  (False, 0.5, 0.8, 0.1)]:
        got_img, got_lab, got_inside = device_aug.warp_view(
            jnp.asarray(canvas), jnp.asarray(lab_canvas),
            jnp.int32(H), jnp.int32(W), jnp.asarray(flip),
            jnp.float32(ratio), jnp.float32(u_y), jnp.float32(u_x),
            crop, pad)
        want_img, want_lab = _host_view(
            canvas[:H, :W], lab_canvas[:H, :W], flip, ratio, u_y, u_x,
            crop, pad)
        np.testing.assert_allclose(np.asarray(got_img), want_img,
                                   atol=2e-2,
                                   err_msg=f'{flip} {ratio} {u_y} {u_x}')
        # Nearest-neighbor rounding can differ along region borders by
        # one source pixel; require near-total agreement instead of
        # exactness.
        mismatch = np.mean(np.asarray(got_lab) != want_lab)
        assert mismatch < 0.06, (flip, ratio, u_y, u_x, mismatch)
        # inside mask == host pad region (label_pad never collides with
        # source labels in this fixture, so 255 marks padding exactly).
        np.testing.assert_array_equal(np.asarray(got_inside),
                                      want_lab != 255)


def test_random_geometric_views_shapes_and_padding():
    rng = np.random.default_rng(0)
    b, S, crop, v = 3, 64, 32, 2
    imgs = (rng.uniform(0, 255, (b, S, S, 3))).astype(np.uint8)
    labs = rng.integers(0, 9, (b, S, S)).astype(np.int32)
    hw = np.asarray([[64, 64], [40, 50], [64, 30]], np.int32)
    out_i, out_l, out_in = device_aug.random_geometric_views(
        jnp.asarray(imgs), jnp.asarray(labs), jnp.asarray(hw),
        jax.random.PRNGKey(0), crop, num_views=v,
        image_pad=(0.25, 0.5, 0.75))
    assert out_i.shape == (b * v, crop, crop, 3)
    assert out_l.shape == (b * v, crop, crop)
    assert out_in.shape == (b * v, crop, crop)
    out_i = np.asarray(out_i)
    out_l = np.asarray(out_l)
    # label pad sentinel and inside mask agree (labels here are < 9).
    np.testing.assert_array_equal(np.asarray(out_in), out_l != 255)
    assert out_i.min() >= 0.0 and out_i.max() <= 1.0
    # Wherever the label is padding (255), the image must be the pad color.
    pad_mask = out_l == 255
    if pad_mask.any():
        padded = out_i[pad_mask]
        np.testing.assert_allclose(
            padded, np.broadcast_to((0.25, 0.5, 0.75), padded.shape),
            atol=1e-6)
    # Views of the same image differ (independent augmentation).
    assert np.abs(out_i[0] - out_i[1]).max() > 1e-3


def test_mirror_p_honored():
    """mirror_p=0 must never flip; mirror_p=1 must always flip (ADVICE
    round-2: flip was hardcoded to p=0.5 regardless of the argument)."""
    rng = np.random.default_rng(3)
    b, S = 2, 16
    imgs = rng.integers(0, 255, (b, S, S, 3)).astype(np.uint8)
    labs = rng.integers(0, 9, (b, S, S)).astype(np.int32)
    hw = np.full((b, 2), S, np.int32)
    common = dict(crop=S, num_views=2, scale_min=1.0, scale_max=1.0)
    no_flip, no_flip_l, _ = device_aug.random_geometric_views(
        jnp.asarray(imgs), jnp.asarray(labs), jnp.asarray(hw),
        jax.random.PRNGKey(0), mirror_p=0.0, **common)
    all_flip, all_flip_l, _ = device_aug.random_geometric_views(
        jnp.asarray(imgs), jnp.asarray(labs), jnp.asarray(hw),
        jax.random.PRNGKey(0), mirror_p=1.0, **common)
    src = imgs.astype(np.float32) / 255.0
    for v in range(2):
        for i in range(b):
            np.testing.assert_allclose(np.asarray(no_flip[i * 2 + v]),
                                       src[i], atol=1e-5)
            np.testing.assert_array_equal(np.asarray(no_flip_l[i * 2 + v]),
                                          labs[i])
            np.testing.assert_allclose(np.asarray(all_flip[i * 2 + v]),
                                       src[i, :, ::-1], atol=1e-5)
            np.testing.assert_array_equal(np.asarray(all_flip_l[i * 2 + v]),
                                          labs[i, :, ::-1])


@pytest.mark.slow
def test_raw_pad_pixels_ignored_matches_host():
    """ADVICE round-2 medium: crop padding must carry the semantic ignore
    index into the step, exactly as the reference's host pipeline pads
    labels with 255. With deterministic geometry (scale=1, no mirror,
    jitter off) the raw-staged step must equal a host batch built with
    sem=255 in the pad region."""
    from test_train_step import _cfg, _model
    from hsg_tpu.models import predictions as pred_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib

    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    rng = np.random.default_rng(11)
    n_img, S, crop, v = 2, 32, 32, 2
    mean, std = (0.4, 0.45, 0.5), (0.2, 0.25, 0.3)

    canvases = rng.integers(0, 255, (n_img, S, S, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, (n_img, S, S)).astype(np.int32)
    true_hw = np.asarray([[20, 24], [32, 18]], np.int32)

    raw_batch = {
        'image_raw': jnp.asarray(canvases),
        'instance_raw': jnp.asarray(labels),
        'true_hw': jnp.asarray(true_hw),
        'image_index': jnp.arange(n_img, dtype=jnp.int32),
    }
    # Equivalent host batch: each image replicated over its 2 (identical,
    # deterministic-geometry) views; pad region gets sem=255 / inst=0 and
    # normalized-zero pixels (image pad = mean).
    imgs, sems, insts = [], [], []
    for i in range(n_img):
        h, w = true_hw[i]
        img = np.zeros((crop, crop, 3), np.float32)
        img[:h, :w] = canvases[i, :h, :w].astype(np.float32) / 255.0
        img[:h, :w] = (img[:h, :w] - mean) / std
        sem = np.full((crop, crop), 255, np.int32)
        sem[:h, :w] = 0
        inst = np.zeros((crop, crop), np.int32)
        inst[:h, :w] = labels[i, :h, :w]
        for _ in range(v):
            imgs.append(img)
            sems.append(sem)
            insts.append(inst)
    host_batch = {
        'image': jnp.asarray(np.stack(imgs)),
        'semantic_label': jnp.asarray(np.stack(sems)),
        'instance_label': jnp.asarray(np.stack(insts)),
        'image_index': jnp.asarray(np.arange(n_img * v) // v, jnp.int32),
    }

    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), host_batch)
    schedule = opt_lib.schedule_from_config(cfg)
    host_step = jax.jit(ts_lib.make_train_step(
        model, prediction, schedule, update_fn))
    raw_step = jax.jit(ts_lib.make_train_step(
        model, prediction, schedule, update_fn,
        device_photometric={
            'mean': mean, 'std': std, 'jitter_p': 0.0, 'grayscale_p': 0.0,
            'geometric': {'crop': crop, 'num_views': v,
                          'scale_min': 1.0, 'scale_max': 1.0,
                          'mirror_p': 0.0},
        }))
    _, m_host = host_step(state, host_batch, jax.random.PRNGKey(1))
    _, m_raw = raw_step(state, raw_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_raw['loss']), float(m_host['loss']),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_raw['img_sim_loss']),
                               float(m_host['img_sim_loss']), rtol=1e-4)


@pytest.mark.slow
def test_train_step_raw_geometric_mode():
    """Full raw-staged path: the step consumes uint8 canvases + true
    sizes, produces views on device, and trains to a finite loss."""
    from test_train_step import _cfg, _model
    from hsg_tpu.models import predictions as pred_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib

    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    rng = np.random.default_rng(2)
    n_img, S, crop, v = 2, 48, 32, 2

    raw_batch = {
        'image_raw': jnp.asarray(
            rng.integers(0, 255, (n_img, S, S, 3)), jnp.uint8),
        'instance_raw': jnp.asarray(
            rng.integers(0, 6, (n_img, S, S)), jnp.int32),
        'true_hw': jnp.asarray([[48, 48], [40, 44]], jnp.int32),
        'image_index': jnp.arange(n_img, dtype=jnp.int32),
    }
    init_batch = {
        'image': jnp.zeros((n_img * v, crop, crop, 3), jnp.float32),
        'semantic_label': jnp.zeros((n_img * v, crop, crop), jnp.int32),
        'instance_label': jnp.zeros((n_img * v, crop, crop), jnp.int32),
    }
    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), init_batch)
    schedule = opt_lib.schedule_from_config(cfg)
    step = jax.jit(ts_lib.make_train_step(
        model, prediction, schedule, update_fn,
        device_photometric={
            'mean': (0.4, 0.45, 0.5), 'std': (0.2, 0.25, 0.3),
            'geometric': {'crop': crop, 'num_views': v},
        }))
    new_state, metrics = step(state, raw_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert int(new_state.step) == 1
    # A second step with different rng gives a different (finite) loss —
    # augmentation is live inside the step.
    _, metrics2 = step(state, raw_batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics2['loss']))
    assert abs(float(metrics2['loss']) - float(metrics['loss'])) > 1e-7
