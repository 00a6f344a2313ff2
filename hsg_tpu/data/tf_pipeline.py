"""High-throughput tf.data input pipeline (production data path).

The pure-Python loader (hsg_tpu/data/loader.py) tops out around a hundred
images/s; the TPU train step consumes up to ~1600 views/s (stage-1 @ 224²).
This pipeline implements the SAME two-view self-supervised augmentation as
`SelfsupListDataset` (mirror -> scale [0.5, 1.5] -> pad-crop -> photometric
jitter -> grayscale, unsup_dataset.py:105-151) with tf.data parallel maps +
prefetch, yielding numpy batch dicts with the same contract (views
flattened into consecutive batch rows).

Photometric fidelity: the jitter reimplements torchvision's ColorJitter
math exactly (multiplicative brightness; contrast/saturation blended
against the Rec.601 grayscale; per-op clipping; SHUFFLED op order), with
an independent stateless seed for every random draw — gates and
magnitudes are never correlated. Equivalence against the numpy path is
unit-tested op-by-op (tests/test_tf_pipeline.py). Remaining documented
difference: hue uses tf.image's HSV roundtrip vs cv2's (numerically
equivalent up to float rounding). TensorFlow is an optional dependency;
import of this module fails cleanly without it.
"""

from __future__ import annotations

import numpy as np

import tensorflow as tf

tf.config.set_visible_devices([], 'GPU')  # host-only pipeline

from hsg_tpu.data.dataset import read_list_file


def _decode_label(path):
    raw = tf.io.read_file(path)
    lab = tf.image.decode_png(raw, channels=1, dtype=tf.uint16)
    return tf.cast(lab[..., 0], tf.int32)


def _tf_gray(img):
    """Rec.601 luma, matching transforms._to_grayscale / torchvision."""
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])


def tf_adjust_brightness(img, factor):
    """Multiplicative brightness (torchvision; NOT tf.image's additive)."""
    return tf.clip_by_value(img * factor, 0.0, 1.0)


def tf_adjust_contrast(img, factor):
    """Blend against the MEAN GRAY level (torchvision; NOT tf.image's
    per-channel means)."""
    mean = tf.reduce_mean(_tf_gray(img))
    return tf.clip_by_value((img - mean) * factor + mean, 0.0, 1.0)


def tf_adjust_saturation(img, factor):
    """Blend against the per-pixel grayscale (torchvision; NOT tf.image's
    HSV scaling)."""
    gray = _tf_gray(img)[..., None]
    return tf.clip_by_value((img - gray) * factor + gray, 0.0, 1.0)


def tf_adjust_hue(img, delta):
    return tf.clip_by_value(tf.image.adjust_hue(img, delta), 0.0, 1.0)


def apply_color_jitter(img, brightness_f, contrast_f, saturation_f,
                       hue_d, order):
    """ColorJitter with explicit factors and op order `order` (a [4] int
    tensor permutation of 0..3) — torchvision applies its four ops in a
    random order (unsup_dataset.py:127-133 uses ColorJitter(.4,.4,.4,.1)).
    """
    for i in range(4):
        img = tf.switch_case(order[i], [
            lambda im=img: tf_adjust_brightness(im, brightness_f),
            lambda im=img: tf_adjust_contrast(im, contrast_f),
            lambda im=img: tf_adjust_saturation(im, saturation_f),
            lambda im=img: tf_adjust_hue(im, hue_d),
        ])
    return img


def _one_view(img, inst, crop, img_mean, seed, cfg):
    """One independently augmented view; `seed` is a [2] stateless seed.
    Every random draw gets its own stateless seed (gates and magnitudes
    are independent)."""
    seeds = tf.random.experimental.stateless_split(seed, num=11)
    ch, cw = crop

    if cfg['random_mirror']:
        flip = tf.random.stateless_uniform([], seeds[0]) >= 0.5
        img = tf.cond(flip, lambda: img[:, ::-1], lambda: img)
        inst = tf.cond(flip, lambda: inst[:, ::-1], lambda: inst)

    if cfg['random_scale']:
        ratio = tf.random.stateless_uniform([], seeds[1], 0.5, 1.5)
        shape = tf.shape(img)
        nh = tf.cast(tf.cast(shape[0], tf.float32) * ratio, tf.int32)
        nw = tf.cast(tf.cast(shape[1], tf.float32) * ratio, tf.int32)
        img = tf.image.resize(img, [nh, nw], method='bilinear')
        inst = tf.image.resize(inst[..., None], [nh, nw],
                               method='nearest')[..., 0]

    if cfg['random_crop']:
        # Pad (image with channel means, labels with 255) then random crop
        # (transforms.random_crop_with_pad semantics, left-top anchored).
        shape = tf.shape(img)
        ph = tf.maximum(ch, shape[0])
        pw = tf.maximum(cw, shape[1])
        mean = tf.constant(img_mean, tf.float32)
        img = tf.pad(img, [[0, ph - shape[0]], [0, pw - shape[1]], [0, 0]])
        pad_mask = tf.pad(tf.ones(shape[:2]),
                          [[0, ph - shape[0]], [0, pw - shape[1]]])
        img = img + (1.0 - pad_mask[..., None]) * mean
        inst = tf.pad(inst, [[0, ph - shape[0]], [0, pw - shape[1]]],
                      constant_values=255)
        oy = tf.random.stateless_uniform(
            [], seeds[2], 0, tf.maximum(ph - ch, 1), dtype=tf.int32)
        ox = tf.random.stateless_uniform(
            [], seeds[3], 0, tf.maximum(pw - cw, 1), dtype=tf.int32)
        img = img[oy:oy + ch, ox:ox + cw]
        inst = inst[oy:oy + ch, ox:ox + cw]

    if cfg['random_grayscale']:
        # ColorJitter(0.4, 0.4, 0.4, 0.1) @ p=0.8 then RandomGrayscale
        # @ p=0.2 (unsup_dataset.py:127-133): torchvision factor ranges
        # U(1-a, 1+a) (hue U(-h, h)), shuffled op order.
        def jitter(im):
            fb = tf.random.stateless_uniform([], seeds[5], 0.6, 1.4)
            fc = tf.random.stateless_uniform([], seeds[6], 0.6, 1.4)
            fs = tf.random.stateless_uniform([], seeds[7], 0.6, 1.4)
            dh = tf.random.stateless_uniform([], seeds[8], -0.1, 0.1)
            order = tf.random.experimental.stateless_shuffle(
                tf.range(4, dtype=tf.int32), seed=seeds[9])
            return apply_color_jitter(im, fb, fc, fs, dh, order)
        do_jitter = tf.random.stateless_uniform([], seeds[4]) < 0.8
        img = tf.cond(do_jitter, lambda: jitter(img), lambda: img)
        do_gray = tf.random.stateless_uniform([], seeds[10]) < 0.2
        img = tf.cond(
            do_gray,
            lambda: tf.tile(_tf_gray(img)[..., None], [1, 1, 3]),
            lambda: img)

    img.set_shape([ch, cw, 3])
    inst.set_shape([ch, cw])
    return img, inst


def make_selfsup_dataset(data_dir, data_list, crop_size,
                         img_mean=(0.485, 0.456, 0.406),
                         img_std=(0.229, 0.224, 0.225),
                         batch_images=8, num_views=2,
                         random_mirror=True, random_scale=True,
                         random_crop=True, random_grayscale=True,
                         shuffle=True, seed=0, photometric='host',
                         cache_decoded=False):
    """tf.data.Dataset of collated batches (dict of numpy-convertible
    tensors): image `[B, H, W, 3]`, semantic_label / instance_label
    `[B, H, W]`, image_id `[B]` with `B = batch_images * num_views`,
    consecutive views per image.

    photometric: 'host' applies ColorJitter/grayscale + normalization
    here; 'device' skips both and emits raw [0, 1] views for the
    on-device stage (hsg_tpu/data/device_aug.py).
    cache_decoded: keep decoded images in host RAM after the first epoch
    (skips file IO + PNG/JPEG decode on every later epoch — use when the
    decoded dataset fits memory; augmentation stays per-epoch random).
    """
    images, _, instances = read_list_file(data_dir, data_list)
    if not instances:
        instances = [''] * len(images)
    cfg = dict(random_mirror=random_mirror, random_scale=random_scale,
               random_crop=random_crop,
               random_grayscale=random_grayscale and photometric == 'host')
    mean = np.asarray(img_mean, np.float32)
    std = np.asarray(img_std, np.float32)
    crop = tuple(crop_size)

    ds = tf.data.Dataset.from_tensor_slices(
        (list(images), list(instances), np.arange(len(images), dtype=np.int32)))

    def load(img_path, inst_path, idx):
        # uint8 until after the cache: 3 bytes/pixel cached, not 12.
        raw = tf.io.read_file(img_path)
        img = tf.image.decode_image(raw, channels=3,
                                    expand_animations=False)
        inst = tf.cond(tf.strings.length(inst_path) > 0,
                       lambda: _decode_label(inst_path),
                       lambda: tf.zeros(tf.shape(img)[:2], tf.int32))
        return img, inst, idx

    def to_float(img, inst, idx):
        return tf.cast(img, tf.float32) / 255.0, inst, idx

    if cache_decoded:
        # Decode once, cache (as uint8), THEN repeat/shuffle/augment.
        ds = ds.map(load, num_parallel_calls=tf.data.AUTOTUNE).cache()
        ds = ds.repeat()
        if shuffle:
            ds = ds.shuffle(min(len(images), 8192), seed=seed,
                            reshuffle_each_iteration=True)
    else:
        ds = ds.repeat()
        if shuffle:
            ds = ds.shuffle(min(len(images), 8192), seed=seed,
                            reshuffle_each_iteration=True)
        ds = ds.map(load, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.map(to_float, num_parallel_calls=tf.data.AUTOTUNE)
    rng = tf.random.Generator.from_seed(seed)

    def augment(img, inst, idx):
        seeds = rng.make_seeds(num_views)
        views_img, views_inst = [], []
        for v in range(num_views):
            vi, vl = _one_view(img, inst, crop, img_mean, seeds[:, v], cfg)
            if photometric == 'host':
                vi = (vi - mean) / std
            views_img.append(vi)
            views_inst.append(vl)
        imgs = tf.stack(views_img)                      # [V, H, W, 3]
        insts = tf.stack(views_inst)
        sems = tf.zeros_like(insts)                     # unsup: no GT
        ids = tf.fill([num_views], idx)
        return imgs, sems, insts, ids

    ds = ds.map(augment, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_images, drop_remainder=True)

    def collate(imgs, sems, insts, ids):
        b = batch_images * num_views
        return {
            'image': tf.reshape(imgs, [b, crop[0], crop[1], 3]),
            'semantic_label': tf.reshape(sems, [b, crop[0], crop[1]]),
            'instance_label': tf.reshape(insts, [b, crop[0], crop[1]]),
            'image_id': tf.reshape(ids, [b]),
        }

    ds = ds.map(collate, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.prefetch(tf.data.AUTOTUNE)


def make_raw_dataset(data_dir, data_list, staging_size=512,
                     batch_images=8, shuffle=True, seed=0,
                     cache_decoded=True):
    """Raw staging pipeline for FULLY on-device augmentation
    (hsg_tpu/data/device_aug.py `random_geometric_views`): the host only
    decodes (cached after epoch 1) and stacks fixed-size uint8 canvases —
    every augmentation op (mirror/scale/crop/jitter) runs in the jitted
    train step.

    Yields dicts: image_raw uint8 `[B, Sh, Sw, 3]` (source top-left,
    zero-padded), instance_raw int32 `[B, Sh, Sw]`, true_hw int32
    `[B, 2]`, image_id int32 `[B]`. `staging_size` is an int (square) or
    an (Sh, Sw) pair (e.g. Cityscapes 2:1 frames). Sources larger than
    the canvas on either side are downscaled (aspect-preserving) to fit,
    and true_hw records the staged size.
    """
    images, _, instances = read_list_file(data_dir, data_list)
    if not instances:
        instances = [''] * len(images)
    if isinstance(staging_size, (tuple, list)):
        sh, sw = int(staging_size[0]), int(staging_size[1])
    else:
        sh = sw = int(staging_size)

    ds = tf.data.Dataset.from_tensor_slices(
        (list(images), list(instances),
         np.arange(len(images), dtype=np.int32)))

    def load(img_path, inst_path, idx):
        img = tf.io.decode_image(tf.io.read_file(img_path), channels=3,
                                 expand_animations=False)     # uint8
        inst = tf.cond(tf.strings.length(inst_path) > 0,
                       lambda: _decode_label(inst_path),
                       lambda: tf.zeros(tf.shape(img)[:2], tf.int32))
        shape = tf.shape(img)
        h, w = shape[0], shape[1]
        ratio = tf.minimum(
            1.0, tf.minimum(sh / tf.cast(h, tf.float32),
                            sw / tf.cast(w, tf.float32)))
        nh = tf.cast(tf.cast(h, tf.float32) * ratio, tf.int32)
        nw = tf.cast(tf.cast(w, tf.float32) * ratio, tf.int32)
        img = tf.cond(
            ratio < 1.0,
            lambda: tf.cast(tf.image.resize(tf.cast(img, tf.float32),
                                            [nh, nw], method='bilinear'),
                            tf.uint8),
            lambda: img)
        inst = tf.cond(
            ratio < 1.0,
            lambda: tf.cast(tf.image.resize(
                tf.cast(inst[..., None], tf.float32), [nh, nw],
                method='nearest')[..., 0], tf.int32),
            lambda: inst)
        shape = tf.shape(img)
        img = tf.pad(img, [[0, sh - shape[0]], [0, sw - shape[1]], [0, 0]])
        inst = tf.pad(inst, [[0, sh - shape[0]], [0, sw - shape[1]]])
        img.set_shape([sh, sw, 3])
        inst.set_shape([sh, sw])
        return img, inst, tf.stack([shape[0], shape[1]]), idx

    ds = ds.map(load, num_parallel_calls=tf.data.AUTOTUNE)
    if cache_decoded:
        ds = ds.cache()
    ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(min(len(images), 8192), seed=seed,
                        reshuffle_each_iteration=True)
    ds = ds.batch(batch_images, drop_remainder=True)

    def collate(img, inst, hw, idx):
        # uint16 labels: superpixel ids fit, and the host->device stream
        # drops from 0.92 to 0.66 MB/view (uint8 image + uint16 label).
        return {'image_raw': img,
                'instance_raw': tf.cast(inst, tf.uint16),
                'true_hw': hw, 'image_id': idx}

    ds = ds.map(collate, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.prefetch(tf.data.AUTOTUNE)


class TfRawLoader:
    """Iterator facade over `make_raw_dataset`."""

    def __init__(self, data_dir, data_list, staging_size, batch_images,
                 **kwargs):
        self._ds = make_raw_dataset(data_dir, data_list, staging_size,
                                    batch_images, **kwargs)
        self._it = self._ds.as_numpy_iterator()

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)

    def close(self):
        pass


class TfDataLoader:
    """Iterator facade matching `PrefetchLoader`'s contract."""

    def __init__(self, data_dir, data_list, crop_size, batch_images,
                 **kwargs):
        self._ds = make_selfsup_dataset(
            data_dir, data_list, crop_size, batch_images=batch_images,
            **kwargs)
        self._it = self._ds.as_numpy_iterator()

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)

    def close(self):
        pass
