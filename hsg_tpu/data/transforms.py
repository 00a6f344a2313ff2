"""Host-side numpy/cv2 image transforms.

Capability parity with reference `hsg/data/transforms.py` (resize,
random_resize, mirror, resize_with_interpolation, resize_with_pad,
random_crop_with_pad) plus the photometric augmentations the reference
takes from torchvision (ColorJitter / RandomGrayscale / Gaussian blur,
unsup_dataset.py:127-142), re-implemented in numpy so the data path has no
torch dependency. All functions take/return float32 HWC arrays in [0, 1]
(images) and int HWC/HW arrays (labels); randomness comes from an explicit
`np.random.Generator` for reproducibility.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _resize(arr, new_w, new_h, nearest):
    if _HAS_CV2:
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        out = cv2.resize(arr, (new_w, new_h), interpolation=interp)
        return out
    # numpy fallback: nearest sampling.
    h, w = arr.shape[:2]
    rows = np.clip((np.arange(new_h) * h / new_h).astype(int), 0, h - 1)
    cols = np.clip((np.arange(new_w) * w / new_w).astype(int), 0, w - 1)
    return arr[rows][:, cols]


def resize(image, label, ratio):
    """Scale image (bilinear) and label (nearest) by `ratio`."""
    h, w = image.shape[:2]
    new_h, new_w = int(ratio * h), int(ratio * w)
    return (_resize(image, new_w, new_h, nearest=False),
            _resize(label, new_w, new_h, nearest=True))


def random_resize(image, label, scale_min, scale_max, rng):
    ratio = rng.uniform(scale_min, scale_max)
    return resize(image, label, ratio)


def mirror(image, label):
    return image[:, ::-1].copy(), label[:, ::-1].copy()


def random_mirror(image, label, rng):
    if rng.uniform() >= 0.5:
        return mirror(image, label)
    return image, label


def resize_with_interpolation(image, larger_size, nearest=False):
    """Scale so the larger side equals `larger_size` (aspect preserved)."""
    h, w = image.shape[:2]
    ratio = min(float(larger_size) / h, float(larger_size) / w)
    new_h, new_w = int(ratio * h), int(ratio * w)
    return _resize(image, new_w, new_h, nearest=nearest)


def resize_with_pad(image, size, pad_value=0, pad_mode='left_top'):
    """Pad (never crop) up to at least `size`, anchored left-top/center."""
    h, w = image.shape[:2]
    out_h, out_w = max(h, size[0]), max(w, size[1])
    shape = (out_h, out_w) + image.shape[2:]
    out = np.empty(shape, dtype=image.dtype)
    if np.isscalar(pad_value):
        out.fill(pad_value)
    else:
        out[...] = np.asarray(pad_value, dtype=image.dtype)
    if pad_mode == 'center':
        sy, sx = (out_h - h) // 2, (out_w - w) // 2
    elif pad_mode == 'left_top':
        sy = sx = 0
    else:
        raise ValueError(f'unsupported pad mode {pad_mode}')
    out[sy:sy + h, sx:sx + w] = image
    return out


def random_crop_with_pad(image, label, crop_size, image_pad_value,
                         label_pad_value, rng, pad_mode='left_top'):
    """Pad to at least crop_size, then take a uniform random crop."""
    image = resize_with_pad(image, crop_size, image_pad_value, pad_mode)
    label = resize_with_pad(label, crop_size, label_pad_value, pad_mode)
    h, w = image.shape[:2]
    sy = int(np.floor(rng.uniform(0, h - crop_size[0])))
    sx = int(np.floor(rng.uniform(0, w - crop_size[1])))
    return (image[sy:sy + crop_size[0], sx:sx + crop_size[1]],
            label[sy:sy + crop_size[0], sx:sx + crop_size[1]])


# ---------------------------------------------------------------------------
# Photometric augmentations (torchvision-equivalent, numpy).


def _to_grayscale(image):
    return (0.299 * image[..., 0] + 0.587 * image[..., 1]
            + 0.114 * image[..., 2])


def adjust_brightness(image, factor):
    return np.clip(image * factor, 0, 1)


def adjust_contrast(image, factor):
    mean = _to_grayscale(image).mean()
    return np.clip((image - mean) * factor + mean, 0, 1)


def adjust_saturation(image, factor):
    gray = _to_grayscale(image)[..., None]
    return np.clip((image - gray) * factor + gray, 0, 1)


def adjust_hue(image, delta):
    """Shift hue by `delta` (in turns, torchvision convention [-0.5, 0.5])."""
    if _HAS_CV2:
        hsv = cv2.cvtColor(image.astype(np.float32), cv2.COLOR_RGB2HSV)
        hsv[..., 0] = np.mod(hsv[..., 0] + delta * 360.0, 360.0)
        return np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
    return image  # pragma: no cover


def color_jitter(image, rng, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1):
    """torchvision-style ColorJitter: random factors, random order."""
    ops = []
    if brightness:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: adjust_brightness(im, f))
    if contrast:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: adjust_contrast(im, f))
    if saturation:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: adjust_saturation(im, f))
    if hue:
        d = rng.uniform(-hue, hue)
        ops.append(lambda im: adjust_hue(im, d))
    for i in rng.permutation(len(ops)):
        image = ops[i](image)
    return image.astype(np.float32)


def random_grayscale(image, rng, p=0.2):
    if rng.uniform() < p:
        gray = _to_grayscale(image)
        return np.repeat(gray[..., None], 3, axis=2).astype(np.float32)
    return image


def random_gaussian_blur(image, rng, p=0.5):
    """Reference's random blur (unsup_dataset.py:137-142): 5x5 kernel
    exp(-(x^2+y^2)/sigma^2) with sigma ~ U(0.1, 5)."""
    if rng.uniform() >= p:
        return image
    sigma = rng.uniform(0.1, 5.0)
    wx, wy = np.meshgrid(np.linspace(-2, 2, 5), np.linspace(-2, 2, 5))
    weight = np.exp(-(wx ** 2 + wy ** 2) / sigma ** 2)
    weight = (weight / weight.sum()).astype(np.float32)
    if _HAS_CV2:
        return cv2.filter2D(image, -1, weight)
    return image  # pragma: no cover


def create_image_pyramid(image, semantic_label, instance_label, scales,
                         is_flip=True):
    """Multi-scale (+flip) TTA pyramid.

    Parity with reference `create_image_pyramid`
    (hsg/utils/general/others.py:10-47). image is HWC float; labels HW.
    Returns a list of (image, sem, inst, {'is_flip': bool}).
    """
    out = []
    flips = [True, False] if is_flip else [False]
    for scale in scales:
        for flip in flips:
            lab = np.stack([semantic_label, instance_label], axis=2)
            img, lab2 = resize(image, lab, scale)
            if flip:
                img = img[:, ::-1].copy()
                lab2 = lab2[:, ::-1].copy()
            out.append((img, lab2[..., 0], lab2[..., 1], {'is_flip': flip}))
    return out
