"""On-device photometric augmentation (TPU offload of the host jitter).

The host input pipeline spends most of its CPU on the photometric ops
(four full float passes per view: brightness/contrast/saturation/hue,
plus grayscale) — the geometric ops (decode, scale, crop) are cheap by
comparison. Moving the photometric stage into the jitted train step frees
the host to feed ~3-4x more views/s while the elementwise math rides the
TPU's VPU for effectively free (it fuses into the input normalization).

Semantics match torchvision's ColorJitter(0.4, 0.4, 0.4, 0.1) @ p=0.8 +
RandomGrayscale @ p=0.2 exactly as the host paths do
(hsg_tpu/data/transforms.py, reference unsup_dataset.py:127-133):
multiplicative brightness, contrast/saturation blended against Rec.601
grayscale, HSV hue rotation, per-op clipping, SHUFFLED op order,
independent draws per view. Input images are raw [0, 1] RGB; the output
is mean/std-normalized — i.e. this replaces the loader's normalization
step too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gray(img):
    """Rec.601 luma (matches transforms._to_grayscale)."""
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(_gray(img))
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _gray(img)[..., None]
    return jnp.clip((img - gray) * factor + gray, 0.0, 1.0)


def rgb_to_hsv(img):
    """Vectorized RGB->HSV on [0, 1] floats (h in [0, 1) turns)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    hr = jnp.mod((g - b) / safe, 6.0)
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb)) / 6.0
    h = jnp.where(diff > 0, h, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = jnp.mod(i, 6.0).astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, delta):
    """Rotate hue by `delta` turns (torchvision convention [-0.5, 0.5])."""
    h, s, v = rgb_to_hsv(img)
    h = jnp.mod(h + delta, 1.0)
    return jnp.clip(hsv_to_rgb(h, s, v), 0.0, 1.0)


def color_jitter(img, rng, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1):
    """One view's ColorJitter: random factors, random op order."""
    k_f, k_o = jax.random.split(rng)
    fb, fc, fs, dh = jax.random.uniform(k_f, (4,))
    fb = 1.0 - brightness + fb * 2.0 * brightness
    fc = 1.0 - contrast + fc * 2.0 * contrast
    fs = 1.0 - saturation + fs * 2.0 * saturation
    dh = -hue + dh * 2.0 * hue
    order = jax.random.permutation(k_o, 4)

    def apply_op(i, im):
        idx = order[i]
        return jax.lax.switch(idx, [
            lambda x: adjust_brightness(x, fb),
            lambda x: adjust_contrast(x, fc),
            lambda x: adjust_saturation(x, fs),
            lambda x: adjust_hue(x, dh),
        ], im)

    return jax.lax.fori_loop(0, 4, apply_op, img)


def random_photometric(images, rng, jitter_p=0.8, grayscale_p=0.2,
                       brightness=0.4, contrast=0.4, saturation=0.4,
                       hue=0.1):
    """Per-view independent jitter + grayscale over a batch `[B, H, W, 3]`
    of raw [0, 1] images (unsup_dataset.py:127-133 semantics)."""
    b = images.shape[0]
    keys = jax.random.split(rng, b)

    def one(img, key):
        k_jit, k_gate_j, k_gate_g = jax.random.split(key, 3)
        do_jit = jax.random.uniform(k_gate_j) < jitter_p
        img = jax.lax.cond(do_jit,
                           lambda x: color_jitter(x, k_jit, brightness,
                                                  contrast, saturation, hue),
                           lambda x: x, img)
        do_gray = jax.random.uniform(k_gate_g) < grayscale_p
        img = jax.lax.cond(
            do_gray,
            lambda x: jnp.broadcast_to(_gray(x)[..., None], x.shape),
            lambda x: x, img)
        return img

    return jax.vmap(one)(images, keys)


def photometric_and_normalize(images, rng, mean, std, **kwargs):
    """The full on-device input stage: jitter/grayscale then mean/std
    normalization (replaces both loader-side steps)."""
    images = random_photometric(images, rng, **kwargs)
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std
