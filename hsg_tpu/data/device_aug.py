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


# ---------------------------------------------------------------------------
# On-device GEOMETRIC augmentation: mirror -> scale U(0.5, 1.5) -> pad ->
# random crop (the reference view pipeline, unsup_dataset.py:105-151 /
# hsg/data/transforms.py) expressed as ONE fused affine-warp gather with
# fully static shapes. The host then only decodes (once, cached) and
# stacks fixed-size uint8 canvases; every augmentation op rides the TPU.


def warp_view(image, label, true_h, true_w, flip, ratio, u_y, u_x,
              crop, image_pad, label_pad=255):
    """One augmented view as a single warp.

    Equivalent to the host chain random_mirror -> resize(ratio) ->
    random_crop_with_pad(crop) (transforms.py:45-98) on a source image
    living in the top-left `[true_h, true_w]` region of a fixed `[S, S]`
    canvas:

      scaled size  (h', w') = (floor(r*H), floor(r*W))   [= int(r*H)]
      pad to       (max(h', crop), max(w', crop)), source at origin,
                   image padded with `image_pad`, label with `label_pad`
      crop offset  sy = floor(u_y * (ph - crop)), sx likewise
      output[y,x]  = bilinear(source, ((sy+y+0.5)*H/h' - 0.5,
                                       (sx+x+0.5)*W/w' - 0.5))
                     where inside the scaled extent, else the pad value;
                     labels sample nearest: floor((sy+y)*H/h') (the
                     OpenCV INTER_NEAREST convention, no half shift).

    `flip` mirrors the SOURCE x axis. All of (true_h, true_w, flip,
    ratio, u_y, u_x) are traced per-view data; shapes are static.
    image: `[S, S, 3]` float in [0, 1]; label: `[S, S]` int.
    Returns (`[crop, crop, 3]`, `[crop, crop]`, inside `[crop, crop]`
    bool) — `inside` is True where the output samples real source
    content and False in the pad region; callers use it to build the
    ignore mask (the reference pads the semantic channel with 255 so
    pad pixels never enter clustering/losses, base_dataset.py:135-155).
    """
    H = true_h.astype(jnp.float32)
    W = true_w.astype(jnp.float32)
    h2 = jnp.maximum(jnp.floor(ratio * H), 1.0)
    w2 = jnp.maximum(jnp.floor(ratio * W), 1.0)
    ph = jnp.maximum(h2, crop)
    pw = jnp.maximum(w2, crop)
    sy = jnp.floor(u_y * (ph - crop))
    sx = jnp.floor(u_x * (pw - crop))

    ys = sy + jnp.arange(crop, dtype=jnp.float32)          # [crop]
    xs = sx + jnp.arange(crop, dtype=jnp.float32)
    inside = ((ys[:, None] < h2) & (xs[None, :] < w2))     # [crop, crop]

    src_y = (ys + 0.5) * (H / h2) - 0.5                    # [crop]
    src_x = (xs + 0.5) * (W / w2) - 0.5
    src_x = jnp.where(flip, (W - 1.0) - src_x, src_x)

    # Bilinear (image), SEPARABLE: the warp has no rotation, so
    # resampling factorizes into a row pass and a column pass. Encode
    # each pass as a 2-nonzeros-per-row interpolation matrix and run it
    # on the MXU — per-pixel gathers are pathologically slow on TPU
    # (measured ~600 ms/step at stage-1 scale vs ~2 ms for the matmul
    # form). Clamp into the true region so canvas padding beyond
    # [true_h, true_w] is never read.
    sh, sw = image.shape[0], image.shape[1]
    y0 = jnp.clip(jnp.floor(src_y), 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(src_x), 0.0, W - 1.0)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)
    wx = jnp.clip(src_x - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, true_h - 1)
    x1i = jnp.minimum(x0i + 1, true_w - 1)

    f32 = jnp.float32
    wy_mat = ((1.0 - wy)[:, None] * jax.nn.one_hot(y0i, sh, dtype=f32)
              + wy[:, None] * jax.nn.one_hot(y1i, sh, dtype=f32))
    wx_mat = ((1.0 - wx)[:, None] * jax.nn.one_hot(x0i, sw, dtype=f32)
              + wx[:, None] * jax.nn.one_hot(x1i, sw, dtype=f32))
    rows = jnp.einsum('ys,swc->ywc', wy_mat, image.astype(f32))
    out = jnp.einsum('xw,ywc->yxc', wx_mat, rows)          # [c, c, 3]
    pad = jnp.asarray(image_pad, out.dtype)
    out = jnp.where(inside[..., None], out, pad)

    # Nearest (label): cv2 INTER_NEAREST convention floor(i * H/h')
    # (no half-pixel shift — OpenCV quirk). Same matmul trick with
    # one-hot selection; label values are exact in f32 below 2^24.
    ny = jnp.clip(jnp.floor(ys * (H / h2)), 0, H - 1.0)
    nx = jnp.clip(jnp.floor(xs * (W / w2)), 0, W - 1.0)
    nx = jnp.where(flip, (W - 1.0) - nx, nx)
    ny_mat = jax.nn.one_hot(ny.astype(jnp.int32), sh, dtype=f32)
    nx_mat = jax.nn.one_hot(nx.astype(jnp.int32), sw, dtype=f32)
    lab_rows = ny_mat @ label.astype(f32)                  # [c, Sw]
    lab = jnp.round(lab_rows @ nx_mat.T).astype(label.dtype)
    lab = jnp.where(inside, lab, label_pad)
    return out, lab, inside


def random_geometric_views(images, labels, true_hw, rng, crop,
                           num_views=2, scale_min=0.5, scale_max=1.5,
                           mirror_p=0.5, image_pad=(0.0, 0.0, 0.0),
                           label_pad=255):
    """Expand `[B, S, S, 3]` staged raw images into `[B*V, crop, crop, 3]`
    independently augmented views (consecutive-views batch convention).

    images: uint8 or float; uint8 is converted to [0, 1] float ON DEVICE
    (so the host->device transfer is 4x smaller). labels `[B, S, S]` int
    (superpixel/instance maps). true_hw `[B, 2]` actual source sizes.
    `mirror_p` is the per-view flip probability (0.0 disables mirroring,
    honoring config.train.random_mirror=False).

    Returns (images `[B*V, crop, crop, 3]`, labels `[B*V, crop, crop]`,
    inside `[B*V, crop, crop]` bool) — `inside` marks real content vs
    crop padding; downstream builds the semantic ignore mask from it.
    """
    b = images.shape[0]
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    keys = jax.random.split(rng, b * num_views).reshape(b, num_views, 2)

    def one_image(img, lab, hw, img_keys):
        def one_view(key):
            k_f, k_r, k_y, k_x = jax.random.split(key, 4)
            flip = jax.random.uniform(k_f) < mirror_p
            ratio = jax.random.uniform(k_r, minval=scale_min,
                                       maxval=scale_max)
            u_y = jax.random.uniform(k_y)
            u_x = jax.random.uniform(k_x)
            return warp_view(img, lab, hw[0], hw[1], flip, ratio, u_y,
                             u_x, crop, image_pad, label_pad)
        return jax.vmap(one_view)(img_keys)                # [V, crop, ...]

    view_imgs, view_labs, view_inside = jax.vmap(one_image)(
        images, labels, true_hw, keys)
    v = num_views
    return (view_imgs.reshape(b * v, crop, crop, 3),
            view_labs.reshape(b * v, crop, crop),
            view_inside.reshape(b * v, crop, crop))
