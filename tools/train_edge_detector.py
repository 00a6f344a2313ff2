"""Train the structured-edge contour detector (hsg_tpu/models/edge.py).

TPU-native counterpart of the BSDS-trained Structured-Edges model that
the reference's tools/generate_se_owt_ucm.m:20-40 loads as step 1 of its
SE -> oriented watershed -> UCM superpixel pipeline. BSDS itself is not
available in this environment, so the network trains on procedurally
textured scenes with exactly-known boundaries — the same three regimes
the repo's detector benchmarks probe (tests/test_superpixels.py: clean,
noisy, heavy intra-region texture) plus low-contrast boundaries and
illumination gradients. What the model must learn is precisely what the
SE forest learns from BSDS: suppress intra-region texture gradients,
keep statistically surprising transitions.

Runs on CPU by design (the model is ~75k params; the chip is reserved
for the training recipes):

  python tools/train_edge_detector.py \
      --out artifacts/edge_detector [--steps 3000]

Writes params.npz (committed — the analog of the reference shipping its
trained SE model) and METRICS.json with held-out boundary-recall of the
trained detector vs the sobel baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def textured_scene(rng: np.random.Generator, size: int = 96,
                   n_regions: int = 7):
    """Voronoi scene with per-region procedural texture.

    Returns (image [size, size, 3] float32 in [0, 1], gt labels
    [size, size] int). Regions draw one of: flat color, sinusoidal
    stripes, or square-wave checker — amplitudes large enough that
    interior gradients often exceed true boundary contrast, which is the
    regime where a trained detector must beat local gradients.
    """
    pts = rng.uniform(0, size, (n_regions, 2))
    colors = rng.uniform(0.1, 0.9, (n_regions, 3))
    yy, xx = np.mgrid[:size, :size]
    d = ((yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2)
    gt = np.argmin(d, axis=-1)
    img = colors[gt].astype(np.float32)

    for r in range(n_regions):
        kind = rng.integers(0, 3)
        if kind == 0:
            continue  # flat
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.8, 3.0)
        phase = rng.uniform(0, 2 * np.pi)
        wave = np.sin((np.cos(theta) * yy + np.sin(theta) * xx) * freq
                      + phase)
        if kind == 2:
            wave = np.sign(wave)
        amp = rng.uniform(0.08, 0.3)
        chan = rng.uniform(0.4, 1.0, 3)
        img += (gt == r)[..., None] * amp * wave[..., None] * chan

    # Global illumination gradient + sensor noise.
    gdir = rng.uniform(-1, 1, 2)
    img += (rng.uniform(0.0, 0.15) * (gdir[0] * yy + gdir[1] * xx)
            / size)[..., None]
    img += rng.normal(0, rng.uniform(0.01, 0.05), img.shape)
    return np.clip(img, 0, 1).astype(np.float32), gt


def boundary_target(gt: np.ndarray) -> np.ndarray:
    """Thin GT boundary mask from label transitions, 1-px dilated
    (2-3 px ridges train stably and match the BR@2 evaluation band)."""
    b = np.zeros(gt.shape, bool)
    b[:-1, :] |= gt[:-1, :] != gt[1:, :]
    b[1:, :] |= gt[:-1, :] != gt[1:, :]
    b[:, :-1] |= gt[:, :-1] != gt[:, 1:]
    b[:, 1:] |= gt[:, :-1] != gt[:, 1:]
    return b.astype(np.float32)


def make_batch(rng: np.random.Generator, batch: int, size: int):
    imgs = np.empty((batch, size, size, 3), np.float32)
    tgts = np.empty((batch, size, size), np.float32)
    for i in range(batch):
        n = int(rng.integers(4, 10))
        img, gt = textured_scene(rng, size=size, n_regions=n)
        imgs[i] = img
        tgts[i] = boundary_target(gt)
    return imgs, tgts


def _boundary_recall(gt_mask: np.ndarray, pred_mask: np.ndarray,
                     tol: int = 2) -> float:
    import cv2
    k = 2 * tol + 1
    dil = cv2.dilate(pred_mask.astype(np.uint8), np.ones((k, k), np.uint8))
    return float((gt_mask.astype(bool) & (dil > 0)).sum()) \
        / max(int(gt_mask.sum()), 1)


def evaluate(params, n_scenes: int = 12, size: int = 96, seed: int = 999):
    """Held-out BR@2 at matched boundary-pixel budget vs sobel.

    Both detectors emit a strength map; binarize each at the quantile
    that keeps the same number of 'boundary' pixels as the GT band, then
    measure recall — a threshold-free comparison of ranking quality.
    """
    from hsg_tpu.models import edge as edge_lib
    from generate_superpixels import boundary_strength
    rng = np.random.default_rng(seed)
    se_br, sob_br = [], []
    for _ in range(n_scenes):
        img, gt = textured_scene(rng, size=size)
        gt_b = boundary_target(gt)
        q = 1.0 - gt_b.mean()
        se = edge_lib.detect(img, params)
        sob = boundary_strength(img)
        se_br.append(_boundary_recall(gt_b, se >= np.quantile(se, q)))
        sob_br.append(_boundary_recall(gt_b, sob >= np.quantile(sob, q)))
    return float(np.mean(se_br)), float(np.mean(sob_br))


def train(steps: int = 3000, batch: int = 8, size: int = 96,
          lr: float = 1e-3, seed: int = 0, log_every: int = 200):
    import jax
    import jax.numpy as jnp
    import optax

    from hsg_tpu.models import edge as edge_lib

    model = edge_lib.EdgeNet()
    rng = np.random.default_rng(seed)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, size, size, 3), jnp.float32))['params']
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, imgs, tgts):
        out = model.apply({'params': p}, imgs)
        loss = edge_lib.balanced_bce(out['fused'], tgts)
        for s in out['sides']:
            loss += edge_lib.balanced_bce(s, tgts) / len(out['sides'])
        return loss

    @jax.jit
    def step(p, o, imgs, tgts):
        loss, grads = jax.value_and_grad(loss_fn)(p, imgs, tgts)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    t0 = time.time()
    for it in range(steps):
        imgs, tgts = make_batch(rng, batch, size)
        params, opt_state, loss = step(params, opt_state, imgs, tgts)
        if (it + 1) % log_every == 0 or it == 0:
            print(f'[{it + 1}/{steps}] loss={float(loss):.4f} '
                  f'({time.time() - t0:.0f}s)', flush=True)
    return params


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--out', default='artifacts/edge_detector')
    parser.add_argument('--steps', type=int, default=3000)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--size', type=int, default=96)
    parser.add_argument('--lr', type=float, default=1e-3)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--platform', default='cpu',
                        help="jax platform ('cpu' keeps the chip free "
                             "for training recipes)")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    from hsg_tpu.models import edge as edge_lib

    params = train(args.steps, args.batch, args.size, args.lr, args.seed)
    se_br, sob_br = evaluate(params)
    os.makedirs(args.out, exist_ok=True)
    edge_lib.save_params(os.path.join(args.out, 'params.npz'), params)
    metrics = {'heldout_br2_se': round(se_br, 4),
               'heldout_br2_sobel': round(sob_br, 4),
               'steps': args.steps, 'batch': args.batch,
               'size': args.size, 'seed': args.seed}
    with open(os.path.join(args.out, 'METRICS.json'), 'w') as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == '__main__':
    # generate_superpixels (for the sobel baseline) lives next to us.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
