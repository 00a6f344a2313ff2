"""Synthetic dataset generator at arbitrary scale (train + val splits).

Generalizes tests/make_synthetic_data.py to recipe-scale runs: colored
blob images whose ground-truth semantic masks and OWT-UCM-style
superpixel maps are generated analytically, with a consistent per-class
palette across splits so the color->class mapping is learnable and the
full train -> prototype -> inference -> benchmark protocol can measure a
real mIoU (no real datasets ship in this environment; see docs/DESIGN.md
"End-to-end learning validation").

Cityscapes-scale example (2,975 train / 500 val, reference
bashscripts/cityscapes/train.sh:20-32 shapes):

  python tools/make_synthetic_dataset.py --root /tmp/syn_cs \
      --train 2975 --train_size 256,512 --val 500 --val_size 1024,2048 \
      --classes 19 --sp_grid 8,16

Train canvases may be generated BELOW the real resolution to fit the
device-resident HBM budget; compensate in the recipe by shifting the
scale-augmentation range (source at 1/4 resolution with scale [2, 6]
produces crops with identical geometry to full resolution with the
reference's [0.5, 1.5]).
"""

import argparse
import os

import numpy as np
from PIL import Image


def _paint(rng, hw, num_classes, palette, blobs):
    """Blob image + semantic mask: rectangles and ellipses of random
    classes over background class 0."""
    h, w = hw
    sem = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(blobs):
        cls = int(rng.integers(1, num_classes))
        if rng.uniform() < 0.5:
            y0, x0 = rng.integers(0, h * 3 // 4), rng.integers(0, w * 3 // 4)
            hh = rng.integers(h // 8, h // 2)
            ww = rng.integers(w // 8, w // 2)
            sem[y0:y0 + hh, x0:x0 + ww] = cls
        else:
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            ry = rng.integers(h // 10, h // 3)
            rx = rng.integers(w // 10, w // 3)
            mask = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
            sem[mask] = cls
    img = palette[sem] + rng.normal(0, 0.03, (h, w, 3))
    return np.clip(img, 0, 1), sem


def _superpixels(sem, grid):
    """Grid blocks refined by the class map (a stand-in for OWT-UCM:
    boundaries align with true contours, plus oversegmentation)."""
    h, w = sem.shape
    gy = np.minimum(np.arange(h) * grid[0] // h, grid[0] - 1)
    gx = np.minimum(np.arange(w) * grid[1] // w, grid[1] - 1)
    blocks = gy[:, None] * grid[1] + gx[None, :]
    sp = blocks.astype(np.int64) * 256 + sem
    _, sp = np.unique(sp, return_inverse=True)
    return sp.reshape(h, w).astype(np.int32)


def make_split(root, split, n_images, hw, num_classes, palette, sp_grid,
               blobs, seed, superpixel=True):
    img_dir = os.path.join(root, split, 'images')
    sem_dir = os.path.join(root, split, 'segcls')
    sp_dir = os.path.join(root, split, 'superpixel')
    dirs = [img_dir, sem_dir] + ([sp_dir] if superpixel else [])
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_images):
        img, sem = _paint(rng, hw, num_classes, palette, blobs)
        name = f'{split}_{i:05d}'
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name + '.jpg'), quality=92)
        Image.fromarray(sem, mode='L').save(
            os.path.join(sem_dir, name + '.png'))
        line = (f'{split}/images/{name}.jpg {split}/segcls/{name}.png')
        if superpixel:
            sp = _superpixels(sem, sp_grid)
            Image.fromarray(sp.astype(np.uint16)).save(
                os.path.join(sp_dir, name + '.png'))
            line += f' {split}/superpixel/{name}.png'
        lines.append(line)
        if (i + 1) % 500 == 0:
            print(f'{split}: {i + 1}/{n_images}', flush=True)
    list_path = os.path.join(root, f'{split}.txt')
    with open(list_path, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return list_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--train', type=int, default=2975)
    ap.add_argument('--train_size', default='256,512')
    ap.add_argument('--val', type=int, default=500)
    ap.add_argument('--val_size', default='1024,2048')
    ap.add_argument('--classes', type=int, default=19)
    ap.add_argument('--sp_grid', default='8,16',
                    help='superpixel grid (blocks) on the TRAIN canvas')
    ap.add_argument('--blobs', type=int, default=10)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    palette = rng.uniform(0.05, 0.95, size=(args.classes, 3))
    t_hw = tuple(int(x) for x in args.train_size.split(','))
    v_hw = tuple(int(x) for x in args.val_size.split(','))
    grid = tuple(int(x) for x in args.sp_grid.split(','))

    p = make_split(args.root, 'train', args.train, t_hw, args.classes,
                   palette, grid, args.blobs, args.seed + 1)
    print('train list:', p)
    if args.val:
        # Val superpixel grid scales with resolution so granularity (in
        # image fraction) matches train.
        vgrid = (max(1, grid[0] * v_hw[0] // (4 * t_hw[0])) * 4,
                 max(1, grid[1] * v_hw[1] // (4 * t_hw[1])) * 4)
        p = make_split(args.root, 'val', args.val, v_hw, args.classes,
                       palette, vgrid, args.blobs, args.seed + 2,
                       superpixel=False)
        print('val list:', p)


if __name__ == '__main__':
    main()
