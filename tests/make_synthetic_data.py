"""Creates a tiny synthetic dataset (images + GT + superpixels + lists).

Used by the e2e smoke tests and the verify recipe: colored-blob images
whose ground-truth semantic masks and OWT-UCM-style superpixel maps are
generated analytically.
"""

import os

import numpy as np
from PIL import Image


def make_dataset(root, n_images=4, size=64, num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, 'images')
    sem_dir = os.path.join(root, 'segcls')
    sp_dir = os.path.join(root, 'superpixel')
    for d in (img_dir, sem_dir, sp_dir):
        os.makedirs(d, exist_ok=True)

    palette = rng.uniform(0.1, 0.9, size=(num_classes, 3))
    lines = []
    for i in range(n_images):
        sem = np.zeros((size, size), np.uint8)
        img = np.zeros((size, size, 3), np.float32)
        # 2-4 random rectangles of distinct classes over background 0.
        for _ in range(int(rng.integers(2, 5))):
            cls = int(rng.integers(1, num_classes))
            y0, x0 = rng.integers(0, size // 2, 2)
            hh, ww = rng.integers(size // 4, size // 2, 2)
            sem[y0:y0 + hh, x0:x0 + ww] = cls
        for c in range(num_classes):
            img[sem == c] = palette[c]
        img += rng.normal(0, 0.03, img.shape)
        img = np.clip(img, 0, 1)
        # Superpixels: grid blocks refined by the class map.
        grid = (np.arange(size) // (size // 4))
        blocks = grid[:, None] * 4 + grid[None, :]
        superpixel = (blocks * num_classes + sem).astype(np.int32)
        _, superpixel = np.unique(superpixel, return_inverse=True)
        superpixel = superpixel.reshape(size, size).astype(np.int32)

        name = f'img_{i:03d}'
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name + '.jpg'))
        Image.fromarray(sem, mode='L').save(
            os.path.join(sem_dir, name + '.png'))
        Image.fromarray(superpixel.astype(np.uint16)).save(
            os.path.join(sp_dir, name + '.png'))
        lines.append(f'images/{name}.jpg segcls/{name}.png '
                     f'superpixel/{name}.png')

    list_path = os.path.join(root, 'list.txt')
    with open(list_path, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return list_path


if __name__ == '__main__':
    import sys
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/hsg_synth'
    print(make_dataset(root))
