"""Offline superpixel generation (OWT-UCM-style, pure Python).

Capability parity with the reference's MATLAB preprocessing
(tools/generate_se_owt_ucm.m, tools/generate_pmi_owt_ucm.m): produce a
uint16 PNG superpixel map per image with at most `--max_segments` regions,
consumed as the third column of the dataset list files.

The MATLAB originals need BSR/MCG binaries (Structured Edges / PMI crisp
boundaries -> oriented watershed -> UCM -> threshold until <= N regions).
This tool reproduces the same pipeline shape with stock numpy/cv2:

  1. boundary strength: multi-scale Sobel gradient magnitude on the
     Gaussian-smoothed Lab image (a stand-in for SE/PMI contours);
  2. watershed over the boundary map from low-gradient markers
     (oriented-watershed stand-in) -> an oversegmentation;
  3. UCM-style greedy region merging: repeatedly dissolve the pair of
     adjacent regions with the weakest shared boundary until the region
     count reaches `--max_segments`.

Quality differs from true OWT-UCM (no globalization step); regenerate
with the MATLAB tools for exact reproduction of the paper's superpixels.

Usage:
  python tools/generate_superpixels.py --data_dir D --data_list in.txt \
      --save_dir D/superpixels --max_segments 48
"""

from __future__ import annotations

import argparse
import heapq
import os

import numpy as np
from PIL import Image

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def boundary_strength(image: np.ndarray) -> np.ndarray:
    """Multi-scale gradient magnitude in Lab space, normalized to [0, 1]."""
    lab = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2Lab)
    lab = lab.astype(np.float32)
    total = np.zeros(image.shape[:2], np.float32)
    for sigma in (1.0, 2.0, 4.0):
        blur = cv2.GaussianBlur(lab, (0, 0), sigma)
        gx = cv2.Sobel(blur, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(blur, cv2.CV_32F, 0, 1, ksize=3)
        mag = np.sqrt((gx ** 2 + gy ** 2).sum(axis=2))
        total += mag / mag.max().clip(1e-6)
    return total / len((1.0, 2.0, 4.0))


def watershed_oversegment(image: np.ndarray, strength: np.ndarray,
                          marker_quantile: float = 0.4) -> np.ndarray:
    """Watershed from low-gradient markers -> labels `[H, W]` (>= 1)."""
    thresh = np.quantile(strength, marker_quantile)
    seeds = (strength <= thresh).astype(np.uint8)
    n, markers = cv2.connectedComponents(seeds)
    markers = markers.astype(np.int32)
    bgr = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
    cv2.watershed(bgr, markers)
    # Assign boundary pixels (-1) to a 4-neighbor region.
    lab = markers.copy()
    for shift in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        rolled = np.roll(lab, shift, axis=(0, 1))
        lab = np.where((lab <= 0) & (rolled > 0), rolled, lab)
    lab[lab <= 0] = 1
    _, lab = np.unique(lab, return_inverse=True)
    return lab.reshape(markers.shape)


def ucm_merge(labels: np.ndarray, strength: np.ndarray,
              max_segments: int) -> np.ndarray:
    """Greedy UCM-style merging until <= max_segments regions."""
    h, w = labels.shape
    n = labels.max() + 1
    if n <= max_segments:
        return labels

    # Boundary strength between each adjacent region pair (mean of the
    # boundary pixels' strengths).
    sums: dict = {}
    counts: dict = {}
    for axis in (0, 1):
        a = labels
        b = np.roll(labels, -1, axis=axis)
        s = 0.5 * (strength + np.roll(strength, -1, axis=axis))
        mask = a != b
        if axis == 0:
            mask[-1, :] = False
        else:
            mask[:, -1] = False
        pa, pb, ps = a[mask], b[mask], s[mask]
        lo = np.minimum(pa, pb)
        hi = np.maximum(pa, pb)
        for key, val in zip(lo.astype(np.int64) * n + hi, ps):
            sums[key] = sums.get(key, 0.0) + float(val)
            counts[key] = counts.get(key, 0) + 1

    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = {key: sums[key] / counts[key] for key in sums}
    heap = [(wgt, key) for key, wgt in edges.items()]
    heapq.heapify(heap)
    alive = n
    # Adjacency as dict of dicts for merged-edge bookkeeping.
    adj: dict = {}
    for key, wgt in edges.items():
        a, b = divmod(key, n)
        adj.setdefault(a, {})[b] = (sums[key], counts[key])
        adj.setdefault(b, {})[a] = (sums[key], counts[key])

    current = {key: edges[key] for key in edges}
    while alive > max_segments and heap:
        wgt, key = heapq.heappop(heap)
        a, b = divmod(key, n)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if current.get(key) is None or abs(current[key] - wgt) > 1e-9:
            continue  # stale entry
        # Merge rb into ra.
        parent[rb] = ra
        alive -= 1
        na = adj.pop(ra, {})
        nb = adj.pop(rb, {})
        merged = {}
        for nbrs in (na, nb):
            for c, (sv, cv) in nbrs.items():
                rc = find(c)
                if rc == ra:
                    continue
                if rc in merged:
                    ms, mc = merged[rc]
                    merged[rc] = (ms + sv, mc + cv)
                else:
                    merged[rc] = (sv, cv)
        adj[ra] = merged
        for rc, (sv, cv) in merged.items():
            adj.setdefault(rc, {})[ra] = (sv, cv)
            k2 = min(ra, rc) * n + max(ra, rc)
            wv = sv / cv
            current[k2] = wv
            heapq.heappush(heap, (wv, k2))

    roots = np.array([find(i) for i in range(n)])
    _, dense = np.unique(roots, return_inverse=True)
    return dense[labels]


def generate(image: np.ndarray, max_segments: int = 48) -> np.ndarray:
    strength = boundary_strength(image)
    over = watershed_oversegment(image, strength)
    return ucm_merge(over, strength, max_segments).astype(np.int32)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--data_dir', required=True)
    parser.add_argument('--data_list', required=True,
                        help='file with one image path per line')
    parser.add_argument('--save_dir', required=True)
    parser.add_argument('--max_segments', type=int, default=48)
    args = parser.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    with open(args.data_list) as f:
        paths = [line.split()[0] for line in f if line.strip()]
    for i, rel in enumerate(paths):
        img = np.asarray(Image.open(os.path.join(args.data_dir, rel))
                         .convert('RGB'), np.float32) / 255.0
        sp = generate(img, args.max_segments)
        name = os.path.splitext(os.path.basename(rel))[0] + '.png'
        Image.fromarray(sp.astype(np.uint16)).save(
            os.path.join(args.save_dir, name))
        if (i + 1) % 100 == 0 or i == len(paths) - 1:
            print(f'[{i + 1}/{len(paths)}]', flush=True)


if __name__ == '__main__':
    main()
