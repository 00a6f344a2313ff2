"""Offline superpixel generation (OWT-UCM-style, pure Python).

Capability parity with the reference's MATLAB preprocessing
(tools/generate_se_owt_ucm.m, tools/generate_pmi_owt_ucm.m): produce a
uint16 PNG superpixel map per image with at most `--max_segments` regions,
consumed as the third column of the dataset list files.

The MATLAB originals need BSR/MCG binaries (Structured Edges / PMI crisp
boundaries -> oriented watershed -> UCM -> threshold until <= N regions).
This tool reproduces the same pipeline shape with stock numpy/cv2:

  1. boundary strength, one of two detectors:
     - `sobel`: multi-scale Sobel gradient magnitude on the
       Gaussian-smoothed Lab image (fast local stand-in);
     - `pmi`: Crisp Boundaries pointwise-mutual-information contours
       (Isola et al., ECCV 2014) — the detector the reference's
       generate_pmi_owt_ucm.m:39 runs (`findBoundaries`). PMI is
       UNSUPERVISED: the color co-occurrence statistics it scores
       boundaries against are learned from the test image itself, so
       no trained model files are needed (pmi_boundary_strength);
  2. spectral globalization (the sPb step of gPb, Arbelaez et al. TPAMI
     2011 — what generate_se_owt_ucm.m:20-40 runs): intervening-contour
     affinities -> normalized-Laplacian eigenvectors -> gradients of the
     eigenvector images, combined back into the boundary map. Suppresses
     texture/noise boundaries and reinforces globally consistent ones
     (the same spectral machinery the PMI paper applies to its affinity
     matrix);
  3. watershed over the boundary map from low-gradient markers
     (oriented-watershed stand-in) -> an oversegmentation;
  4. UCM-style greedy region merging: repeatedly dissolve the pair of
     adjacent regions with the weakest shared boundary until the region
     count reaches `--max_segments`.

     - `se`: a TRAINED contour CNN (hsg_tpu/models/edge.py), the analog
       of the Structured-Edges model generate_se_owt_ucm.m loads. BSDS
       is not available in this environment, so the shipped checkpoint
       (artifacts/edge_detector/params.npz, tools/train_edge_detector.py)
       is trained on procedurally textured scenes with known boundaries;
       held-out quality vs the other detectors is recorded in
       artifacts/edge_detector/METRICS.json and tests/test_edge_detector.py.

Usage:
  python tools/generate_superpixels.py --data_dir D --data_list in.txt \
      --save_dir D/superpixels --max_segments 48 [--no_globalize] [--pmi]
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


def pmi_boundary_strength(image: np.ndarray, rho: float = 1.25,
                          n_colors: int = 64, bandwidth: float = 1.5,
                          seed: int = 0) -> np.ndarray:
    """Crisp-boundaries PMI contour detector (Isola et al., ECCV 2014).

    The step-1 detector of the reference's generate_pmi_owt_ucm.m
    (`findBoundaries(I, type)` with the PMI affinity). Learned per-image
    with no external training data:

      1. quantize the lightly-smoothed Lab image into `n_colors` palette
         entries (k-means over a pixel subsample);
      2. estimate the joint distribution P(a, b) of palette entries over
         nearby pixel pairs (distance-1 and distance-2 offsets, all
         orientations, symmetrized), kernel-smoothed in Lab palette
         space — a discrete-palette stand-in for the paper's
         Epanechnikov KDE over sampled color pairs (bandwidth 1.5 Lab
         units / 64 colors chosen by BR/ASA sweep over clean, noisy and
         textured synthetic regimes — see tests/test_superpixels.py);
      3. PMI_rho(a, b) = log P(a, b)^rho / (P(a) P(b))  (paper eq. 2,
         rho = 1.25 as published);
      4. boundary strength of a pixel = max over its 4 distance-1 edges
         of -PMI(side colors), shifted/scaled to [0, 1]. Colors that
         co-occur across nearby pixels more often than chance (interior
         texture) score low; statistically surprising transitions (true
         object boundaries) score high.
    """
    lab = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2Lab)
    lab = cv2.GaussianBlur(lab.astype(np.float32), (0, 0), 0.8)
    h, w = lab.shape[:2]
    px = lab.reshape(-1, 3)

    # 1. Lab palette by k-means over a subsample.
    rng = np.random.default_rng(seed)
    n_sample = min(px.shape[0], 20000)
    sample = px[rng.choice(px.shape[0], n_sample, replace=False)]
    k = int(min(n_colors, np.unique(sample, axis=0).shape[0]))
    cv2.setRNGSeed(seed)
    criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 25, 0.5)
    _, _, centers = cv2.kmeans(sample.astype(np.float32), k, None,
                               criteria, 3, cv2.KMEANS_PP_CENTERS)
    # Assign every pixel to its nearest palette entry (chunked).
    q = np.empty(px.shape[0], np.int32)
    for lo in range(0, px.shape[0], 1 << 16):
        chunk = px[lo: lo + (1 << 16)]
        d2 = ((chunk[:, None, :] - centers[None]) ** 2).sum(-1)
        q[lo: lo + (1 << 16)] = d2.argmin(1)
    q = q.reshape(h, w)

    # 2. Joint co-occurrence over nearby pairs.
    counts = np.zeros((k, k), np.float64)
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1), (0, 2), (2, 0)):
        a = q[max(0, -dy): h - max(0, dy), max(0, -dx): w - max(0, dx)]
        b = q[max(0, dy): h + min(0, dy), max(0, dx): w + min(0, dx)]
        np.add.at(counts, (a.reshape(-1), b.reshape(-1)), 1.0)
    counts = counts + counts.T
    # Kernel smoothing in palette space (KDE stand-in): similar colors
    # share statistical mass.
    d2c = ((centers[:, None, :] - centers[None]) ** 2).sum(-1)
    kern = np.exp(-d2c / (2.0 * bandwidth ** 2))
    kern /= kern.sum(axis=1, keepdims=True)
    counts = kern @ counts @ kern.T + 1e-3

    # 3. PMI table.
    pj = counts / counts.sum()
    pm = pj.sum(axis=1)
    pmi = rho * np.log(pj) - np.log(pm)[:, None] - np.log(pm)[None, :]

    # 4. Per-pixel boundary strength from distance-1 edges.
    strength = np.full((h, w), -np.inf, np.float32)
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        a = q[max(0, -dy): h - max(0, dy), max(0, -dx): w - max(0, dx)]
        b = q[max(0, dy): h + min(0, dy), max(0, dx): w + min(0, dx)]
        e = (-pmi[a, b]).astype(np.float32)
        ys = slice(max(0, -dy), h - max(0, dy))
        xs = slice(max(0, -dx), w - max(0, dx))
        strength[ys, xs] = np.maximum(strength[ys, xs], e)
        ys2 = slice(max(0, dy), h + min(0, dy))
        xs2 = slice(max(0, dx), w + min(0, dx))
        strength[ys2, xs2] = np.maximum(strength[ys2, xs2], e)
    lo = float(strength.min())
    hi = float(np.percentile(strength, 98))
    return np.clip((strength - lo) / max(hi - lo, 1e-6), 0.0, 1.0)


_SE_PARAMS = None
_SE_PARAMS_PATH = None


def se_boundary_strength(image: np.ndarray,
                         params_path: str | None = None) -> np.ndarray:
    """Trained-CNN contour detector (generate_se_owt_ucm.m step-1 analog).

    Loads each checkpoint once per process — the cache is keyed on the
    RESOLVED params path (``params_path=None`` resolves to the committed
    default first), so switching between an explicit checkpoint and the
    default in either order always loads the right weights; jax runs on
    CPU so this offline tool never contends with a training run for the
    chip.
    """
    global _SE_PARAMS, _SE_PARAMS_PATH
    if params_path is None:
        params_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'artifacts', 'edge_detector', 'params.npz')
    if _SE_PARAMS is None or params_path != _SE_PARAMS_PATH:
        import sys
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        import jax
        try:
            from jax._src import xla_bridge
            uninitialized = not xla_bridge.backends_are_initialized()
        except Exception:
            uninitialized = True
        if uninitialized:
            try:
                jax.config.update('jax_platforms', 'cpu')
            except RuntimeError:
                pass
        # else: respect the caller's backend (e.g. superpixel_sweep.py
        # latches the TPU for its trainings before generating variants);
        # the 72k-param CNN is negligible on any device.
        from hsg_tpu.models import edge as edge_lib
        _SE_PARAMS = edge_lib.load_params(params_path)
        _SE_PARAMS_PATH = params_path
    from hsg_tpu.models import edge as edge_lib
    return edge_lib.detect(image, _SE_PARAMS)


def spectral_globalization(strength: np.ndarray, n_vecs: int = 16,
                           max_dim: int = 96, radius: int = 5,
                           rho: float = 0.1) -> np.ndarray:
    """sPb: globalize a local boundary map via spectral clustering cues.

    The step the reference's MATLAB tool gets from BSR's
    spectralPb (generate_se_owt_ucm.m:20-40). On a downsampled grid,
    build a sparse intervening-contour affinity (pixels within `radius`
    are similar unless a strong contour crosses the line between them),
    take the first `n_vecs` generalized eigenvectors of the graph
    Laplacian, and read boundaries off as the gradient magnitude of the
    eigenvector images, weighted 1/sqrt(lambda_k).

    Returns the sPb map at the input resolution, normalized so its 95th
    percentile matches the input's (callers combine additively).
    """
    from scipy import sparse
    from scipy.sparse.linalg import eigsh

    h0, w0 = strength.shape
    scale = min(1.0, max_dim / max(h0, w0))
    h, w = max(8, int(round(h0 * scale))), max(8, int(round(w0 * scale)))
    s = cv2.resize(strength, (w, h), interpolation=cv2.INTER_AREA)
    smax = max(float(s.max()), 1e-6)
    s = s / smax
    n = h * w

    rows, cols, vals = [], [], []
    for dy in range(-radius, radius + 1):
        for dx in range(0, radius + 1):
            if dy * dy + dx * dx > radius * radius:
                continue
            if dx == 0 and dy <= 0:
                continue  # each undirected pair once
            # Intervening contour: max strength along the segment between
            # (y, x) and (y+dy, x+dx), sampled at unit steps.
            steps = max(abs(dy), abs(dx))
            ic = np.zeros((h, w), np.float32)
            for t in range(steps + 1):
                sy = int(round(dy * t / steps))
                sx = int(round(dx * t / steps))
                shifted = np.full((h, w), np.inf, np.float32)
                ys = slice(max(0, -sy), min(h, h - sy))
                xs = slice(max(0, -sx), min(w, w - sx))
                shifted[ys, xs] = s[max(0, sy): h + min(0, sy),
                                    max(0, sx): w + min(0, sx)]
                ic = np.maximum(ic, shifted)
            wgt = np.exp(-ic / rho)
            yy, xx = np.mgrid[:h, :w]
            src_ok = ((yy + dy >= 0) & (yy + dy < h)
                      & (xx + dx >= 0) & (xx + dx < w))
            src = (yy * w + xx)[src_ok]
            dst = ((yy + dy) * w + (xx + dx))[src_ok]
            v = wgt[src_ok]
            rows.extend((src, dst))
            cols.extend((dst, src))
            vals.extend((v, v))

    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals).astype(np.float64)
    W = sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))
    d = np.asarray(W.sum(axis=1)).ravel() + 1e-10
    d_inv_sqrt = 1.0 / np.sqrt(d)
    Dn = sparse.diags(d_inv_sqrt)
    L = sparse.identity(n) - Dn @ W @ Dn
    k = min(n_vecs + 1, n - 2)
    lam, vec = eigsh(L, k=k, sigma=0, which='LM')

    spb = np.zeros((h, w), np.float32)
    for i in range(1, k):                    # skip the trivial eigenvector
        if lam[i] < 1e-10:
            continue
        img = (vec[:, i] * d_inv_sqrt).reshape(h, w).astype(np.float32)
        gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
        spb += np.sqrt(gx ** 2 + gy ** 2) / np.sqrt(lam[i])

    spb = cv2.resize(spb, (w0, h0), interpolation=cv2.INTER_LINEAR)
    ref = float(np.percentile(strength, 95))
    cur = max(float(np.percentile(spb, 95)), 1e-10)
    return spb * (ref / cur)


def watershed_oversegment(image: np.ndarray, strength: np.ndarray,
                          marker_quantile: float = 0.4,
                          min_markers: int = 0) -> np.ndarray:
    """Watershed from low-gradient markers -> labels `[H, W]` (>= 1)."""
    thresh = np.quantile(strength, marker_quantile)
    seeds = (strength <= thresh).astype(np.uint8)
    if min_markers and cv2.connectedComponents(seeds)[0] - 1 < min_markers:
        # Too few markers: the contour map is so clean that whole regions
        # collapse into single markers, and then a 1-px boundary leak
        # irreversibly merges two regions (UCM can only merge, never
        # split). Grid-cut the marker mask to force an OVERsegmentation;
        # the false cuts have near-zero boundary strength, so UCM
        # dissolves them first. Applied only on demand — when the
        # detector already oversegments (local gradients + noise), the
        # extra fragments just add wrong-merge opportunities.
        step = max(8, min(seeds.shape) // 12)
        seeds[::step, :] = 0
        seeds[:, ::step] = 0
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


def generate(image: np.ndarray, max_segments: int = 48,
             globalize: bool = True, half_res: bool = False,
             detector: str = 'sobel') -> np.ndarray:
    """half_res reproduces the PMI tool's resolution scheme
    (generate_pmi_owt_ucm.m:1-80): segment at 0.5x, then 2x nearest
    upsample back — used with a larger budget (<=1024 segments) on
    high-resolution frames like Cityscapes. detector: 'sobel' (local
    gradients), 'pmi' (per-image-learned crisp boundaries) or 'se'
    (trained contour CNN, the generate_se_owt_ucm.m analog)."""
    h0, w0 = image.shape[:2]
    if half_res:
        image = cv2.resize(image, (w0 // 2, h0 // 2),
                           interpolation=cv2.INTER_AREA)
    if detector == 'pmi':
        strength = pmi_boundary_strength(image)
    elif detector == 'se':
        strength = se_boundary_strength(image)
    else:
        strength = boundary_strength(image)
    if globalize:
        try:
            strength = 0.5 * (strength
                              + spectral_globalization(strength))
        except Exception:
            pass  # scipy missing or eigensolve failed: local-only map
    over = watershed_oversegment(image, strength,
                                 min_markers=max_segments)
    labels = ucm_merge(over, strength, max_segments).astype(np.int32)
    if half_res:
        labels = cv2.resize(labels, (w0, h0),
                            interpolation=cv2.INTER_NEAREST)
    return labels


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--data_dir', required=True)
    parser.add_argument('--data_list', required=True,
                        help='file with one image path per line')
    parser.add_argument('--save_dir', required=True)
    parser.add_argument('--max_segments', type=int, default=48)
    parser.add_argument('--no_globalize', action='store_true',
                        help='skip the sPb spectral globalization step')
    parser.add_argument('--pmi', action='store_true',
                        help='generate_pmi_owt_ucm.m parity: PMI crisp-'
                             'boundaries detector + half-res scheme '
                             '(segment at 0.5x, 2x nearest upsample; '
                             'use with --max_segments 1024)')
    parser.add_argument('--detector', choices=('sobel', 'pmi', 'se'),
                        default=None,
                        help='contour detector (default: pmi when --pmi '
                             'is set, else sobel); se = trained CNN, '
                             'artifacts/edge_detector/params.npz')
    args = parser.parse_args()
    detector = args.detector or ('pmi' if args.pmi else 'sobel')

    os.makedirs(args.save_dir, exist_ok=True)
    with open(args.data_list) as f:
        paths = [line.split()[0] for line in f if line.strip()]
    for i, rel in enumerate(paths):
        img = np.asarray(Image.open(os.path.join(args.data_dir, rel))
                         .convert('RGB'), np.float32) / 255.0
        sp = generate(img, args.max_segments,
                      globalize=not args.no_globalize,
                      half_res=args.pmi, detector=detector)
        name = os.path.splitext(os.path.basename(rel))[0] + '.png'
        Image.fromarray(sp.astype(np.uint16)).save(
            os.path.join(args.save_dir, name))
        if (i + 1) % 100 == 0 or i == len(paths) - 1:
            print(f'[{i + 1}/{len(paths)}]', flush=True)


if __name__ == '__main__':
    main()
