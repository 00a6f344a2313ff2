"""Superpixel generator produces a bounded, spatially coherent partition."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))

cv2 = pytest.importorskip('cv2')

from generate_superpixels import generate  # noqa: E402


def test_superpixels_bounded_and_aligned():
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :32] = [0.9, 0.1, 0.1]
    img[:, 32:] = [0.1, 0.1, 0.9]
    img[:32, :, 1] += 0.5
    img += rng.normal(0, 0.02, img.shape)
    img = np.clip(img, 0, 1)

    sp = generate(img, max_segments=8)
    n = sp.max() + 1
    assert n <= 8
    assert sp.min() == 0
    assert sp.shape == (64, 64)
    # Strong color boundary at x=32 should separate regions: the left and
    # right halves must not be dominated by one shared segment.
    left = np.bincount(sp[:, :30].reshape(-1), minlength=n)
    right = np.bincount(sp[:, 34:].reshape(-1), minlength=n)
    overlap = np.minimum(left, right).sum() / sp[:, :30].size
    assert overlap < 0.5
