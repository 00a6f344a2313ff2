"""Sliding-window embedding accumulation vs a manual loop."""

import numpy as np
import jax.numpy as jnp

from hsg_tpu.eval import sliding


def test_window_starts_cover_image():
    starts = sliding.window_starts(100, 40, 30)
    assert starts[0] == 0
    assert starts[-1] == 60  # last window ends at 100
    for s in starts:
        assert 0 <= s <= 60


def test_sliding_matches_manual_average():
    rng = np.random.default_rng(0)
    h = w = 8
    crop = (4, 4)
    stride = (2, 2)
    image = rng.normal(size=(h, w, 3)).astype(np.float32)
    weight = rng.normal(size=(3, 5)).astype(np.float32)

    def embed_fn(batch):
        return jnp.einsum('nhwc,cd->nhwd', batch, jnp.asarray(weight))

    got = np.asarray(sliding.sliding_window_embeddings(
        embed_fn, jnp.asarray(image), crop, stride))

    # Manual reference: per-window embed -> normalize -> accumulate.
    def normalize(x):
        n = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x / n

    canvas = np.zeros((h, w, 5), np.float32)
    counts = np.zeros((h, w, 1), np.float32)
    ys = sliding.window_starts(h, crop[0], stride[0])
    xs = sliding.window_starts(w, crop[1], stride[1])
    for y in ys:
        for x in xs:
            win = image[y:y + 4, x:x + 4]
            emb = normalize(win @ weight)
            canvas[y:y + 4, x:x + 4] += emb
            counts[y:y + 4, x:x + 4] += 1
    expected = canvas / np.maximum(counts, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
