"""Optimizer semantics vs hand-computed reference updates."""

import numpy as np
import jax.numpy as jnp

from hsg_tpu.train import optimizer as opt_lib


def test_sgd_matches_reference_semantics():
    # Reference SGD (lib/nn/optimizer.py:67-104):
    # buf = mom * buf + (mult * lr) * (g + wd * p); p -= buf.
    p = {'w': jnp.asarray([1.0, 2.0]), 'b': jnp.asarray([0.5])}
    g = {'w': jnp.asarray([0.1, -0.2]), 'b': jnp.asarray([0.3])}
    mults = {'w': 1.0, 'b': 2.0}
    mask = {'w': True, 'b': False}
    init_fn, update_fn = opt_lib.sgd(0.9, 0.01, mults, mask)
    state = init_fn(p)
    lr = 0.5

    updates, state = update_fn(g, state, p, lr)
    buf_w = 0.5 * (np.array([0.1, -0.2]) + 0.01 * np.array([1.0, 2.0]))
    buf_b = 2.0 * 0.5 * np.array([0.3])
    np.testing.assert_allclose(np.asarray(updates['w']), -buf_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates['b']), -buf_b, rtol=1e-6)

    # Second step: momentum accumulates.
    updates2, state = update_fn(g, state, p, lr)
    buf_w2 = 0.9 * buf_w + buf_w
    np.testing.assert_allclose(np.asarray(updates2['w']), -buf_w2, rtol=1e-6)


def test_adam_matches_reference_semantics():
    p = {'w': jnp.asarray([1.0])}
    g = {'w': jnp.asarray([0.2])}
    init_fn, update_fn = opt_lib.adam((0.9, 0.999), 1e-8, 0.0)
    state = init_fn(p)
    lr = 0.1
    updates, state = update_fn(g, state, p, lr)
    m = 0.1 * 0.2
    v = 0.001 * 0.04
    step_size = lr * np.sqrt(1 - 0.999) / (1 - 0.9)
    expected = -step_size * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(updates['w']), [expected],
                               rtol=1e-5)


def test_clip_grad():
    g = {'w': jnp.asarray([-5.0, 0.2, 7.0])}
    out = opt_lib.clip_grad(g, 1.0)
    np.testing.assert_allclose(np.asarray(out['w']), [-1.0, 0.2, 1.0])
