"""Optimizer semantics vs hand-computed reference updates."""

import numpy as np
import jax
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


def test_fused_sgd_matches_unfused_tree_layout():
    """The grouped flat-buffer SGD (default) must produce the same
    updates as the per-leaf tree layout across steps, including mixed
    multipliers/decay groups and multi-shape leaves."""
    rng = np.random.default_rng(3)
    p = {'conv': {'kernel': jnp.asarray(rng.normal(size=(3, 3, 4, 8)),
                                        jnp.float32),
                  'bias': jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
         'head': {'kernel': jnp.asarray(rng.normal(size=(8, 2)),
                                        jnp.float32),
                  'bias': jnp.asarray(rng.normal(size=(2,)), jnp.float32)}}
    mults = {'conv': {'kernel': 1.0, 'bias': 2.0},
             'head': {'kernel': 10.0, 'bias': 20.0}}
    mask = {'conv': {'kernel': True, 'bias': False},
            'head': {'kernel': True, 'bias': False}}
    init_f, upd_f = opt_lib.sgd(0.9, 0.01, mults, mask, fused=True)
    init_u, upd_u = opt_lib.sgd(0.9, 0.01, mults, mask, fused=False)
    sf, su = init_f(p), init_u(p)
    # 4 (mult, decay) groups -> 4 flat buffers.
    assert len(sf.momentum) == 4
    for step in range(3):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.default_rng(step).normal(size=x.shape),
                jnp.float32), p)
        uf, sf = upd_f(g, sf, p, 0.05)
        uu, su = upd_u(g, su, p, 0.05)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b),
                                                    rtol=1e-6),
            uf, uu)
        p = jax.tree_util.tree_map(lambda x, u: x + u, p, uf)


def test_clip_grad():
    g = {'w': jnp.asarray([-5.0, 0.2, 7.0])}
    out = opt_lib.clip_grad(g, 1.0)
    np.testing.assert_allclose(np.asarray(out['w']), [-1.0, 0.2, 1.0])
