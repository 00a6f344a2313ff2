"""Device-resident pipeline: epoch-shuffled sampling + memory-bank step.

Covers the round-2 VERDICT items: device_resident sampling must be
epoch-shuffled (not i.i.d. with replacement) and must compose with the
rolling memory bank.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hsg_tpu.parallel import mesh as mesh_lib
from hsg_tpu.train import resident as res_lib


def test_epoch_indices_cover_each_epoch_exactly_once():
    key = jax.random.PRNGKey(0)
    n_total, b = 24, 4
    steps_per_epoch = n_total // b
    for epoch in range(3):
        seen = []
        for pos in range(steps_per_epoch):
            step = jnp.int32(epoch * steps_per_epoch + pos)
            idx = np.asarray(res_lib.epoch_indices(step, n_total, b, key))
            assert idx.shape == (b,)
            seen.extend(idx.tolist())
        # One full epoch = each image exactly once.
        assert sorted(seen) == list(range(n_total))


def test_epoch_indices_reshuffle_between_epochs_and_deterministic():
    key = jax.random.PRNGKey(7)
    n_total, b = 16, 4
    e0 = [np.asarray(res_lib.epoch_indices(jnp.int32(s), n_total, b, key))
          for s in range(4)]
    e1 = [np.asarray(res_lib.epoch_indices(jnp.int32(s + 4), n_total, b,
                                           key)) for s in range(4)]
    assert not all((a == b_).all() for a, b_ in zip(e0, e1))
    # Same step -> same indices (pure function; resume-safe).
    again = np.asarray(res_lib.epoch_indices(jnp.int32(2), n_total, b, key))
    np.testing.assert_array_equal(again, e0[2])


def test_epoch_indices_drop_remainder_and_tiny_dataset():
    key = jax.random.PRNGKey(1)
    # 10 images, batch 4 -> 2 steps/epoch, remainder dropped.
    seen = []
    for s in range(2):
        seen.extend(np.asarray(
            res_lib.epoch_indices(jnp.int32(s), 10, 4, key)).tolist())
    assert len(seen) == len(set(seen)) == 8
    # Dataset smaller than a batch: tiled permutation, all images present.
    idx = np.asarray(res_lib.epoch_indices(jnp.int32(0), 3, 8, key))
    assert idx.shape == (8,)
    assert set(idx.tolist()) == {0, 1, 2}


@pytest.mark.slow
def test_chained_step_equals_unchained():
    """train.chain_steps: N scanned steps in one dispatch must replay
    the host loop exactly — same epoch sampling (state.step-driven) and
    same per-step rng (fold_in(rng, state.step) == fold_in(rng, it)).

    Bitwise trajectory equality is not achievable (XLA fuses the scan
    body differently from the standalone step, reordering float sums;
    SGD then amplifies the ulps), so this checks the LOGIC two ways:
    (a) with frozen params (lr=0) every step's loss is a pure function
    of (params, sampled batch, step rng) — per-step losses must match
    across arbitrary chain splits; (b) with real lr, one chained step
    must match one dispatched step to fp tolerance."""
    from test_train_step import _cfg, _model
    from hsg_tpu.models import predictions as pred_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib

    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    rng_np = np.random.default_rng(9)
    n_total, local_images, S, crop, v = 6, 2, 32, 32, 2

    data = {
        'image_raw': jnp.asarray(
            rng_np.integers(0, 255, (n_total, S, S, 3)), jnp.uint8),
        'instance_raw': jnp.asarray(
            rng_np.integers(0, 6, (n_total, S, S)), jnp.int32),
        'true_hw': jnp.asarray(np.full((n_total, 2), S, np.int32)),
    }
    rows = local_images * v
    init_batch = {
        'image': jnp.zeros((rows, crop, crop, 3), jnp.float32),
        'semantic_label': jnp.zeros((rows, crop, crop), jnp.int32),
        'instance_label': jnp.zeros((rows, crop, crop), jnp.int32),
    }

    def build(base_lr):
        c = _cfg()
        c.train.base_lr = base_lr
        state, update_fn = ts_lib.create_train_state(
            model, jax.random.PRNGKey(0), init_batch)
        schedule = opt_lib.schedule_from_config(c)
        base_step = ts_lib.make_train_step(
            model, prediction, schedule, update_fn,
            device_photometric={
                'mean': (0.4, 0.45, 0.5), 'std': (0.2, 0.25, 0.3),
                'geometric': {'crop': crop, 'num_views': v},
            })
        mesh = mesh_lib.create_mesh(1)
        res = res_lib.make_resident_step(base_step, n_total,
                                         local_images, mesh)
        return state, res, jax.device_put(data,
                                          mesh_lib.replicated(mesh))

    rng = jax.random.PRNGKey(1235)

    # (a) frozen params: per-step losses across a 2+1 chain split must
    # equal the host loop's (same sampled batches, same step rng).
    state, res_step, d = build(0.0)
    step_fn = jax.jit(res_step)
    losses = []
    for it in range(3):
        state, m = step_fn(state, d, jax.random.fold_in(rng, it))
        losses.append(float(m['loss']))
    assert int(state.step) == 3

    state_c, _, _ = build(0.0)
    ch2 = jax.jit(res_lib.make_chained_step(res_step, 2))
    ch1 = jax.jit(res_lib.make_chained_step(res_step, 1))
    state_c, m01 = ch2(state_c, d, rng)
    state_c, m2 = ch1(state_c, d, rng)
    assert int(state_c.step) == 3
    np.testing.assert_allclose(float(m01['loss']), losses[1], rtol=1e-5)
    np.testing.assert_allclose(float(m2['loss']), losses[2], rtol=1e-5)
    # Sampling differs per step (different batches -> different losses).
    assert abs(losses[1] - losses[0]) > 1e-6

    # (b) real lr: one chained step == one dispatched step.
    state, res_step, d = build(0.1)
    s1, m1 = jax.jit(res_step)(state, d, jax.random.fold_in(rng, 0))
    state_c, _, _ = build(0.1)
    s2, m2 = jax.jit(res_lib.make_chained_step(res_step, 1))(
        state_c, d, rng)
    np.testing.assert_allclose(float(m2['loss']), float(m1['loss']),
                               rtol=1e-5)
    assert int(s2.step) == int(s1.step) == 1


@pytest.mark.slow
def test_resident_step_with_memory_bank():
    """device_resident x memory_bank_size>0 (round-2 guard removed): the
    wrapped step selects rows on device, trains, and rolls the bank."""
    from test_train_step import _cfg, _model
    from hsg_tpu.models import predictions as pred_lib
    from hsg_tpu.train import memory_bank as mb_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib

    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    rng = np.random.default_rng(5)
    n_total, local_images, S, crop, v = 6, 2, 32, 32, 2

    data = {
        'image_raw': jnp.asarray(
            rng.integers(0, 255, (n_total, S, S, 3)), jnp.uint8),
        'instance_raw': jnp.asarray(
            rng.integers(0, 6, (n_total, S, S)), jnp.int32),
        'true_hw': jnp.asarray(
            np.full((n_total, 2), S, np.int32)),
    }
    rows = local_images * v
    init_batch = {
        'image': jnp.zeros((rows, crop, crop, 3), jnp.float32),
        'semantic_label': jnp.zeros((rows, crop, crop), jnp.int32),
        'instance_label': jnp.zeros((rows, crop, crop), jnp.int32),
    }
    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), init_batch)
    schedule = opt_lib.schedule_from_config(cfg)
    base_step = ts_lib.make_train_step(
        model, prediction, schedule, update_fn,
        use_memory_bank=True,
        device_photometric={
            'mean': (0.4, 0.45, 0.5), 'std': (0.2, 0.25, 0.3),
            'geometric': {'crop': crop, 'num_views': v},
        })
    mesh = mesh_lib.create_mesh(1)
    step_fn = jax.jit(
        res_lib.make_resident_step(base_step, n_total, local_images, mesh),
        donate_argnums=(0, 3))
    bank = mb_lib.create(2, rows * int(model.max_segments),
                         cfg.network.embedding_dim)
    data = jax.device_put(data, mesh_lib.replicated(mesh))

    for i in range(2):
        state, metrics, bank = step_fn(state, data, jax.random.PRNGKey(i),
                                       bank)
        assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2
    # Both steps wrote their prototype group into the ring.
    assert (np.asarray(bank.write_steps) >= 0).sum() == 2
    assert np.asarray(bank.valid).any()
