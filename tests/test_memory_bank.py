"""Trainer-side memory bank + feat_aff loss.

Covers VERDICT.md round-1 items: the rolling prototype memory bank
(reference pyscripts/train/train.py:328-345) and the feature-affinity
SetSegSort loss over NN pseudo-labels (reference
predictions/segsort.py:41-47 + models/utils.py:243-309).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_train_step import _cfg, _model, _batch
from hsg_tpu.models import predictions as pred_lib
from hsg_tpu.train import memory_bank as mb_lib
from hsg_tpu.train import optimizer as opt_lib
from hsg_tpu.train import train_step as ts_lib


# ---------------------------------------------------------------------------
# Ring-buffer semantics
# ---------------------------------------------------------------------------

def test_memory_bank_fifo_and_batch_index_shift():
    bank = mb_lib.create(bank_size=2, group=3, channels=4)
    t0 = mb_lib.as_targets(bank, jnp.asarray(0), batch_size=8)
    assert not bool(np.any(np.asarray(t0['memory_prototype_valid'])))

    def write(bank, step, fill):
        protos = jnp.full((3, 4), float(fill))
        labels = jnp.asarray([fill, fill, -1], jnp.int32)
        batch_idx = jnp.asarray([0, 1, -1], jnp.int32)
        valid = jnp.asarray([True, True, False])
        return mb_lib.update(bank, protos, labels, batch_idx, valid,
                             jnp.asarray(step, jnp.int32))

    bank = write(bank, 0, 1)
    bank = write(bank, 1, 2)
    bank = write(bank, 2, 3)   # evicts step-0 (FIFO, train.py:337-338)

    t = mb_lib.as_targets(bank, jnp.asarray(3), batch_size=8)
    protos = np.asarray(t['memory_prototype']).reshape(2, 3, 4)
    fills = sorted(protos[:, 0, 0].tolist())
    assert fills == [2.0, 3.0]                      # 1.0 was evicted
    # age-based batch-index shift: entry written at step s, read at step 3
    # -> shift (3 - s) * 8 (reference shifts += B once per iteration).
    bi = np.asarray(t['memory_prototype_batch_index']).reshape(2, 3)
    ws = np.asarray(bank.write_steps)
    for slot in range(2):
        shift = (3 - ws[slot]) * 8
        np.testing.assert_array_equal(bi[slot, :2], [0 + shift, 1 + shift])
    # invalid group member stays invalid.
    valid = np.asarray(t['memory_prototype_valid']).reshape(2, 3)
    np.testing.assert_array_equal(valid[:, 2], [False, False])
    np.testing.assert_array_equal(valid[:, :2], True)


# ---------------------------------------------------------------------------
# feat_aff loss vs a numpy oracle
# ---------------------------------------------------------------------------

def _np_multiset_labels(emb, protos, proto_sem, emb_batch, proto_batch,
                        num_classes, top_k, threshold, proto_valid):
    """Independent numpy oracle of the NN pseudo-label generator
    (models/utils.py:243-309 semantics)."""
    n = emb.shape[0]
    dists = emb @ protos.T
    ok = ((emb_batch[:, None] == proto_batch[None, :])
          & (proto_sem[None, :] < num_classes) & proto_valid[None, :])
    dists = np.where(ok, dists, dists.min() - 1.0)
    out = np.zeros((n, num_classes), np.int32)
    for i in range(n):
        idx = np.argsort(-dists[i])[:top_k]
        for j in idx:
            if dists[i, j] >= threshold and proto_sem[j] < num_classes:
                out[i, proto_sem[j]] = 1
    return out


def _np_set_segsort(emb, tags, pid, protos, proto_tags, conc, pix_valid,
                    proto_valid):
    """Independent numpy oracle of SetSegSort 'segsort+'
    (segsort/loss.py:85-130 semantics)."""
    sims = np.exp(conc * (emb @ protos.T)) * proto_valid[None, :]
    aff = tags @ proto_tags.T
    nlls = []
    for i in range(emb.shape[0]):
        if not pix_valid[i]:
            continue
        self_sim = sims[i, pid[i]]
        same = (aff[i] > 0) & proto_valid
        diff = (aff[i] == 0) & proto_valid
        same_sum = sims[i][same].sum() - self_sim
        num = same_sum if same_sum > 0 else self_sim
        den = sims[i][diff].sum() + num
        nlls.append(-np.log(num / den))
    return float(np.mean(nlls))


def test_feat_aff_loss_matches_numpy_oracle():
    cfg = _cfg()
    cfg.train.feat_aff_loss_types = 'segsort'
    cfg.train.feat_aff_concentration = 8
    cfg.train.feat_aff_loss_weight = 1.0
    # Disable the other losses to isolate feat_aff.
    for k in ('sem_ann', 'sem_occ', 'img_sim'):
        setattr(cfg.train, f'{k}_loss_types', 'none')
    model = pred_lib.segsort(cfg)

    # Tiny hand-built datas: 2 views, 4 pixels, 2 segment slots each.
    rng = np.random.default_rng(3)
    b, p, s, c = 2, 4, 2, 6
    emb = rng.normal(size=(b, p, c)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    cluster_index = np.asarray([[0, 0, 1, 1], [0, 1, 1, 1]])
    pixel_valid = np.asarray([[True, True, True, False],
                              [True, True, True, True]])
    segment_valid = np.asarray([[True, True], [True, True]])
    seg_sem = np.asarray([[1, 2], [2, 5]])   # 5 >= num_classes(4): unlabeled
    datas = {
        'cluster_embedding': jnp.asarray(emb),
        'cluster_index': jnp.asarray(cluster_index),
        'pixel_valid': jnp.asarray(pixel_valid),
        'segment_valid': jnp.asarray(segment_valid),
        'segment_semantic_label': jnp.asarray(seg_sem),
    }
    res = model(datas, {}, with_loss=True)
    got = float(res['feat_aff_loss'])

    # Oracle: prototypes are masked means normalized, as in
    # calculate_prototypes_from_labels.
    protos = np.zeros((b, s, c), np.float32)
    for bi in range(b):
        for si in range(s):
            m = (cluster_index[bi] == si) & pixel_valid[bi]
            v = emb[bi][m].sum(0)
            protos[bi, si] = v / max(np.linalg.norm(v), 1e-12)
    proto_flat = protos.reshape(b * s, c)
    proto_valid = segment_valid.reshape(-1)
    gen_sem = seg_sem.reshape(-1)
    pix_batch = np.repeat(np.arange(b), p)
    seg_batch = np.repeat(np.arange(b), s)
    nc, k, thr = 4, 3, 0.95
    pix_tags = _np_multiset_labels(
        emb.reshape(-1, c), proto_flat, gen_sem, pix_batch, seg_batch,
        nc, k, thr, proto_valid)
    proto_tags = _np_multiset_labels(
        proto_flat, proto_flat, gen_sem, seg_batch, seg_batch,
        nc, k, thr, proto_valid)
    pid = (np.arange(b)[:, None] * s + cluster_index).reshape(-1)
    want = _np_set_segsort(
        emb.reshape(-1, c), pix_tags, pid, proto_flat, proto_tags,
        8.0, pixel_valid.reshape(-1), proto_valid)
    np.testing.assert_allclose(got, want, rtol=1e-4)


# ---------------------------------------------------------------------------
# Train step with the bank threaded through
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_train_step_with_memory_bank_rolls_and_learns():
    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    batch = _batch(b=4)
    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), batch, momentum=0.9,
        weight_decay=1e-4)
    schedule = opt_lib.schedule_from_config(cfg)
    step_fn = jax.jit(ts_lib.make_train_step(
        model, prediction, schedule, update_fn, use_memory_bank=True))

    group = 4 * 8   # batch * max_segments_per_view
    bank = mb_lib.create(2, group, 16)
    for i in range(3):
        state, metrics, bank = step_fn(state, batch,
                                       jax.random.PRNGKey(i), bank)
        assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 3
    # The bank cycled (capacity 2, 3 writes) and holds live prototypes.
    assert int(bank.cursor) == 1
    np.testing.assert_array_equal(np.asarray(bank.write_steps), [2, 1])
    t = mb_lib.as_targets(bank, state.step, 4)
    assert bool(np.any(np.asarray(t['memory_prototype_valid'])))
    norms = np.linalg.norm(np.asarray(t['memory_prototype']), axis=-1)
    valid = np.asarray(t['memory_prototype_valid'])
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-3)
