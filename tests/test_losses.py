"""Golden-value tests for SegSort and graph losses.

Expected values computed with explicit numpy loops implementing the
reference semantics (hsg/utils/segsort/loss.py, hsg/utils/graph/loss.py).
"""

import math

import numpy as np
import jax.numpy as jnp

from hsg_tpu.losses import segsort, graph


def _np_normalize(x, eps=1e-12):
    n = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)
    return x / n


def _np_segsort_nll(emb, sem, pid, protos, proto_sem, kappa, plus=True):
    sims = np.exp(kappa * emb @ protos.T)
    out = np.zeros(len(emb))
    for i in range(len(emb)):
        self_sim = sims[i, pid[i]]
        same = (proto_sem == sem[i])
        same_sum = sims[i][same].sum() - self_sim
        num = same_sum if (plus and same_sum > 0) else self_sim
        diff_sum = sims[i][~same].sum()
        out[i] = -math.log(num / (diff_sum + num))
    return out


def test_segsort_loss_matches_numpy():
    rng = np.random.default_rng(0)
    n, g, c = 30, 6, 8
    emb = _np_normalize(rng.normal(size=(n, c)).astype(np.float32))
    protos = _np_normalize(rng.normal(size=(g, c)).astype(np.float32))
    pid = rng.integers(0, g, n)
    proto_sem = rng.integers(0, 3, g)
    sem = proto_sem[pid]
    got = np.asarray(segsort.segsort_log_likelihood(
        jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(pid),
        jnp.asarray(protos), jnp.asarray(proto_sem), 10.0))
    expected = _np_segsort_nll(emb, sem, pid, protos, proto_sem, 10.0)
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_segsort_loss_masked_prototypes_equal_dropped():
    """Loss over masked padded prototypes == loss with them removed."""
    rng = np.random.default_rng(1)
    n, g, c = 20, 5, 4
    emb = _np_normalize(rng.normal(size=(n, c)).astype(np.float32))
    protos = _np_normalize(rng.normal(size=(g, c)).astype(np.float32))
    pid = rng.integers(0, g - 2, n)  # pixels only reference first 3 protos
    proto_sem = np.array([0, 0, 1, 2, 2])
    sem = proto_sem[pid]
    loss = segsort.SegSortLoss(concentration=8.0)
    # Padded variant: append junk prototypes behind a mask.
    protos_pad = np.concatenate(
        [protos, _np_normalize(rng.normal(size=(3, c)).astype(np.float32))])
    sem_pad = np.concatenate([proto_sem, [0, 1, 2]])
    pvalid = np.array([1, 1, 1, 1, 1, 0, 0, 0], bool)
    full = loss(jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(pid),
                jnp.asarray(protos), jnp.asarray(proto_sem))
    padded = loss(jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(pid),
                  jnp.asarray(protos_pad), jnp.asarray(sem_pad),
                  prototype_valid=jnp.asarray(pvalid))
    np.testing.assert_allclose(float(full), float(padded), rtol=1e-5)


def test_segsort_pixel_mask_excludes_from_mean():
    rng = np.random.default_rng(2)
    n, g, c = 10, 4, 4
    emb = _np_normalize(rng.normal(size=(n, c)).astype(np.float32))
    protos = _np_normalize(rng.normal(size=(g, c)).astype(np.float32))
    pid = rng.integers(0, g, n)
    proto_sem = np.arange(g)
    sem = proto_sem[pid]
    valid = np.zeros(n, bool)
    valid[:4] = True
    loss = segsort.SegSortLoss(concentration=5.0)
    masked = loss(jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(pid),
                  jnp.asarray(protos), jnp.asarray(proto_sem),
                  pixel_valid=jnp.asarray(valid))
    sub = loss(jnp.asarray(emb[:4]), jnp.asarray(sem[:4]), jnp.asarray(pid[:4]),
               jnp.asarray(protos), jnp.asarray(proto_sem))
    np.testing.assert_allclose(float(masked), float(sub), rtol=1e-6)


def test_set_segsort_matches_numpy():
    rng = np.random.default_rng(3)
    n, g, c, ncls = 12, 5, 6, 4
    emb = _np_normalize(rng.normal(size=(n, c)).astype(np.float32))
    protos = _np_normalize(rng.normal(size=(g, c)).astype(np.float32))
    pid = rng.integers(0, g, n)
    tags = (rng.random((n, ncls)) > 0.5).astype(np.int64)
    ptags = (rng.random((g, ncls)) > 0.5).astype(np.int64)
    got = np.asarray(segsort.set_segsort_log_likelihood(
        jnp.asarray(emb), jnp.asarray(tags), jnp.asarray(pid),
        jnp.asarray(protos), jnp.asarray(ptags), 6.0))
    sims = np.exp(6.0 * emb @ protos.T)
    expected = np.zeros(n)
    for i in range(n):
        aff = tags[i] @ ptags.T
        same = aff > 0
        self_sim = sims[i, pid[i]]
        same_sum = sims[i][same].sum() - self_sim
        num = same_sum if same_sum > 0 else self_sim
        diff = sims[i][aff == 0].sum()
        expected[i] = -math.log(num / (diff + num))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_top_k_ranking():
    protos = np.eye(4, dtype=np.float32)
    emb = np.array([[0.9, 0.1, 0, 0], [0, 0, 0.8, 0.2]], np.float32)
    labels = np.array([7, 9])
    proto_labels = np.array([7, 8, 9, 7])
    acc, topk = segsort.top_k_ranking(
        jnp.asarray(emb), jnp.asarray(labels),
        jnp.asarray(protos), jnp.asarray(proto_labels), top_k=2)
    topk = np.asarray(topk)
    assert topk[0, 0] == 7 and topk[1, 0] == 9
    # query0: top2 = protos 0(7), 1(8) -> hits [1, 0]; query1: 2(9), 3(7) -> [1, 0]
    np.testing.assert_allclose(float(acc), 0.5)
    maj = segsort.majority_label_from_topk(jnp.asarray(topk), 10)
    # query1 retrieves [9, 7]: a tie, argmax takes the smallest class (7).
    np.testing.assert_array_equal(np.asarray(maj), [7, 7])


def test_top_k_accuracy_chunked_matches_dense():
    rng = np.random.default_rng(3)
    n, g, c = 105, 37, 8
    emb = rng.normal(size=(n, c)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    protos = rng.normal(size=(g, c)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    labels = rng.integers(0, 5, n)
    plabels = rng.integers(0, 5, g)
    qv = rng.random(n) > 0.2
    pv = rng.random(g) > 0.2
    dense_acc, _ = segsort.top_k_ranking(
        jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(protos),
        jnp.asarray(plabels), top_k=5,
        query_valid=jnp.asarray(qv), prototype_valid=jnp.asarray(pv))
    chunked_acc = segsort.top_k_accuracy_chunked(
        jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(protos),
        jnp.asarray(plabels), top_k=5,
        query_valid=jnp.asarray(qv), prototype_valid=jnp.asarray(pv),
        chunk=16)
    np.testing.assert_allclose(float(chunked_acc), float(dense_acc),
                               rtol=1e-6)


def _np_affinity(x, valid, group, knn, concentration=5.0):
    """Reference-semantic affinity for one graph: x `[N, C]`."""
    n = x.shape[0]
    a = np.exp(concentration * (x @ x.T))
    for i in range(n):
        for j in range(n):
            if not (valid[i] and valid[j]):
                a[i, j] = 0
    if valid.sum() > 1:
        np.fill_diagonal(a, 0)
    if knn is not None:
        for g in np.unique(group[valid]):
            cols = valid & (group == g)
            k = min(cols.sum(), knn)
            if k == 0:
                continue
            for i in range(n):
                vals = np.sort(a[i, cols])[::-1]
                kth = vals[k - 1]
                for j in range(n):
                    if cols[j] and a[i, j] < kth:
                        a[i, j] = 0
    return (a > 0).astype(np.float32)


def test_affinity_matrix_knn_matches_numpy():
    rng = np.random.default_rng(4)
    n, c = 10, 5
    x = _np_normalize(rng.normal(size=(1, n, c)).astype(np.float32))
    valid = np.ones((1, n), bool)
    valid[0, -2:] = False
    group = np.zeros((1, n), np.int32)
    group[0, n // 2:] = 1
    got = np.asarray(graph.affinity_matrix_as_attention(
        jnp.asarray(x), jnp.asarray(valid), jnp.asarray(group),
        num_groups=2, knn=2))
    expected = _np_affinity(x[0], valid[0], group[0], 2)
    np.testing.assert_array_equal(got[0], expected)


def test_affinity_no_knn_no_selfloop_single_node():
    x = _np_normalize(np.ones((1, 3, 4), np.float32))
    valid = np.array([[True, False, False]])
    got = np.asarray(graph.affinity_matrix_as_attention(
        jnp.asarray(x), jnp.asarray(valid), binarize=False))
    # Single valid node: self loop kept.
    assert got[0, 0, 0] > 0
    assert got[0, 1, 1] == 0


def _np_dmon(adj, s, mask):
    b, n, k = s.shape
    s = s * mask[:, :, None]
    dmons, collapses = [], []
    for bi in range(b):
        a = adj[bi]
        ss = s[bi]
        d = a.sum(1)
        two_m = 2 * d.sum()
        sas = ss.T @ a @ ss
        ds = d @ ss
        num = np.trace(sas) - (ds @ ds) / two_m
        dmons.append(1 - num / two_m)
        collapses.append(np.linalg.norm(ss.sum(0)) * math.sqrt(k) / n)
    return np.mean(dmons), np.mean(collapses)


def test_dmon_pool_loss_matches_numpy():
    rng = np.random.default_rng(5)
    b, n, k = 2, 8, 3
    x = _np_normalize(rng.normal(size=(b, n, 4)).astype(np.float32))
    adj = (rng.random((b, n, n)) > 0.5).astype(np.float32)
    logits = rng.normal(size=(b, n, k)).astype(np.float32)
    s = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    mask = np.ones((b, n), bool)
    mask[0, -2:] = False
    dmon, collapse = graph.dmon_pool_loss(
        jnp.asarray(adj), jnp.asarray(s), jnp.asarray(mask))
    e_dmon, e_collapse = _np_dmon(adj, s, mask)
    np.testing.assert_allclose(float(dmon), e_dmon, rtol=1e-5)
    np.testing.assert_allclose(float(collapse), e_collapse, rtol=1e-5)


def test_dmon_loss_end_to_end_runs():
    rng = np.random.default_rng(6)
    b, n, k = 2, 12, 4
    x = _np_normalize(rng.normal(size=(b, n, 6)).astype(np.float32))
    s = np.abs(rng.normal(size=(b, n, k))).astype(np.float32)
    s = s / s.sum(-1, keepdims=True)
    valid = np.ones((b, n), bool)
    group = np.repeat(np.arange(2), n // 2)[None].repeat(b, 0)
    loss = graph.DMonLoss(adj_knn=3)
    dmon, collapse = loss(jnp.asarray(s), jnp.asarray(x),
                          jnp.asarray(valid), jnp.asarray(group), num_groups=2)
    assert np.isfinite(float(dmon)) and np.isfinite(float(collapse))


def test_ncut_pool_loss_matches_numpy():
    rng = np.random.default_rng(7)
    b, n, k = 1, 6, 2
    adj = (rng.random((b, n, n)) > 0.4).astype(np.float32)
    logits = rng.normal(size=(b, n, k)).astype(np.float32)
    mask = np.ones((b, n), bool)
    ncut, self_loss = graph.ncut_pool_loss(
        jnp.asarray(adj), jnp.asarray(logits), jnp.asarray(mask))
    s = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    cut = np.einsum('bnk,bnm,bmk->bk', s, adj, 1 - s)
    deg = np.einsum('bnm,bnk->bk', adj, s) + 1e-2
    e_ncut = np.mean(np.sum(cut / deg, axis=1))
    ent = -np.clip(s, 1e-5, 1) * np.log(np.clip(s, 1e-5, 1))
    e_self = np.mean(ent.sum(1))
    np.testing.assert_allclose(float(ncut), e_ncut, rtol=1e-5)
    np.testing.assert_allclose(float(self_loss), e_self, rtol=1e-5)


def test_hierarchical_dmon_runs_two_levels():
    rng = np.random.default_rng(8)
    b, n, k1, k2 = 2, 10, 4, 2
    x = _np_normalize(rng.normal(size=(b, n, 5)).astype(np.float32))
    s1 = np.abs(rng.normal(size=(b, n, k1))).astype(np.float32)
    s1 = s1 / s1.sum(-1, keepdims=True)
    s2 = np.abs(rng.normal(size=(b, k1, k2))).astype(np.float32)
    s2 = s2 / s2.sum(-1, keepdims=True)
    v1 = np.ones((b, n), bool)
    v2 = np.ones((b, k1), bool)
    loss = graph.HierarchicalDMonLoss(adj_knn=None)
    dmons, collapses = loss([jnp.asarray(s1), jnp.asarray(s2)], jnp.asarray(x),
                            [jnp.asarray(v1), jnp.asarray(v2)])
    assert len(dmons) == 2 and len(collapses) == 2
    assert all(np.isfinite(float(d)) for d in dmons)
