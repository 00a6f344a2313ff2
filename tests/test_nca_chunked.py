"""Chunked-scan NCA must match the dense implementation exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from hsg_tpu.losses import segsort
from hsg_tpu.losses.nca_chunked import segsort_log_likelihood_chunked


def _setup(n=40, g=23, c=8, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, c)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    protos = rng.normal(size=(g, c)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    pid = rng.integers(0, g, n)
    proto_sem = rng.integers(0, 4, g)
    sem = proto_sem[pid]
    pvalid = rng.random(g) > 0.2
    # Pixels pointing at invalid prototypes are themselves invalid.
    pxvalid = pvalid[pid]
    return (jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(pid),
            jnp.asarray(protos), jnp.asarray(proto_sem),
            jnp.asarray(pvalid), jnp.asarray(pxvalid))


def test_chunked_matches_dense_forward():
    emb, sem, pid, protos, proto_sem, pvalid, pxvalid = _setup()
    dense = segsort.segsort_log_likelihood(
        emb, sem, pid, protos, proto_sem, 12.0,
        prototype_valid=pvalid, pixel_valid=pxvalid)
    for chunk in (4, 7, 23, 64):
        chunked = segsort_log_likelihood_chunked(
            emb, sem, pid, protos, proto_sem, 12.0,
            prototype_valid=pvalid, pixel_valid=pxvalid, chunk=chunk)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_matches_dense_gradients():
    emb, sem, pid, protos, proto_sem, pvalid, pxvalid = _setup(seed=1)

    def dense_loss(e, p):
        nll = segsort.segsort_log_likelihood(
            e, sem, pid, p, proto_sem, 12.0,
            prototype_valid=pvalid, pixel_valid=pxvalid)
        return segsort.masked_mean(nll, pxvalid)

    def chunked_loss(e, p):
        nll = segsort_log_likelihood_chunked(
            e, sem, pid, p, proto_sem, 12.0,
            prototype_valid=pvalid, pixel_valid=pxvalid, chunk=8)
        return segsort.masked_mean(nll, pxvalid)

    ge_d, gp_d = jax.grad(dense_loss, argnums=(0, 1))(emb, protos)
    ge_c, gp_c = jax.grad(chunked_loss, argnums=(0, 1))(emb, protos)
    np.testing.assert_allclose(np.asarray(ge_c), np.asarray(ge_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_d),
                               rtol=1e-4, atol=1e-6)


def test_auto_chunk_threshold_in_loss_class():
    emb, sem, pid, protos, proto_sem, pvalid, pxvalid = _setup()
    loss_dense = segsort.SegSortLoss(12.0)
    loss_chunked = segsort.SegSortLoss(12.0, chunk=8)
    a = loss_dense(emb, sem, pid, protos, proto_sem,
                   pixel_valid=pxvalid, prototype_valid=pvalid)
    b = loss_chunked(emb, sem, pid, protos, proto_sem,
                     pixel_valid=pxvalid, prototype_valid=pvalid)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
