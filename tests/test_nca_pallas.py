"""Pallas fused NCA kernel vs the dense reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from hsg_tpu.losses import segsort
from hsg_tpu.ops.pallas import nca_kernel


def _setup(n=70, g=37, c=16, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, c)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    protos = rng.normal(size=(g, c)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    pid = rng.integers(0, g, n)
    proto_sem = rng.integers(0, 5, g)
    sem = proto_sem[pid]
    pvalid = rng.random(g) > 0.25
    pxvalid = pvalid[pid]
    return (jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(pid),
            jnp.asarray(protos), jnp.asarray(proto_sem),
            jnp.asarray(pvalid), jnp.asarray(pxvalid))


def test_pallas_forward_matches_dense():
    emb, sem, pid, protos, proto_sem, pvalid, pxvalid = _setup()
    dense = segsort.segsort_log_likelihood(
        emb, sem, pid, protos, proto_sem, 11.0,
        prototype_valid=pvalid, pixel_valid=pxvalid)
    fused = nca_kernel.segsort_log_likelihood_pallas(
        emb, sem, pid, protos, proto_sem, 11.0,
        prototype_valid=pvalid, pixel_valid=pxvalid)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_pallas_gradients_match_dense():
    emb, sem, pid, protos, proto_sem, pvalid, pxvalid = _setup(seed=3)

    def dense_loss(e, p):
        nll = segsort.segsort_log_likelihood(
            e, sem, pid, p, proto_sem, 11.0,
            prototype_valid=pvalid, pixel_valid=pxvalid)
        return segsort.masked_mean(nll, pxvalid)

    def fused_loss(e, p):
        nll = nca_kernel.segsort_log_likelihood_pallas(
            e, sem, pid, p, proto_sem, 11.0,
            prototype_valid=pvalid, pixel_valid=pxvalid)
        return segsort.masked_mean(nll, pxvalid)

    ge_d, gp_d = jax.grad(dense_loss, argnums=(0, 1))(emb, protos)
    ge_f, gp_f = jax.grad(fused_loss, argnums=(0, 1))(emb, protos)
    np.testing.assert_allclose(np.asarray(ge_f), np.asarray(ge_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_d),
                               rtol=1e-4, atol=1e-6)


def test_pallas_multi_tile_shapes():
    # Cross tile boundaries in both N and G.
    emb, sem, pid, protos, proto_sem, pvalid, pxvalid = _setup(
        n=2 * nca_kernel.TN + 13, g=nca_kernel.TG + 97, c=8, seed=5)
    dense = segsort.segsort_log_likelihood(
        emb, sem, pid, protos, proto_sem, 7.0,
        prototype_valid=pvalid, pixel_valid=pxvalid)
    fused = nca_kernel.segsort_log_likelihood_pallas(
        emb, sem, pid, protos, proto_sem, 7.0,
        prototype_valid=pvalid, pixel_valid=pxvalid)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=1e-4, atol=1e-6)
