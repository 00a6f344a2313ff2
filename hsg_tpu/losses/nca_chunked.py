"""Memory-bounded SegSort NCA: chunked-scan reductions.

At production scale the reference's `[num_pixels, num_prototypes]`
similarity matrix (loss.py:49-51) does not fit on chip (stage-1 COCO:
~50k pixels x ~32k padded prototype slots ~ 6.6 GB in f32). This module
computes the three NCA reductions

  S_i = sum over same-semantic prototypes of exp(kappa e_i . p_g)
  D_i = sum over diff-semantic prototypes
  F_i = exp(kappa e_i . p_{pid(i)})          (self similarity)

by scanning over prototype chunks with `jax.checkpoint` on the chunk body,
so the backward pass recomputes each `[N, chunk]` tile instead of storing
it. Peak memory is O(N * chunk); compute stays on the MXU.

`segsort_log_likelihood_chunked` reproduces
`hsg_tpu.losses.segsort.segsort_log_likelihood` exactly (same epilogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_to_multiple(x, multiple, axis, fill=0):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=fill)


def nca_sums_chunked(embeddings: jnp.ndarray,
                     semantic_labels: jnp.ndarray,
                     prototype_ids: jnp.ndarray,
                     prototypes: jnp.ndarray,
                     prototype_semantic_labels: jnp.ndarray,
                     concentration: float,
                     prototype_valid: jnp.ndarray | None = None,
                     chunk: int = 4096):
    """Returns (same_sum `[N]`, diff_sum `[N]`, self_sim `[N]`)."""
    n, c = embeddings.shape
    g = prototypes.shape[0]
    if prototype_valid is None:
        prototype_valid = jnp.ones((g,), bool)

    protos = _pad_to_multiple(prototypes, chunk, 0)
    proto_sem = _pad_to_multiple(prototype_semantic_labels, chunk, 0,
                                 fill=jnp.iinfo(jnp.int32).min)
    proto_ok = _pad_to_multiple(prototype_valid, chunk, 0, fill=False)
    num_chunks = protos.shape[0] // chunk
    protos = protos.reshape(num_chunks, chunk, c)
    proto_sem = proto_sem.reshape(num_chunks, chunk)
    proto_ok = proto_ok.reshape(num_chunks, chunk)

    @jax.checkpoint
    def body(carry, xs):
        same_acc, diff_acc, self_acc = carry
        p_chunk, sem_chunk, ok_chunk, base = xs
        logits = jax.lax.dot_general(
            embeddings, p_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = jnp.exp(logits * concentration)
        x = x * ok_chunk[None, :].astype(x.dtype)
        same = jnp.equal(semantic_labels[:, None], sem_chunk[None, :])
        same = same & ok_chunk[None, :]
        diff = (~jnp.equal(semantic_labels[:, None], sem_chunk[None, :])
                & ok_chunk[None, :])
        same_acc = same_acc + jnp.sum(jnp.where(same, x, 0.0), axis=1)
        diff_acc = diff_acc + jnp.sum(jnp.where(diff, x, 0.0), axis=1)
        # Self similarity: pid falls into this chunk.
        local = prototype_ids - base
        in_chunk = (local >= 0) & (local < chunk)
        picked = jnp.take_along_axis(
            x, jnp.clip(local, 0, chunk - 1)[:, None], axis=1)[:, 0]
        self_acc = self_acc + jnp.where(in_chunk, picked, 0.0)
        return (same_acc, diff_acc, self_acc), None

    init = (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    bases = jnp.arange(num_chunks) * chunk
    (same_sum, diff_sum, self_sim), _ = jax.lax.scan(
        body, init, (protos, proto_sem, proto_ok, bases))
    return same_sum, diff_sum, self_sim


def segsort_log_likelihood_chunked(embeddings, semantic_labels,
                                   prototype_ids, prototypes,
                                   prototype_semantic_labels,
                                   concentration,
                                   group_mode: str = 'segsort+',
                                   prototype_valid=None,
                                   pixel_valid=None,
                                   chunk: int = 4096) -> jnp.ndarray:
    """Drop-in chunked equivalent of `segsort.segsort_log_likelihood`."""
    same_sum, diff_sum, self_sim = nca_sums_chunked(
        embeddings, semantic_labels, prototype_ids, prototypes,
        prototype_semantic_labels, concentration, prototype_valid, chunk)
    if group_mode == 'segsort+':
        same_minus_self = same_sum - self_sim
        numerator = jnp.where(same_minus_self > 0, same_minus_self, self_sim)
    elif group_mode == 'segsort':
        numerator = self_sim
    else:
        raise ValueError(group_mode)
    denominator = diff_sum + numerator
    if pixel_valid is not None:
        numerator = jnp.where(pixel_valid, numerator, 1.0)
        denominator = jnp.where(pixel_valid, denominator, 1.0)
    return -jnp.log(numerator / denominator)
