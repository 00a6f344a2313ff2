"""Spherical k-means EM steps as Pallas TPU kernels (alternative impl).

Measured verdict (v5e, 1M px, K=288, C=130, 10 iterations): the XLA path
in hsg_tpu/ops/kmeans.py runs 10 EM iterations in ~48 ms while these
kernels take ~114 ms — XLA's generator fusion already folds the one-hot /
similarity `[P, K]` intermediates into the matmuls, so there is no HBM
traffic left to save and the hand-tiled version only loses MXU pipelining.
The XLA path therefore stays the default everywhere; these kernels are
retained as the validated starting point for future per-shape tuning
(they agree with XLA exactly; see tests/test_kmeans_pallas.py).

Labels are stop-gradient in the reference too (segsort/common.py:369-373),
so no custom VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hsg_tpu.ops import common

TP = 512   # pixel tile


def _use_interpret():
    return jax.default_backend() != 'tpu'


def _pad_axis(x, multiple, axis, fill):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=fill)


def _pool_kernel(k, e_ref, lab_ref, w_ref, out_ref):
    """Accumulates per-cluster sums over pixel tiles (M-step numerator)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    labels = lab_ref[...]                                  # [T, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # [1, K]
    onehot = (labels == cols).astype(jnp.float32)          # [T, K]
    onehot = onehot * w_ref[...]                           # weights [T, 1]
    out_ref[...] += jax.lax.dot_general(
        onehot, e_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _assign_kernel(e_ref, p_ref, lab_ref):
    """Cosine argmax assignment for one pixel tile (E-step)."""
    sims = jax.lax.dot_general(
        e_ref[...], p_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [T, K]
    lab_ref[...] = jnp.argmax(sims, axis=1,
                              keepdims=True).astype(jnp.int32)


def pooled_prototype_sums(embeddings: jnp.ndarray,
                          labels: jnp.ndarray,
                          num_clusters: int,
                          weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-cluster embedding sums `[K, C]` (un-normalized M-step)."""
    n, c = embeddings.shape
    e = _pad_axis(embeddings.astype(jnp.float32), TP, 0, 0.0)
    lab = _pad_axis(labels.astype(jnp.int32), TP, 0, -1)[:, None]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    w = _pad_axis(weights.astype(jnp.float32), TP, 0, 0.0)[:, None]
    npad = e.shape[0]
    grid = (npad // TP,)
    return pl.pallas_call(
        functools.partial(_pool_kernel, num_clusters),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, c), lambda i: (i, 0)),
            pl.BlockSpec((TP, 1), lambda i: (i, 0)),
            pl.BlockSpec((TP, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((num_clusters, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_clusters, c), jnp.float32),
        interpret=_use_interpret(),
    )(e, lab, w)


def assign_nearest(embeddings: jnp.ndarray,
                   prototypes: jnp.ndarray) -> jnp.ndarray:
    """Cosine argmax labels `[N]` without an HBM `[N, K]` intermediate."""
    n, c = embeddings.shape
    k = prototypes.shape[0]
    e = _pad_axis(embeddings.astype(jnp.float32), TP, 0, 0.0)
    npad = e.shape[0]
    labels = pl.pallas_call(
        _assign_kernel,
        grid=(npad // TP,),
        in_specs=[
            pl.BlockSpec((TP, c), lambda i: (i, 0)),
            pl.BlockSpec((k, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TP, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        interpret=_use_interpret(),
    )(e, prototypes.astype(jnp.float32))
    return labels[:n, 0]


def kmeans_with_initial_labels_pallas(embeddings: jnp.ndarray,
                                      initial_labels: jnp.ndarray,
                                      max_label: int,
                                      iterations: int = 10,
                                      valid: jnp.ndarray | None = None
                                      ) -> jnp.ndarray:
    """Drop-in fused equivalent of `kmeans.kmeans_with_initial_labels`."""
    weights = None if valid is None else valid.astype(jnp.float32)

    def body(_, labels):
        sums = pooled_prototype_sums(embeddings, labels, max_label, weights)
        protos = common.normalize_embedding(sums)
        return assign_nearest(embeddings, protos)

    labels = jax.lax.fori_loop(0, iterations, body,
                               initial_labels.astype(jnp.int32))
    return jax.lax.stop_gradient(labels)
