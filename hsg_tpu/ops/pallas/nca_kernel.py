"""Fused SegSort NCA reductions as a Pallas TPU kernel (+ custom VJP).

The hot loss of the framework (SURVEY.md §3.1 hot spot (c)): for every
pixel, reductions over ALL global prototypes of exp(kappa e.p) with
same/different-semantic masks. The XLA chunked-scan version
(hsg_tpu/losses/nca_chunked.py) avoids materializing [N, G] in HBM but
still round-trips each [N, chunk] logits tile; this kernel keeps every
[TN, TG] tile in VMEM — one HBM pass over E and P per reduction, which is
the bandwidth speed-of-light for this op.

Forward outputs (padded slots excluded via `proto_ok`):
  S_i = sum_{g: sem_g == sem_i} x_ig,   D_i = sum_{g: sem_g != sem_i} x_ig,
  F_i = x_{i, pid_i},   where x_ig = exp(kappa * e_i . p_g) * ok_g.

Backward (custom VJP, recompute-based): with upstream (gs, gd, gf),
  W_ig = gs_i * same_ig + gd_i * diff_ig + gf_i * [g == pid_i]
  dE = kappa (W * X) P,   dP = kappa (W * X)^T E
computed by two accumulation kernels with the same tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TN = 256   # pixel tile (sublane-friendly)
TG = 512   # prototype tile (lane-friendly)


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


def _masks(sem_tile, psem_tile, ok_tile):
    same = (sem_tile == psem_tile) & ok_tile
    diff = (sem_tile != psem_tile) & ok_tile
    return same, diff


def _fwd_kernel(conc, mxu_dtype, e_ref, sem_ref, pid_ref, p_ref, psem_ref,
                pok_ref, same_ref, diff_ref, self_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        same_ref[...] = jnp.zeros_like(same_ref)
        diff_ref[...] = jnp.zeros_like(diff_ref)
        self_ref[...] = jnp.zeros_like(self_ref)

    logits = jax.lax.dot_general(
        e_ref[...].astype(mxu_dtype), p_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ok = pok_ref[...] != 0                                   # [1, TG]
    x = jnp.exp(logits * conc) * ok.astype(jnp.float32)
    same, diff = _masks(sem_ref[...], psem_ref[...], ok)     # [TN, TG]
    same_ref[...] += jnp.sum(jnp.where(same, x, 0.0), axis=1, keepdims=True)
    diff_ref[...] += jnp.sum(jnp.where(diff, x, 0.0), axis=1, keepdims=True)
    col = (j * TG
           + jax.lax.broadcasted_iota(jnp.int32, (1, TG), 1))  # [1, TG]
    is_self = pid_ref[...] == col
    self_ref[...] += jnp.sum(jnp.where(is_self, x, 0.0), axis=1,
                             keepdims=True)


def _bwd_de_kernel(conc, mxu_dtype, gs_ref, gd_ref, gf_ref, e_ref, sem_ref,
                   pid_ref, p_ref, psem_ref, pok_ref, de_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        de_ref[...] = jnp.zeros_like(de_ref)

    logits = jax.lax.dot_general(
        e_ref[...].astype(mxu_dtype), p_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ok = pok_ref[...] != 0
    x = jnp.exp(logits * conc) * ok.astype(jnp.float32)
    same, diff = _masks(sem_ref[...], psem_ref[...], ok)
    col = j * TG + jax.lax.broadcasted_iota(jnp.int32, (1, TG), 1)
    is_self = pid_ref[...] == col
    w = (gs_ref[...] * same.astype(jnp.float32)
         + gd_ref[...] * diff.astype(jnp.float32)
         + gf_ref[...] * is_self.astype(jnp.float32))
    wx = w * x
    de_ref[...] += conc * jax.lax.dot_general(
        wx.astype(mxu_dtype), p_ref[...].astype(mxu_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_dp_kernel(conc, mxu_dtype, gs_ref, gd_ref, gf_ref, e_ref, sem_ref,
                   pid_ref, p_ref, psem_ref, pok_ref, dp_ref):
    i = pl.program_id(1)   # pixel tiles inner (accumulated)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dp_ref[...] = jnp.zeros_like(dp_ref)

    logits = jax.lax.dot_general(
        e_ref[...].astype(mxu_dtype), p_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ok = pok_ref[...] != 0
    x = jnp.exp(logits * conc) * ok.astype(jnp.float32)
    same, diff = _masks(sem_ref[...], psem_ref[...], ok)
    col = j * TG + jax.lax.broadcasted_iota(jnp.int32, (1, TG), 1)
    is_self = pid_ref[...] == col
    w = (gs_ref[...] * same.astype(jnp.float32)
         + gd_ref[...] * diff.astype(jnp.float32)
         + gf_ref[...] * is_self.astype(jnp.float32))
    wx = w * x                                               # [TN, TG]
    dp_ref[...] += conc * jax.lax.dot_general(
        wx.astype(mxu_dtype), e_ref[...].astype(mxu_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _prepare(embeddings, semantic_labels, prototype_ids, prototypes,
             prototype_semantic_labels, prototype_valid):
    n, c = embeddings.shape
    g = prototypes.shape[0]
    e = _pad_axis(embeddings.astype(jnp.float32), TN, 0, 0.0)
    sem = _pad_axis(semantic_labels.astype(jnp.int32), TN, 0,
                    jnp.iinfo(jnp.int32).min)[:, None]
    pid = _pad_axis(prototype_ids.astype(jnp.int32), TN, 0, -1)[:, None]
    p = _pad_axis(prototypes.astype(jnp.float32), TG, 0, 0.0)
    psem = _pad_axis(prototype_semantic_labels.astype(jnp.int32), TG, 0,
                     jnp.iinfo(jnp.int32).min + 1)[None, :]
    if prototype_valid is None:
        prototype_valid = jnp.ones((g,), bool)
    pok = _pad_axis(prototype_valid.astype(jnp.int32), TG, 0, 0)[None, :]
    return e, sem, pid, p, psem, pok, n, g


def _grid_specs(npad, gpad, c):
    gi, gj = npad // TN, gpad // TG
    in_specs = [
        pl.BlockSpec((TN, c), lambda i, j: (i, 0)),          # e
        pl.BlockSpec((TN, 1), lambda i, j: (i, 0)),          # sem
        pl.BlockSpec((TN, 1), lambda i, j: (i, 0)),          # pid
        pl.BlockSpec((TG, c), lambda i, j: (j, 0)),          # p
        pl.BlockSpec((1, TG), lambda i, j: (0, j)),          # psem
        pl.BlockSpec((1, TG), lambda i, j: (0, j)),          # pok
    ]
    return (gi, gj), in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def nca_sums_pallas(embeddings, semantic_labels, prototype_ids, prototypes,
                    prototype_semantic_labels, prototype_valid,
                    concentration, compute_dtype='float32'):
    """Returns (same_sum, diff_sum, self_sim), each `[N]` float32.

    compute_dtype 'bfloat16' runs the MXU contractions in bf16 (f32
    accumulation) for ~2x matmul throughput; logits of unit-norm inputs
    pick up ~3e-3 absolute error, scaled by the concentration inside the
    exp — acceptable training noise, off by default."""
    return _forward(embeddings, semantic_labels, prototype_ids, prototypes,
                    prototype_semantic_labels, prototype_valid,
                    concentration, compute_dtype)


def _forward(embeddings, semantic_labels, prototype_ids, prototypes,
             prototype_semantic_labels, prototype_valid, concentration,
             compute_dtype='float32'):
    e, sem, pid, p, psem, pok, n, g = _prepare(
        embeddings, semantic_labels, prototype_ids, prototypes,
        prototype_semantic_labels, prototype_valid)
    npad, c = e.shape
    gpad = p.shape[0]
    grid, in_specs = _grid_specs(npad, gpad, c)
    out_spec = pl.BlockSpec((TN, 1), lambda i, j: (i, 0))
    out_shape = jax.ShapeDtypeStruct((npad, 1), jnp.float32)
    mxu_dtype = jnp.dtype(compute_dtype)
    same, diff, self_sim = pl.pallas_call(
        functools.partial(_fwd_kernel, concentration, mxu_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_use_interpret(),
    )(e, sem, pid, p, psem, pok)
    return same[:n, 0], diff[:n, 0], self_sim[:n, 0]


def _fwd_rule(embeddings, semantic_labels, prototype_ids, prototypes,
              prototype_semantic_labels, prototype_valid, concentration,
              compute_dtype='float32'):
    out = _forward(embeddings, semantic_labels, prototype_ids, prototypes,
                   prototype_semantic_labels, prototype_valid, concentration,
                   compute_dtype)
    res = (embeddings, semantic_labels, prototype_ids, prototypes,
           prototype_semantic_labels, prototype_valid)
    return out, res


def _bwd_rule(concentration, compute_dtype, res, grads):
    (embeddings, semantic_labels, prototype_ids, prototypes,
     prototype_semantic_labels, prototype_valid) = res
    gs, gd, gf = grads
    e, sem, pid, p, psem, pok, n, g = _prepare(
        embeddings, semantic_labels, prototype_ids, prototypes,
        prototype_semantic_labels, prototype_valid)
    npad, c = e.shape
    gpad = p.shape[0]
    gs = _pad_axis(gs.astype(jnp.float32), TN, 0, 0.0)[:, None]
    gd = _pad_axis(gd.astype(jnp.float32), TN, 0, 0.0)[:, None]
    gf = _pad_axis(gf.astype(jnp.float32), TN, 0, 0.0)[:, None]

    mxu_dtype = jnp.dtype(compute_dtype)
    grid, in_specs = _grid_specs(npad, gpad, c)
    g_spec = pl.BlockSpec((TN, 1), lambda i, j: (i, 0))
    de = pl.pallas_call(
        functools.partial(_bwd_de_kernel, concentration, mxu_dtype),
        grid=grid,
        in_specs=[g_spec, g_spec, g_spec] + in_specs,
        out_specs=pl.BlockSpec((TN, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, c), jnp.float32),
        interpret=_use_interpret(),
    )(gs, gd, gf, e, sem, pid, p, psem, pok)

    # dP: grid transposed so pixel tiles accumulate innermost.
    gj, gi = gpad // TG, npad // TN
    in_specs_t = [
        pl.BlockSpec((TN, 1), lambda j, i: (i, 0)),          # gs
        pl.BlockSpec((TN, 1), lambda j, i: (i, 0)),          # gd
        pl.BlockSpec((TN, 1), lambda j, i: (i, 0)),          # gf
        pl.BlockSpec((TN, c), lambda j, i: (i, 0)),          # e
        pl.BlockSpec((TN, 1), lambda j, i: (i, 0)),          # sem
        pl.BlockSpec((TN, 1), lambda j, i: (i, 0)),          # pid
        pl.BlockSpec((TG, c), lambda j, i: (j, 0)),          # p
        pl.BlockSpec((1, TG), lambda j, i: (0, j)),          # psem
        pl.BlockSpec((1, TG), lambda j, i: (0, j)),          # pok
    ]
    dp = pl.pallas_call(
        functools.partial(_bwd_dp_kernel, concentration, mxu_dtype),
        grid=(gj, gi),
        in_specs=in_specs_t,
        out_specs=pl.BlockSpec((TG, c), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((gpad, c), jnp.float32),
        interpret=_use_interpret(),
    )(gs, gd, gf, e, sem, pid, p, psem, pok)

    return (de[:n], None, None, dp[:g], None, None)


nca_sums_pallas.defvjp(_fwd_rule, _bwd_rule)


def segsort_log_likelihood_pallas(embeddings, semantic_labels,
                                  prototype_ids, prototypes,
                                  prototype_semantic_labels,
                                  concentration,
                                  group_mode: str = 'segsort+',
                                  prototype_valid=None,
                                  pixel_valid=None,
                                  compute_dtype: str = 'float32'
                                  ) -> jnp.ndarray:
    """Drop-in fused equivalent of `segsort.segsort_log_likelihood`."""
    same_sum, diff_sum, self_sim = nca_sums_pallas(
        embeddings, semantic_labels, prototype_ids, prototypes,
        prototype_semantic_labels, prototype_valid, float(concentration),
        compute_dtype)
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
