"""Optimizer with per-group LR multipliers + LR schedules.

Capability parity with the reference's custom SGD (lib/nn/optimizer.py:18-104)
and LR policies (hsg/utils/general/train.py):

  d_p = grad + weight_decay * param        (weight groups only)
  buf = momentum * buf + (multiplier * lr) * d_p
  param -= buf

The reference encodes group multipliers via `get_params_lr` tables
(resnet_fcn.py:185-222, resnet_fcn_hsg.py:339-441): backbone/head weights
x1 (with decay), biases x2 (no decay); HSG transformer-head weights x10 /
biases x20 (x1/x2 for the `_cs` variant). Here the same grouping is derived
from flax param paths, and the update is one `tree_map` — no param-group
objects.

Implemented as an optax-style pair (init_fn, update_fn) where update takes
the scalar LR each step (the reference computes the schedule in the train
loop and passes it to `step(lr)`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import traverse_util

# Module prefixes whose params get the transformer-head multipliers
# (resnet_fcn_hsg.py:375-439).
HEAD_PREFIXES = ('pos_embed', 'fine_query_embed', 'coarse_query_embed',
                 'fine_hrchy_transformer', 'coarse_hrchy_transformer')


def _is_bias(path) -> bool:
    return path[-1] == 'bias'


def _is_head(path) -> bool:
    return path[0] in HEAD_PREFIXES


def lr_multipliers(params, head_weight_mult: float = 10.0,
                   head_bias_mult: float = 20.0):
    """Per-leaf LR multiplier tree.

    head_weight_mult/head_bias_mult = 10/20 for `hsg`, 1/2 for `hsg_cs`
    (the one LR difference between resnet_fcn_hsg.py and _cs.py).
    """
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if _is_head(path):
            mult = head_bias_mult if _is_bias(path) else head_weight_mult
        else:
            mult = 2.0 if _is_bias(path) else 1.0
        out[path] = jnp.asarray(mult, dtype=jnp.float32)
    return traverse_util.unflatten_dict(out)


def weight_decay_mask(params):
    """True for leaves that receive weight decay (everything except biases,
    mirroring the reference's `weight_decay=0` bias groups)."""
    flat = traverse_util.flatten_dict(params)
    out = {path: not _is_bias(path) for path in flat}
    return traverse_util.unflatten_dict(out)


class SGDState(NamedTuple):
    momentum: Any  # per-LR-group flat momentum buffers (tuple), or a tree


def _group_plan(params, multipliers, decay_mask):
    """Groups param leaves by their (lr multiplier, decays?) values.

    The per-leaf tree_map update emits ~3 tiny ops per parameter tensor
    (~474 for ResNet-50+HSG); at ~30 us TPU launch overhead each that is
    ~15 ms/step — 20% of the stage-1 step (round-2 VERDICT weak #1,
    profiled in tools/analyze_profile.py). Since the update rule differs
    between leaves ONLY through the scalar (multiplier, weight-decay)
    pair, leaves sharing the pair concatenate into one flat vector and
    update in a single fused op — numerically identical (elementwise math
    over the same values), launch count drops from ~474 to ~4.

    Returns [((mult, use_wd), [leaf indices])] in deterministic order.
    """
    n = len(jax.tree_util.tree_leaves(params))
    m_leaves = (jax.tree_util.tree_leaves(multipliers)
                if multipliers is not None else [1.0] * n)
    k_leaves = (jax.tree_util.tree_leaves(decay_mask)
                if decay_mask is not None else [True] * n)
    groups = {}
    for i, (m, k) in enumerate(zip(m_leaves, k_leaves)):
        groups.setdefault((float(m), bool(k)), []).append(i)
    return sorted(groups.items())


def _group_dtype(leaves, idxs):
    """>= f32 accumulator dtype for a group (f64 params stay f64 so the
    float64 sharded-equality gate does not round updates through f32)."""
    return jnp.promote_types(
        jnp.float32, jnp.result_type(*[leaves[i].dtype for i in idxs]))


def _concat_group(leaves, idxs, dtype=jnp.float32):
    return jnp.concatenate(
        [leaves[i].reshape(-1).astype(dtype) for i in idxs])


def _split_group(flat, leaves, idxs, out, scale=-1.0):
    off = 0
    for i in idxs:
        sz = leaves[i].size
        out[i] = (scale * flat[off:off + sz]).reshape(leaves[i].shape)
        off += sz


def sgd(momentum: float = 0.9, weight_decay: float = 0.0,
        multipliers=None, decay_mask=None, fused: bool = True):
    """Reference-semantic SGD; `update_fn(grads, state, params, lr)`.

    `fused=True` (default) stores momentum as one flat buffer per LR
    group (see `_group_plan`); `fused=False` keeps the per-leaf tree
    layout (same numbers, ~15 ms/step slower at stage-1 scale).
    """

    def init_fn(params):
        if not fused:
            return SGDState(momentum=jax.tree_util.tree_map(
                jnp.zeros_like, params))
        plan = _group_plan(params, multipliers, decay_mask)
        leaves = jax.tree_util.tree_leaves(params)
        return SGDState(momentum=tuple(
            jnp.zeros(sum(leaves[i].size for i in idxs),
                      _group_dtype(leaves, idxs))
            for _, idxs in plan))

    def update_fn(grads, state, params, lr):
        if fused:
            plan = _group_plan(params, multipliers, decay_mask)
            g_leaves, tdef = jax.tree_util.tree_flatten(grads)
            p_leaves = jax.tree_util.tree_leaves(params)
            upd_leaves = [None] * len(g_leaves)
            new_bufs = []
            for gi, ((mult, use_wd), idxs) in enumerate(plan):
                dt = _group_dtype(p_leaves, idxs)
                g = _concat_group(g_leaves, idxs, dt)
                if weight_decay and use_wd:
                    g = g + weight_decay * _concat_group(p_leaves, idxs, dt)
                buf = momentum * state.momentum[gi] + (mult * lr) * g
                new_bufs.append(buf)
                _split_group(buf, g_leaves, idxs, upd_leaves)
            return (jax.tree_util.tree_unflatten(tdef, upd_leaves),
                    SGDState(momentum=tuple(new_bufs)))

        mults = multipliers
        if mults is None:
            mults = jax.tree_util.tree_map(lambda _: 1.0, params)
        mask = decay_mask
        if mask is None:
            mask = jax.tree_util.tree_map(lambda _: True, params)

        def upd(g, buf, p, m, use_wd):
            g = g.astype(jnp.promote_types(jnp.float32, p.dtype))
            if weight_decay:
                g = g + jnp.where(use_wd, weight_decay, 0.0) * p
            buf = momentum * buf + (m * lr) * g
            return buf

        new_buf = jax.tree_util.tree_map(upd, grads, state.momentum, params,
                                         mults, mask)
        updates = jax.tree_util.tree_map(lambda b: -b, new_buf)
        return updates, SGDState(momentum=new_buf)

    return init_fn, update_fn


class AdamState(NamedTuple):
    step: Any
    exp_avg: Any
    exp_avg_sq: Any


def adam(betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0,
         multipliers=None, decay_mask=None):
    """Reference-semantic Adam (lib/nn/optimizer.py:107-179):

      g   = grad + wd * p
      m   = b1 m + (1 - b1) g ; v = b2 v + (1 - b2) g^2
      p  -= lr * mult * sqrt(1 - b2^t) / (1 - b1^t) * m / (sqrt(v) + eps)

    `update_fn(grads, state, params, lr)`, matching the SGD pair.
    """
    b1, b2 = betas

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(step=jnp.zeros((), jnp.int32), exp_avg=zeros,
                         exp_avg_sq=jax.tree_util.tree_map(
                             jnp.zeros_like, params))

    def update_fn(grads, state, params, lr):
        mults = multipliers
        if mults is None:
            mults = jax.tree_util.tree_map(lambda _: 1.0, params)
        mask = decay_mask
        if mask is None:
            mask = jax.tree_util.tree_map(lambda _: True, params)
        step = state.step + 1
        bc1 = 1.0 - b1 ** step.astype(jnp.float32)
        bc2 = 1.0 - b2 ** step.astype(jnp.float32)

        def decayed(g, p, use_wd):
            g = g.astype(jnp.float32)
            if weight_decay:
                g = g + jnp.where(use_wd, weight_decay, 0.0) * p
            return g

        g_wd = jax.tree_util.tree_map(decayed, grads, params, mask)
        new_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, g_wd)
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, g_wd)

        def upd(m, v, mult):
            step_size = lr * mult * jnp.sqrt(bc2) / bc1
            return -step_size * m / (jnp.sqrt(v) + eps)

        updates = jax.tree_util.tree_map(upd, new_m, new_v, mults)
        return updates, AdamState(step=step, exp_avg=new_m, exp_avg_sq=new_v)

    return init_fn, update_fn


def clip_grad(grads, clip_val: float):
    """Element-wise gradient clamp, parity with lib/nn/optimizer.py:182."""
    return jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -clip_val, clip_val), grads)


# ---------------------------------------------------------------------------
# LR schedules (parity with hsg/utils/general/train.py).


def lr_poly(base_lr, curr_iter, max_iter, warmup_iter=0, power=0.9):
    """Polynomial decay with linear warmup from base_lr/10."""
    curr = jnp.asarray(curr_iter, jnp.float32)
    decay = base_lr * (1.0 - curr / max_iter) ** power
    if warmup_iter > 0:
        alpha = curr / warmup_iter
        warm = jnp.minimum(
            base_lr * (0.1 * (1 - alpha) + alpha), decay)
        return jnp.where(curr < warmup_iter, warm, decay)
    return decay


def lr_step(base_lr, curr_iter, decay_iters, warmup_iter=0):
    """Stepwise 10x decay at each milestone, with linear warmup."""
    curr = jnp.asarray(curr_iter, jnp.float32)
    step_idx = jnp.zeros((), jnp.float32)
    for it in decay_iters:
        step_idx = step_idx + (curr >= it)
    decayed = base_lr * (0.1 ** step_idx)
    if warmup_iter > 0:
        alpha = curr / warmup_iter
        warm = base_lr * (0.1 * (1 - alpha) + alpha)
        return jnp.where(curr < warmup_iter, warm, decayed)
    return decayed


def schedule_from_config(config):
    """Builds iteration -> lr, mirroring pyscripts/train/train.py:311-322
    (the 'step' policy derives milestones at 32% / 56% / 75% of training)."""
    t = config.train
    if t.lr_policy == 'step':
        decay_iters = [int(r * t.max_iteration) for r in (0.32, 0.56, 0.75)]
        return lambda it: lr_step(t.base_lr, it, decay_iters,
                                  t.warmup_iteration)
    return lambda it: lr_poly(t.base_lr, it, t.max_iteration,
                              t.warmup_iteration)
