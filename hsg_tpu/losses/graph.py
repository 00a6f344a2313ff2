"""Graph-clustering losses (DMoN, hierarchical DMoN, NCut) + affinity.

Capability parity with reference `hsg/utils/graph/{common,loss}.py`,
re-designed for TPU: the per-batch/per-segment K-NN sparsification Python
loop (graph/common.py:99-119) becomes a masked batched top-k with a static
group count; everything else is batched einsums over `[B, N, N]` tensors.
All tensors here use node-last-but-one layout `[B, N, C]` / `[B, N, K]`
(the reference uses `[B, C, N]` and transposes internally).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-15


def inner_product_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix over nodes: `[B, N, C] -> [B, N, N]`.

    Parity with reference `inner_product_kernel` (graph/common.py:8).
    """
    return jnp.einsum(
        'bnc,bmc->bnm', x, x,
        preferred_element_type=jnp.promote_types(jnp.float32, x.dtype))


def exp_inner_product_kernel(x: jnp.ndarray, concentration: float = 5.0) -> jnp.ndarray:
    """exp(kappa * gram). Parity with graph/common.py:23."""
    return jnp.exp(inner_product_kernel(x) * concentration)


def _knn_sparsify(affinity: jnp.ndarray,
                  node_valid: jnp.ndarray,
                  group_ids: jnp.ndarray,
                  num_groups: int,
                  knn: int) -> jnp.ndarray:
    """Keep only each row's top-`knn` entries within every column group.

    Dense equivalent of the reference's per-segment K-NN loop
    (graph/common.py:96-119): for each group g of columns, entries strictly
    below the row's k-th largest value in that group are zeroed (k is
    clamped to the group's valid size, so ties at the threshold survive,
    matching `A < kth_val`).

    Args:
      affinity: `[B, N, N]`.
      node_valid: `[B, N]` bool.
      group_ids: `[B, N]` int in [0, num_groups).
      num_groups: static number of groups G.
      knn: static K.
    """
    b, n, _ = affinity.shape

    def per_group(g):
        col_mask = node_valid & (group_ids == g)          # [B, N]
        count = jnp.sum(col_mask, axis=1)                  # [B]
        k_eff = jnp.minimum(count, knn)                    # [B]
        masked = jnp.where(col_mask[:, None, :], affinity, -jnp.inf)
        top_vals, _ = jax.lax.top_k(masked, knn)           # [B, N, knn]
        idx = jnp.maximum(k_eff - 1, 0)                    # [B]
        kth = jnp.take_along_axis(
            top_vals, idx[:, None, None].repeat(n, axis=1), axis=2)[..., 0]
        keep_all = (count == 0) | (count <= knn)           # nothing to prune
        below = affinity < kth[:, :, None]
        prune = col_mask[:, None, :] & below & ~keep_all[:, None, None]
        return prune

    prune_any = jnp.zeros(affinity.shape, dtype=bool)
    for g in range(num_groups):
        prune_any = prune_any | per_group(g)
    return jnp.where(prune_any, 0.0, affinity)


def affinity_matrix_as_attention(x: jnp.ndarray,
                                 node_valid: jnp.ndarray | None = None,
                                 group_ids: jnp.ndarray | None = None,
                                 num_groups: int = 1,
                                 knn: int | None = None,
                                 remove_self_loop: bool = True,
                                 binarize: bool = True,
                                 kernel_fn=exp_inner_product_kernel) -> jnp.ndarray:
    """Builds the (optionally K-NN-sparsified, binarized) affinity graph.

    Parity with reference `affinity_matrix_as_attention`
    (graph/common.py:39-125) with `[B, N, C]` node layout and masks instead
    of ragged iteration.
    """
    b, n, _ = x.shape
    a = kernel_fn(x)

    if node_valid is None:
        node_valid = jnp.ones((b, n), dtype=bool)
    pair_valid = node_valid[:, :, None] & node_valid[:, None, :]
    a = jnp.where(pair_valid, a, 0.0)

    if remove_self_loop:
        num_valid = jnp.sum(node_valid, axis=1)
        do_remove = (num_valid > 1)[:, None, None]
        eye = jnp.eye(n, dtype=bool)[None]
        a = jnp.where(eye & do_remove, 0.0, a)

    if knn is not None:
        if group_ids is None:
            group_ids = jnp.zeros((b, n), dtype=jnp.int32)
            num_groups = 1
        a = _knn_sparsify(a, node_valid, group_ids, num_groups, knn)

    if binarize:
        a = (a > 0).astype(jnp.float32)

    return a


def dmon_pool_loss(adj: jnp.ndarray,
                   s: jnp.ndarray,
                   mask: jnp.ndarray | None = None,
                   softmax: bool = False):
    """DMoN modularity + collapse losses.

    Parity with reference `dmon_pool_loss` (graph/loss.py:27-88):
      dmon     = mean_b [1 - Tr(S^T A S - S^T d d^T S / 2m) / 2m]
      collapse = mean_b [ ||sum_n S||_2 * sqrt(k) / n ]
    (`n` is the static padded node count, as in the reference.)

    Args:
      adj: `[B, N, N]` affinity.
      s: `[B, N, K]` cluster assignment probabilities (softmax already
        applied by callers unless `softmax=True`).
      mask: `[B, N]` bool validity of nodes.
    """
    b, n, k = s.shape
    if softmax:
        s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        s = s * mask[:, :, None].astype(s.dtype)

    sas = jnp.einsum('bnk,bnm,bml->bkl', s, adj, s)          # S^T A S
    d = jnp.sum(adj, axis=2)                                  # [B, N] degrees
    ds = jnp.einsum('bn,bnk->bk', d, s)                       # d^T S
    two_m = 2.0 * jnp.sum(d, axis=1)                          # [B]
    two_m_safe = jnp.maximum(two_m, EPS)
    # Tr(S^T d d^T S) = ||d^T S||^2
    trace_sas = jnp.trace(sas, axis1=1, axis2=2)
    trace_deg = jnp.sum(ds * ds, axis=1)
    numerator = trace_sas - trace_deg / two_m_safe
    dmon = jnp.mean(1.0 - numerator / two_m_safe)

    collapse_num = jnp.linalg.norm(jnp.sum(s, axis=1), axis=1)  # [B]
    collapse = jnp.mean(collapse_num * math.sqrt(k) / n)
    return dmon, collapse


class DMonLoss:
    """Callable parity with reference `DMonLoss` (graph/loss.py:91-145).

    forward(s, x, node_valid, group_ids): builds the exp(5*gram) K-NN
    binarized affinity over the node features x and evaluates DMoN +
    collapse on assignment probabilities s.

    Args (call):
      s: `[B, N, K]` assignment probabilities.
      x: `[B, N, C]` node features (unit-norm prototypes).
      node_valid: `[B, N]` bool (True = real node).
      group_ids: `[B, N]` int dense group ids for per-segment K-NN
        restriction (or None for a single group).
      num_groups: static group count.
    """

    def __init__(self, adj_knn=None):
        self._knn = adj_knn

    def __repr__(self):
        return f'DMonLoss(adj_knn={self._knn})'

    def __call__(self, s, x, node_valid=None, group_ids=None, num_groups=1):
        kernel = lambda v: exp_inner_product_kernel(v, 5.0)
        adj = affinity_matrix_as_attention(
            x, node_valid, group_ids, num_groups, self._knn,
            remove_self_loop=True, binarize=True, kernel_fn=kernel)
        return dmon_pool_loss(adj, s, node_valid)


class HierarchicalDMonLoss:
    """Parity with reference `HierarchicalDMonLoss` (graph/loss.py:148-231).

    Chains DMoN across levels by pooling the affinity with the previous
    level's assignment probabilities. Dormant in the shipped recipes but
    part of the public API surface.
    """

    def __init__(self, adj_knn=None):
        self._knn = adj_knn

    def __repr__(self):
        return f'HierarchicalDMonLoss(adj_knn={self._knn})'

    def __call__(self, probs_list, x, node_valid_list=None, group_ids=None,
                 num_groups=1):
        """probs_list: list of `[B, N_l, K_l]` per level (N_0 = N).
        node_valid_list: list of `[B, N_l]` masks per level.
        """
        kernel = lambda v: exp_inner_product_kernel(v, 5.0)
        valid0 = None if not node_valid_list else node_valid_list[0]
        adj = affinity_matrix_as_attention(
            x, valid0, group_ids, num_groups, self._knn,
            remove_self_loop=True, binarize=True, kernel_fn=kernel)

        dmon_losses, collapse_losses = [], []
        prev_probs = None
        prev_valid = None
        for level, probs in enumerate(probs_list):
            valid = None if not node_valid_list else node_valid_list[level]
            if prev_probs is not None:
                p = prev_probs
                if prev_valid is not None:
                    p = p * prev_valid[:, :, None].astype(p.dtype)
                # Pool: A' = P^T A P  (P: [B, N_prev, K_prev])
                adj = jnp.einsum('bnk,bnm,bml->bkl', p, adj, p)
            dmon, collapse = dmon_pool_loss(adj, probs, valid, softmax=False)
            dmon_losses.append(dmon)
            collapse_losses.append(collapse)
            prev_probs = probs
            prev_valid = valid
        return dmon_losses, collapse_losses


def ncut_pool_loss(adj: jnp.ndarray,
                   s: jnp.ndarray,
                   mask: jnp.ndarray | None = None):
    """Normalized-cut pooling loss + entropy regularizer.

    Parity with reference `ncut_pool_loss` (graph/loss.py:234-288):
      ncut = mean_b sum_k [S_k^T A (1-S_k)] / [d^T S_k + 1e-2]
      self = mean over (b, k) of sum_n entropy(S)
    Softmax is applied inside (matching the reference).
    """
    b, n, k = s.shape
    s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        s = s * mask[:, :, None].astype(s.dtype)

    cut = jnp.einsum('bnk,bnm,bmk->bk', s, adj, 1.0 - s)
    d = jnp.sum(adj, axis=2)
    deg = jnp.einsum('bn,bnk->bk', d, s) + 1e-2
    ncut = jnp.mean(jnp.sum(cut / deg, axis=1))

    safe_s = jnp.clip(s, 1e-5, 1.0)
    entropy = -safe_s * jnp.log(safe_s)
    self_loss = jnp.mean(jnp.sum(entropy, axis=1))
    return ncut, self_loss


class NCutLoss:
    """Parity with reference `NCutLoss` (graph/loss.py:291-343). Dormant in
    the shipped recipes; part of the public API surface."""

    def __init__(self, adj_knn=None):
        self._knn = adj_knn

    def __repr__(self):
        return f'NCutLoss(adj_knn={self._knn})'

    def __call__(self, s, x, node_valid=None, group_ids=None, num_groups=1):
        adj = affinity_matrix_as_attention(
            x, node_valid, group_ids, num_groups, self._knn,
            remove_self_loop=True, binarize=True)
        adj = 0.5 * (adj + jnp.swapaxes(adj, 1, 2))
        return ncut_pool_loss(adj, s, node_valid)
