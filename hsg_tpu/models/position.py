"""Positional encodings for the clustering transformers.

Capability parity with reference `hsg/models/heads/position_encoding.py`:
- `PositionEmbeddingLearned`: 50x50 learned row/col tables; output channels
  are [col_emb | row_emb] (position_encoding.py:67-70), init U(0, 1).
- `PositionEmbeddingSine`: the DETR sine variant (dormant in recipes but
  part of the API surface).
Outputs are NHWC `[B, H, W, C]` (the reference uses NCHW).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute 2-D position embedding."""
    num_pos_feats: int = 64  # half of the output channels
    max_size: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = feature_map.shape
        row = nn.Embed(self.max_size, self.num_pos_feats,
                       embedding_init=nn.initializers.uniform(scale=1.0),
                       param_dtype=jnp.float32, name='row_embed')
        col = nn.Embed(self.max_size, self.num_pos_feats,
                       embedding_init=nn.initializers.uniform(scale=1.0),
                       param_dtype=jnp.float32, name='col_embed')
        x_emb = col(jnp.arange(w))                       # [W, F]
        y_emb = row(jnp.arange(h))                       # [H, F]
        pos = jnp.concatenate([
            jnp.broadcast_to(x_emb[None, :, :], (h, w, self.num_pos_feats)),
            jnp.broadcast_to(y_emb[:, None, :], (h, w, self.num_pos_feats)),
        ], axis=-1)
        pos = jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_pos_feats))
        return pos.astype(self.dtype)


def position_embedding_sine(mask: jnp.ndarray,
                            num_pos_feats: int = 64,
                            temperature: float = 10000.0,
                            normalize: bool = False,
                            scale: float | None = None) -> jnp.ndarray:
    """Sine position embedding over a validity mask `[B, H, W]` (True=pad).

    Parity with reference `PositionEmbeddingSine`
    (position_encoding.py:10-44). Returns `[B, H, W, 2*num_pos_feats]`
    with channels [y-features | x-features].
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=4).reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=4).reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)


class SimpleQueryEmbedding(nn.Module):
    """Learned query table; no-arg call returns `[num_queries, hidden_dim]`.

    Parity with reference `SimpleQueryEmbedding`
    (hsg/models/heads/query_encoding.py:7-20).
    """
    num_queries: int
    hidden_dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        embed = nn.Embed(self.num_queries, self.hidden_dim,
                         param_dtype=jnp.float32, name='query_embed')
        return embed(jnp.arange(self.num_queries))
