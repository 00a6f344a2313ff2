"""DETR-style transformer with BatchNorm instead of LayerNorm.

Capability parity with reference `hsg/models/heads/transformer.py` (a DETR
variant): post-norm encoder/decoder layers whose norms are BatchNorm over
(batch, sequence) — including padded positions, as in the reference's
`_BatchNorm1d` (transformer.py:15-32) — and a decoder target `tgt` computed
from the masked mean/std of the encoder memory through an MLP
(transformer.py:118-132), NOT zeros as in stock DETR.

TPU-first deviations: batch-first `[B, L, C]` layout throughout (no
seq-first permutes), one fused attention einsum per layer, additive large-
negative masking instead of boolean fill. BatchNorm over the global batch
axis doubles as SyncBN under a sharded jit.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hsg_tpu.models.resnet import BatchNorm

dense_init = nn.initializers.xavier_uniform()

_NEG = -1e30


class MultiheadAttention(nn.Module):
    """Scaled-dot multi-head attention with key padding mask.

    Functional parity with torch `nn.MultiheadAttention` as used by the
    reference (dropout on attention probabilities; padded keys excluded).
    """
    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None,
                 train: bool = False):
        b, lq, _ = query.shape
        lk = key.shape[1]
        dh = self.d_model // self.nhead

        def proj(x, name):
            return nn.Dense(self.d_model, kernel_init=dense_init,
                            dtype=self.dtype, name=name)(x)

        q = proj(query, 'q_proj').reshape(b, lq, self.nhead, dh)
        k = proj(key, 'k_proj').reshape(b, lk, self.nhead, dh)
        v = proj(value, 'v_proj').reshape(b, lk, self.nhead, dh)

        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.promote_types(
                                jnp.float32, q.dtype))
        logits = logits / jnp.sqrt(logits.dtype.type(dh))
        if key_padding_mask is not None:  # [B, Lk], True = padded
            logits = logits + jnp.where(
                key_padding_mask[:, None, None, :], _NEG, 0.0)
        probs = nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v)
        out = out.reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model, kernel_init=dense_init,
                        dtype=self.dtype, name='out_proj')(out)


def _with_pos(x, pos):
    return x if pos is None else x + pos


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, key_padding_mask=None, pos=None,
                 train: bool = False):
        attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype, name='self_attn')
        lin1 = nn.Dense(self.dim_feedforward, kernel_init=dense_init,
                        dtype=self.dtype, name='linear1')
        lin2 = nn.Dense(self.d_model, kernel_init=dense_init,
                        dtype=self.dtype, name='linear2')
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.normalize_before:
            s2 = BatchNorm(name='norm1')(src, train)
            q = _with_pos(s2, pos)
            s2 = attn(q, q, s2, key_padding_mask, train)
            src = src + drop(s2)
            s2 = BatchNorm(name='norm2')(src, train)
            s2 = lin2(drop(nn.relu(lin1(s2))))
            return src + drop(s2)

        q = _with_pos(src, pos)
        s2 = attn(q, q, src, key_padding_mask, train)
        src = BatchNorm(name='norm1')(src + drop(s2), train)
        s2 = lin2(drop(nn.relu(lin1(src))))
        src = BatchNorm(name='norm2')(src + drop(s2), train)
        return src


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_key_padding_mask=None,
                 pos=None, query_pos=None, train: bool = False):
        self_attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                       dtype=self.dtype, name='self_attn')
        cross_attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                        dtype=self.dtype, name='cross_attn')
        lin1 = nn.Dense(self.dim_feedforward, kernel_init=dense_init,
                        dtype=self.dtype, name='linear1')
        lin2 = nn.Dense(self.d_model, kernel_init=dense_init,
                        dtype=self.dtype, name='linear2')
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.normalize_before:
            t2 = BatchNorm(name='norm1')(tgt, train)
            q = _with_pos(t2, query_pos)
            t2 = self_attn(q, q, t2, None, train)
            tgt = tgt + drop(t2)
            t2 = BatchNorm(name='norm2')(tgt, train)
            t2 = cross_attn(_with_pos(t2, query_pos), _with_pos(memory, pos),
                            memory, memory_key_padding_mask, train)
            tgt = tgt + drop(t2)
            t2 = BatchNorm(name='norm3')(tgt, train)
            t2 = lin2(drop(nn.relu(lin1(t2))))
            return tgt + drop(t2)

        q = _with_pos(tgt, query_pos)
        t2 = self_attn(q, q, tgt, None, train)
        tgt = BatchNorm(name='norm1')(tgt + drop(t2), train)
        t2 = cross_attn(_with_pos(tgt, query_pos), _with_pos(memory, pos),
                        memory, memory_key_padding_mask, train)
        tgt = BatchNorm(name='norm2')(tgt + drop(t2), train)
        t2 = lin2(drop(nn.relu(lin1(tgt))))
        tgt = BatchNorm(name='norm3')(tgt + drop(t2), train)
        return tgt


class Transformer(nn.Module):
    """Encoder-decoder with the mean/std-derived decoder target.

    Inputs/outputs are batch-first: src `[B, S, C]`, returns
    (decoder_output `[B, T, C]`, encoder_memory `[B, S, C]`).
    """
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    return_intermediate_dec: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, mask=None, query_embed=None, pos_embed=None,
                 train: bool = False):
        memory = src
        for i in range(self.num_encoder_layers):
            memory = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.normalize_before, dtype=self.dtype,
                name=f'encoder_layer_{i}')(memory, mask, pos_embed, train)
        if self.normalize_before:
            memory = BatchNorm(name='encoder_norm')(memory, train)

        # Decoder target from masked mean/std of the encoder memory
        # (reference transformer.py:118-132, including the quirk that padded
        # positions contribute (0 - mean)^2 to the variance sum).
        if mask is not None:
            w = (~mask).astype(memory.dtype)[:, :, None]       # [B, S, 1]
            count = jnp.maximum(jnp.sum(w, axis=1), 1.0)        # [B, 1]
            masked = memory * w
            mean = jnp.sum(masked, axis=1) / count              # [B, C]
            centered = masked - mean[:, None, :]
            var = jnp.sum(centered * centered, axis=1)
            std = jnp.sqrt(var / (count + 1.0))
        else:
            mean = jnp.mean(memory, axis=1)
            std = jnp.std(memory, axis=1, ddof=1)

        h = nn.Dense(self.dim_feedforward, use_bias=False,
                     kernel_init=dense_init, dtype=self.dtype,
                     name='tgt_fc1')(jnp.concatenate([mean, std], axis=-1))
        h = BatchNorm(name='tgt_bn')(h, train)
        h = nn.relu(h)
        tgt0 = nn.Dense(self.d_model, kernel_init=dense_init,
                        dtype=self.dtype, name='tgt_fc2')(h)    # [B, C]

        if query_embed.ndim == 2:                               # [T, C]
            t = query_embed.shape[0]
            query_pos = jnp.broadcast_to(query_embed[None],
                                         (src.shape[0], t, self.d_model))
        else:                                                   # [B, T, C]
            t = query_embed.shape[1]
            query_pos = query_embed
        tgt = jnp.broadcast_to(tgt0[:, None, :],
                               (src.shape[0], t, self.d_model))

        out = tgt
        norm = BatchNorm(name='decoder_norm')
        intermediates = []
        for i in range(self.num_decoder_layers):
            out = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.normalize_before, dtype=self.dtype,
                name=f'decoder_layer_{i}')(
                    out, memory, mask, pos_embed, query_pos, train)
            if self.return_intermediate_dec:
                intermediates.append(norm(out, train))
        out = norm(out, train)
        if self.return_intermediate_dec:
            # Per-layer normed decoder outputs (transformer.py:192-202);
            # the final entry is the fully normed last layer.
            intermediates[-1] = out
            return jnp.stack(intermediates), memory
        return out, memory


class TransformerClustering(nn.Module):
    """Clustering head: transformer -> centroid MLPs -> top-k selection.

    Parity with reference `TransformerClustering`
    (hsg/models/embeddings/transformer_clusters.py:11-114): decoder outputs
    are projected by ReLU-Dense-BN into `centroids` and `centroid_feats`;
    assignment logits are the scaled dot of centroids with the encoder
    memory; the `num_clusters` centroids with the highest max-activation
    are kept (with num_queries == num_clusters this is a sort).

    Returns (centroids `[B, K, C]`, centroid_feats `[B, K, C]`,
             logits `[B, K, S]`, node_features `[B, S, C]`).
    """
    num_clusters: int = 4
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, mask=None, query_embed=None, pos_embed=None,
                 train: bool = False):
        b, s, c = src.shape
        dec, memory = Transformer(
            self.d_model, self.nhead, self.num_encoder_layers,
            self.num_decoder_layers, self.dim_feedforward, self.dropout,
            self.normalize_before, dtype=self.dtype,
            name='transformer')(src, mask, query_embed, pos_embed, train)
        t = dec.shape[1]

        def head(x, name):
            y = nn.relu(x)
            y = nn.Dense(self.d_model, use_bias=False, kernel_init=dense_init,
                         dtype=self.dtype, name=f'{name}_dense')(y)
            # BN over the flattened (batch * queries) dim, as the reference's
            # nn.BatchNorm1d on `[B*T, C]` (transformer_clusters.py:86-88).
            y = BatchNorm(name=f'{name}_bn')(
                y.reshape(b * t, self.d_model), train)
            return y.reshape(b, t, self.d_model)

        centroids = head(dec, 'centroid_fc')
        centroid_feats = head(dec, 'centroid_feat_fc')

        logits = jnp.einsum('btc,bsc->bts', centroids, memory,
                            preferred_element_type=jnp.promote_types(
                                jnp.float32, centroids.dtype))
        logits = logits / jnp.sqrt(logits.dtype.type(c))
        max_logits = jnp.max(logits, axis=-1)                     # [B, T]
        _, topk = jax.lax.top_k(max_logits, self.num_clusters)    # [B, K]

        take = lambda x: jnp.take_along_axis(
            x, topk[:, :, None], axis=1)
        centroids = take(centroids)
        centroid_feats = take(centroid_feats)
        logits = jnp.take_along_axis(
            logits, topk[:, :, None].repeat(s, axis=2), axis=1)
        return centroids, centroid_feats, logits, memory
