"""Full reference-checkpoint import: mapping + forward equivalence.

Builds an independent torch implementation of the reference's HSG
embedding-model pieces (from the architecture spec in SURVEY.md §2.2:
BN-DETR transformer with masked mean/std decoder target, centroid heads,
learned position embedding) whose state-dict KEYS match the reference's
naming (resnet_fcn_hsg.py:37-90, heads/transformer.py,
transformer_clusters.py). Importing that state dict through
`torch_hsg_to_flax` and comparing eval-mode forwards certifies that
published reference checkpoints load correctly — the cheap path to the
42.2-mIoU eval-parity check once real data is available.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
import flax

from hsg_tpu.models import import_torch
from hsg_tpu.models.transformer import TransformerClustering
from test_checkpoint_import import _fake_torch_state_dict


# ---------------------------------------------------------------------------
# Independent torch modules with reference state-dict naming.
# ---------------------------------------------------------------------------

class _BN1dSeq(torch.nn.Module):
    """BatchNorm1d over [L, B, C] sequences (reference `_BatchNorm1d`)."""

    def __init__(self, c):
        super().__init__()
        self.norm = torch.nn.BatchNorm1d(c)

    def forward(self, x):                          # [L, B, C]
        return self.norm(x.transpose(1, 2)).transpose(1, 2)


class _EncLayer(torch.nn.Module):
    def __init__(self, d, nhead, ffn):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(d, nhead, dropout=0.0)
        self.linear1 = torch.nn.Linear(d, ffn)
        self.linear2 = torch.nn.Linear(ffn, d)
        self.norm1 = _BN1dSeq(d)
        self.norm2 = _BN1dSeq(d)

    def forward(self, src, key_padding_mask, pos):
        q = src if pos is None else src + pos
        s2 = self.self_attn(q, q, src, key_padding_mask=key_padding_mask)[0]
        src = self.norm1(src + s2)
        s2 = self.linear2(torch.relu(self.linear1(src)))
        return self.norm2(src + s2)


class _DecLayer(torch.nn.Module):
    def __init__(self, d, nhead, ffn):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(d, nhead, dropout=0.0)
        self.multihead_attn = torch.nn.MultiheadAttention(d, nhead,
                                                          dropout=0.0)
        self.linear1 = torch.nn.Linear(d, ffn)
        self.linear2 = torch.nn.Linear(ffn, d)
        self.norm1 = _BN1dSeq(d)
        self.norm2 = _BN1dSeq(d)
        self.norm3 = _BN1dSeq(d)

    def forward(self, tgt, memory, memory_key_padding_mask, pos, query_pos):
        q = tgt + query_pos
        t2 = self.self_attn(q, q, tgt)[0]
        tgt = self.norm1(tgt + t2)
        k = memory if pos is None else memory + pos
        t2 = self.multihead_attn(tgt + query_pos, k, memory,
                                 key_padding_mask=memory_key_padding_mask)[0]
        tgt = self.norm2(tgt + t2)
        t2 = self.linear2(torch.relu(self.linear1(tgt)))
        return self.norm3(tgt + t2)


class _Stack(torch.nn.Module):
    def __init__(self, layers, norm=None):
        super().__init__()
        self.layers = torch.nn.ModuleList(layers)
        if norm is not None:
            self.norm = norm


class _Transformer(torch.nn.Module):
    def __init__(self, d, nhead, n_enc, n_dec, ffn):
        super().__init__()
        self.encoder = _Stack([_EncLayer(d, nhead, ffn)
                               for _ in range(n_enc)])
        self.decoder = _Stack([_DecLayer(d, nhead, ffn)
                               for _ in range(n_dec)], norm=_BN1dSeq(d))
        self.tgt_fc = torch.nn.Sequential(
            torch.nn.Linear(d * 2, ffn, bias=False),
            torch.nn.BatchNorm1d(ffn),
            torch.nn.ReLU(),
            torch.nn.Linear(ffn, d))

    def forward(self, src, mask, query_embed, pos_embed):
        # src [B, C, S] -> seq-first, masked mean/std decoder target
        # (reference transformer.py:104-139 semantics).
        bs, c, sl = src.shape
        src = src.permute(2, 0, 1)
        pos = pos_embed.permute(2, 0, 1) if pos_embed is not None else None
        tl = query_embed.shape[0]
        query = query_embed.unsqueeze(1).repeat(1, bs, 1)

        memory = src
        for layer in self.encoder.layers:
            memory = layer(memory, mask, pos)

        if mask is not None:
            keep = (~mask).t().type_as(memory).unsqueeze(2)     # [S, B, 1]
            cnt = torch.clamp(keep.sum(0), min=1)
            masked = memory * keep
            mean = masked.sum(0) / cnt
            centered = masked - mean.unsqueeze(0)
            var = (centered ** 2).sum(0)
            std = torch.sqrt(var / (cnt + 1))
        else:
            mean = memory.mean(0)
            std = memory.std(0)
        tgt = self.tgt_fc(torch.cat([mean, std], dim=-1))
        tgt = tgt.unsqueeze(0).repeat(tl, 1, 1)

        out = tgt
        for layer in self.decoder.layers:
            out = layer(out, memory, mask, pos, query)
        out = self.decoder.norm(out)
        return (out.permute(1, 2, 0).reshape(bs, c, tl),
                memory.permute(1, 2, 0).reshape(bs, c, sl))


class _TorchClustering(torch.nn.Module):
    def __init__(self, num_clusters, d, nhead=4, n_enc=2, n_dec=2, ffn=None):
        super().__init__()
        ffn = ffn or d * 2
        self._transformer = _Transformer(d, nhead, n_enc, n_dec, ffn)
        self.centroid_fc = torch.nn.Sequential(
            torch.nn.ReLU(), torch.nn.Linear(d, d, bias=False),
            torch.nn.BatchNorm1d(d))
        self.centroid_feat_fc = torch.nn.Sequential(
            torch.nn.ReLU(), torch.nn.Linear(d, d, bias=False),
            torch.nn.BatchNorm1d(d))
        self._num_clusters = num_clusters

    def forward(self, src, mask, query_embed, pos_embed):
        bs, cs, sl = src.shape
        cent, nodes = self._transformer(src, mask, query_embed, pos_embed)
        tl = cent.shape[-1]
        flat = cent.transpose(1, 2).flatten(0, 1)
        cent = self.centroid_fc(flat).view(bs, tl, cs).transpose(1, 2)
        feats = self.centroid_feat_fc(flat).view(bs, tl, cs).transpose(1, 2)
        logits = torch.einsum('bij,bjk->bik', cent.transpose(1, 2), nodes)
        logits = logits / math.sqrt(cs)
        _, topk = torch.topk(logits.max(-1)[0], self._num_clusters, dim=-1)
        g = lambda x: torch.gather(
            x.transpose(1, 2), 1,
            topk.unsqueeze(2).repeat(1, 1, cs)).permute(0, 2, 1)
        logits = torch.gather(logits, 1,
                              topk.unsqueeze(2).repeat(1, 1, sl))
        return g(cent), g(feats), logits, nodes


def _randomize_bn_stats(module, rng):
    """Running stats at init are (0, 1); randomize so the import of
    mean/var is actually exercised."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            c = m.running_mean.shape[0]
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(
                    rng.normal(size=(c,)).astype(np.float32)))
                m.running_var.copy_(torch.tensor(
                    (np.abs(rng.normal(size=(c,))) + 0.5).astype(np.float32)))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_reference_backbone_names_equal_torchvision_mapping():
    """`resnet_backbone.*` (reference-internal names) must map to the same
    Flax tree as the torchvision names do (base_model.py:14-24 says they
    are renames of each other)."""
    tv = _fake_torch_state_dict(blocks=(1, 1, 1, 1))
    ref = {}
    for k, v in tv.items():
        if k.startswith('fc'):
            continue
        if k.startswith(('conv1', 'bn1')):
            ref['resnet_backbone.conv1.' + k] = v
        else:
            stage = int(k[len('layer')]) + 1
            ref[f'resnet_backbone.res{stage}' + k[len('layerN'):]] = v
    p_ref, s_ref = import_torch.torch_hsg_to_flax(ref)
    p_tv, s_tv = import_torch.torch_resnet_to_flax(tv)
    for a, b in ((p_ref['resnet_backbone'], p_tv),
                 (s_ref['resnet_backbone'], s_tv)):
        fa = flax.traverse_util.flatten_dict(a)
        fb = flax.traverse_util.flatten_dict(b)
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k])


def test_transformer_clustering_import_forward_equivalence():
    """Import a torch TransformerClustering state dict and compare the full
    eval-mode forward: centroids, centroid feats, logits, memory."""
    d, nhead, n_enc, n_dec, k = 16, 4, 2, 2, 3
    b, s = 2, 10
    rng = np.random.default_rng(0)
    tm = _TorchClustering(k, d, nhead, n_enc, n_dec)
    _randomize_bn_stats(tm, rng)
    tm.eval()

    sd = {'fine_hrchy_transformer.' + n: p.detach().numpy()
          for n, p in tm.state_dict().items()}
    params, stats = import_torch.torch_hsg_to_flax(sd)

    src = rng.normal(size=(b, s, d)).astype(np.float32)
    pos = rng.normal(size=(b, s, d)).astype(np.float32)
    query = rng.normal(size=(k, d)).astype(np.float32)
    mask = np.zeros((b, s), bool)
    mask[0, -3:] = True
    mask[1, -1:] = True

    model = TransformerClustering(num_clusters=k, d_model=d, nhead=nhead,
                                  num_encoder_layers=n_enc,
                                  num_decoder_layers=n_dec,
                                  dim_feedforward=d * 2, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(src),
                           jnp.asarray(mask), jnp.asarray(query),
                           jnp.asarray(pos), False)
    # Every imported leaf must land on an existing model leaf.
    fm = flax.traverse_util.flatten_dict(variables['params'])
    fi = flax.traverse_util.flatten_dict(params['fine_hrchy_transformer'])
    for path, v in fi.items():
        assert path in fm, path
        assert fm[path].shape == v.shape, path
    fm.update({p: jnp.asarray(v) for p, v in fi.items()})
    fsm = flax.traverse_util.flatten_dict(variables['batch_stats'])
    fsi = flax.traverse_util.flatten_dict(stats['fine_hrchy_transformer'])
    assert set(fsi) == set(fsm)        # every BN stat is imported
    fsm.update({p: jnp.asarray(v) for p, v in fsi.items()})

    cj, fj, lj, mj = model.apply(
        {'params': flax.traverse_util.unflatten_dict(fm),
         'batch_stats': flax.traverse_util.unflatten_dict(fsm)},
        jnp.asarray(src), jnp.asarray(mask), jnp.asarray(query),
        jnp.asarray(pos), False)

    with torch.no_grad():
        ct, ft, lt, mt = tm(
            torch.tensor(src.transpose(0, 2, 1)), torch.tensor(mask),
            torch.tensor(query), torch.tensor(pos.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(mj), mt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cj), ct.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fj), ft.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lj), lt.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_full_embedding_model_checkpoint_roundtrip(tmp_path):
    """Save a reference-layout snapshot {'embedding_model': sd} covering
    backbone + conv_out + pos_embed + queries + both transformers, load it
    through `load_torch_checkpoint`, and check `generate_embeddings`
    forward equivalence (embedding AND position embedding) plus that the
    transformer subtrees were actually overwritten."""
    from hsg_tpu.models.hsg import MultiviewResnetFcn

    dim = 16
    rng = np.random.default_rng(1)
    sd = {}
    # Backbone (reference-internal names), tamed magnitudes as in
    # test_backbone_torch_equivalence.
    tv = _fake_torch_state_dict(blocks=(1, 1, 1, 1))
    for k, v in tv.items():
        if k.startswith('fc'):
            continue
        v = v * 0.15 if k.endswith('.weight') and v.ndim == 4 else v
        if k.startswith(('conv1', 'bn1')):
            sd['resnet_backbone.conv1.' + k] = v
        else:
            stage = int(k[len('layer')]) + 1
            sd[f'resnet_backbone.res{stage}' + k[len('layerN'):]] = v
    # conv_out head.
    sd['conv_out.0.weight'] = 0.02 * rng.normal(
        size=(2048, 2048, 1, 1)).astype(np.float32)
    sd['conv_out.1.weight'] = rng.normal(size=(2048,)).astype(np.float32)
    sd['conv_out.1.bias'] = rng.normal(size=(2048,)).astype(np.float32)
    sd['conv_out.1.running_mean'] = rng.normal(
        size=(2048,)).astype(np.float32)
    sd['conv_out.1.running_var'] = (np.abs(rng.normal(size=(2048,)))
                                    + 0.5).astype(np.float32)
    sd['conv_out.3.weight'] = 0.02 * rng.normal(
        size=(dim, 2048, 1, 1)).astype(np.float32)
    sd['conv_out.3.bias'] = rng.normal(size=(dim,)).astype(np.float32)
    # Position + query embeddings.
    sd['pos_embed.row_embed.weight'] = rng.uniform(
        size=(50, dim // 2)).astype(np.float32)
    sd['pos_embed.col_embed.weight'] = rng.uniform(
        size=(50, dim // 2)).astype(np.float32)
    sd['fine_query_embed._query_embedding.weight'] = rng.normal(
        size=(3, dim)).astype(np.float32)
    sd['coarse_query_embed._query_embedding.weight'] = rng.normal(
        size=(2, dim)).astype(np.float32)
    # Both transformers from the independent torch implementation.
    for name, k in (('fine_hrchy_transformer', 3),
                    ('coarse_hrchy_transformer', 2)):
        tm = _TorchClustering(k, dim)
        _randomize_bn_stats(tm, rng)
        for n, p in tm.state_dict().items():
            sd[f'{name}.{n}'] = p.detach().numpy()

    path = tmp_path / 'model-99.pth'
    torch.save({'embedding_model': {n: torch.tensor(v)
                                    for n, v in sd.items()},
                'prediction_model': {}}, path)

    model = MultiviewResnetFcn(
        backbone_depth=(1, 1, 1, 1), embedding_dim=dim,
        kmeans_num_clusters=(2, 2), kmeans_iterations=1, max_segments=8,
        num_views=2, fine_hrchy_clusters=3, coarse_hrchy_clusters=2)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    import warnings as w
    with w.catch_warnings():
        w.simplefilter('error')        # any skipped/missing key = failure
        loaded = import_torch.load_torch_checkpoint(variables, str(path))

    # Transformer params actually overwritten.
    got = np.asarray(loaded['params']['fine_hrchy_transformer']
                     ['transformer']['tgt_fc2']['bias'])
    want = sd['fine_hrchy_transformer._transformer.tgt_fc.3.bias']
    np.testing.assert_allclose(got, want)
    np.testing.assert_allclose(
        np.asarray(loaded['params']['fine_query_embed']),
        sd['fine_query_embed._query_embedding.weight'])

    # Forward equivalence of generate_embeddings vs torch compute.
    out = model.apply(loaded, imgs, train=False,
                      method=lambda m, x, train: m.generate_embeddings(
                          x, train=train))
    from test_backbone_torch_equivalence import _TorchBackbone
    tb = _TorchBackbone()
    tv_renamed = {k: torch.tensor(v * 0.15 if k.endswith('.weight')
                                  and v.ndim == 4 else v)
                  for k, v in tv.items() if not k.startswith('fc')}
    tb.load_state_dict(tv_renamed, strict=False)
    conv_out = torch.nn.Sequential(
        torch.nn.Conv2d(2048, 2048, 1, bias=False),
        torch.nn.BatchNorm2d(2048), torch.nn.ReLU(),
        torch.nn.Conv2d(2048, dim, 1))
    with torch.no_grad():
        conv_out[0].weight.copy_(torch.tensor(sd['conv_out.0.weight']))
        conv_out[1].weight.copy_(torch.tensor(sd['conv_out.1.weight']))
        conv_out[1].bias.copy_(torch.tensor(sd['conv_out.1.bias']))
        conv_out[1].running_mean.copy_(
            torch.tensor(sd['conv_out.1.running_mean']))
        conv_out[1].running_var.copy_(
            torch.tensor(sd['conv_out.1.running_var']))
        conv_out[3].weight.copy_(torch.tensor(sd['conv_out.3.weight']))
        conv_out[3].bias.copy_(torch.tensor(sd['conv_out.3.bias']))
    tb.eval()
    conv_out.eval()
    with torch.no_grad():
        res5 = tb(torch.tensor(
            np.asarray(imgs).transpose(0, 3, 1, 2)))
        emb_t = conv_out(res5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out['embedding']), emb_t,
                               rtol=2e-2, atol=1e-2)

    # Position embedding: [col | row] channel order at res5 resolution.
    h, w = out['position_embedding'].shape[1:3]
    col = sd['pos_embed.col_embed.weight'][:w]
    row = sd['pos_embed.row_embed.weight'][:h]
    pos_ref = np.concatenate([
        np.broadcast_to(col[None, :, :], (h, w, dim // 2)),
        np.broadcast_to(row[:, None, :], (h, w, dim // 2))], axis=-1)
    np.testing.assert_allclose(np.asarray(out['position_embedding'][0]),
                               pos_ref, rtol=1e-5, atol=1e-5)
