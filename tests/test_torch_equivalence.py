"""Numerical equivalence of core modules against torch (CPU) references.

The reference implementation is torch; these tests transplant weights
between frameworks and compare outputs, pinning down the fidelity of the
attention and normalization building blocks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from hsg_tpu.models.transformer import MultiheadAttention


def test_multihead_attention_matches_torch():
    d_model, nhead, b, lq, lk = 16, 4, 2, 5, 7
    rng = np.random.default_rng(0)
    q = rng.normal(size=(b, lq, d_model)).astype(np.float32)
    k = rng.normal(size=(b, lk, d_model)).astype(np.float32)
    v = rng.normal(size=(b, lk, d_model)).astype(np.float32)
    pad = np.zeros((b, lk), bool)
    pad[:, -2:] = True

    mha = MultiheadAttention(d_model, nhead, dropout=0.0)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q),
                         jnp.asarray(k), jnp.asarray(v),
                         jnp.asarray(pad), False)
    out_jax = np.asarray(mha.apply(variables, jnp.asarray(q),
                                   jnp.asarray(k), jnp.asarray(v),
                                   jnp.asarray(pad), False))

    # Transplant weights into torch (packed in_proj = [q; k; v]).
    p = variables['params']
    tm = torch.nn.MultiheadAttention(d_model, nhead, dropout=0.0,
                                     batch_first=True)
    with torch.no_grad():
        w_q = np.asarray(p['q_proj']['kernel']).T     # torch: [out, in]
        w_k = np.asarray(p['k_proj']['kernel']).T
        w_v = np.asarray(p['v_proj']['kernel']).T
        tm.in_proj_weight.copy_(torch.tensor(np.concatenate([w_q, w_k, w_v])))
        tm.in_proj_bias.copy_(torch.tensor(np.concatenate([
            np.asarray(p['q_proj']['bias']),
            np.asarray(p['k_proj']['bias']),
            np.asarray(p['v_proj']['bias'])])))
        tm.out_proj.weight.copy_(
            torch.tensor(np.asarray(p['out_proj']['kernel']).T))
        tm.out_proj.bias.copy_(
            torch.tensor(np.asarray(p['out_proj']['bias'])))

    out_t, _ = tm(torch.tensor(q), torch.tensor(k), torch.tensor(v),
                  key_padding_mask=torch.tensor(pad))
    np.testing.assert_allclose(out_jax, out_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch_bn1d_over_sequence():
    """Our BatchNorm on [B, L, C] must equal the reference's `_BatchNorm1d`
    (stats over batch AND sequence incl. padded entries,
    transformer.py:15-32)."""
    from hsg_tpu.models.resnet import BatchNorm
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 6, 8)).astype(np.float32)

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    out_jax, _ = bn.apply(variables, jnp.asarray(x), True,
                          mutable=['batch_stats'])

    tbn = torch.nn.BatchNorm1d(8, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.fill_(1.0)
        tbn.bias.fill_(0.0)
    # Reference feeds [L, B, C] -> transpose(1, 2) -> BN1d over (N=L, C, B).
    xt = torch.tensor(x).permute(1, 0, 2)          # [L, B, C]
    out_t = tbn(xt.transpose(1, 2)).transpose(1, 2)  # reference _BatchNorm1d
    out_t = out_t.permute(1, 0, 2).detach().numpy()  # back to [B, L, C]
    np.testing.assert_allclose(np.asarray(out_jax), out_t,
                               rtol=1e-4, atol=1e-5)


def test_conv_matches_torch_dilated():
    """Dilated 3x3 conv (the backbone's multi-grid workhorse) vs torch."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 10, 10, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)  # HWIO
    import flax.linen as nn
    conv = nn.Conv(6, (3, 3), padding=((2, 2), (2, 2)),
                   kernel_dilation=(2, 2), use_bias=False)
    out_jax = conv.apply({'params': {'kernel': jnp.asarray(w)}},
                         jnp.asarray(x))
    tconv = torch.nn.Conv2d(4, 6, 3, padding=2, dilation=2, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1)))
    out_t = tconv(torch.tensor(x.transpose(0, 3, 1, 2)))
    out_t = out_t.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_jax), out_t,
                               rtol=1e-3, atol=1e-4)
