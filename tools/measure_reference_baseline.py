"""CPU-normalized measurement anchoring bench.py's REFERENCE_IMG_S.

bench.py compares our TPU throughput on the headline inference path
(ResNet-50 FCN OS-8 448^2 dense embeddings + per-image spherical k-means,
the per-window pipeline of the reference's pyscripts/inference/inference.py)
against REFERENCE_IMG_S, an estimate of the reference PyTorch pipeline on
one V100.  The reference publishes no throughput numbers, so the constant
must be derived, not asserted.  This script produces the two measurable
anchors (the third, a roofline bound, is arithmetic — see bench.py
docstring):

1. an independent PyTorch implementation of the same pipeline
   (fp32, serial per-image EM loop exactly in the reference's style —
   hsg/utils/segsort/common.py:270-408 runs EM per image inside a Python
   loop), timed on this host's CPU;
2. our JAX pipeline compiled for the same CPU;

and prints img/s for both plus the ratio.  Because both run the identical
math on identical hardware, the ratio isolates *implementation* efficiency
(framework overhead, fusion, batching of the EM) from hardware; combined
with the V100/roofline arithmetic in bench.py it brackets REFERENCE_IMG_S.

Run: PYTHONPATH=. python tools/measure_reference_baseline.py [--hw 448]
"""

import argparse
import json
import time

import numpy as np


# ---------------------------------------------------------------------------
# Independent torch pipeline (architecture from SURVEY.md §2.2: ResNet-50,
# OS-8 test variant strides [1,2,1,1] / dilations [1,1,2,4], res5 multi-grid
# [1,2,4]; head conv1x1(2048->2048)-BN-ReLU-conv1x1(2048->128); spherical
# k-means grid 6x6, 10 EM iterations on (embedding, location) features).
# Written from the spec — no reference code.
# ---------------------------------------------------------------------------

def build_torch_model():
    import torch

    class Bottleneck(torch.nn.Module):
        def __init__(self, cin, planes, stride=1, dilation=1, project=False):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                         padding=dilation, dilation=dilation,
                                         bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(planes * 4)
            self.down = None
            if project:
                self.down = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, planes * 4, 1, stride=stride,
                                    bias=False),
                    torch.nn.BatchNorm2d(planes * 4))

        def forward(self, x):
            r = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + r)

    def stage(cin, planes, blocks, stride, dilation, multigrid=None):
        mods = []
        for i in range(blocks):
            mg = multigrid[i % len(multigrid)] if multigrid else 1
            mods.append(Bottleneck(cin if i == 0 else planes * 4, planes,
                                   stride if i == 0 else 1,
                                   dilation * mg, project=(i == 0)))
        return torch.nn.Sequential(*mods)

    class Fcn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.pool = torch.nn.MaxPool2d(3, 2, 1)
            # OS-8 test variant: strides [1,2,1,1], dilations [1,1,2,4]
            self.res2 = stage(64, 64, 3, 1, 1)
            self.res3 = stage(256, 128, 4, 2, 1)
            self.res4 = stage(512, 256, 6, 1, 2)
            self.res5 = stage(1024, 512, 3, 1, 4, multigrid=[1, 2, 4])
            self.head = torch.nn.Sequential(
                torch.nn.Conv2d(2048, 2048, 1), torch.nn.BatchNorm2d(2048),
                torch.nn.ReLU(), torch.nn.Conv2d(2048, 128, 1))

        def forward(self, x):
            x = self.pool(torch.relu(self.bn1(self.conv1(x))))
            x = self.res5(self.res4(self.res3(self.res2(x))))
            return self.head(x)

    return Fcn().eval()


def torch_kmeans_per_image(emb, iters=10, grid=(6, 6)):
    """Reference-style serial spherical k-means on one image's features.

    emb: [C, H, W] torch tensor (L2-normalized embedding + location rows
    appended by the caller). Grid-initialized labels, `iters` EM steps of
    scatter-add M-step + argmax E-step — the computation of
    hsg/utils/segsort/common.py:67-126, written from the spec.
    """
    import torch
    c, h, w = emb.shape
    x = emb.reshape(c, -1).t().contiguous()          # [N, C]
    yy = (torch.arange(h) * grid[0] // h).repeat_interleave(w)
    xx = (torch.arange(w) * grid[1] // w).repeat(h)
    labels = (yy * grid[1] + xx).long()
    k = grid[0] * grid[1]
    for _ in range(iters):
        protos = torch.zeros(k, c).index_add_(0, labels, x)
        protos = torch.nn.functional.normalize(protos, dim=1, eps=1e-12)
        labels = (x @ protos.t()).argmax(1)
    return labels


def measure_torch(hw, batch, reps):
    import torch
    torch.set_grad_enabled(False)
    model = build_torch_model()
    img = torch.randn(batch, 3, hw, hw)

    def run():
        out = model(img)                              # [B, 128, h, w]
        out = torch.nn.functional.normalize(out, dim=1, eps=1e-12)
        _, _, h, w = out.shape
        ys = ((torch.arange(h, dtype=torch.float32) / h)
              .reshape(1, h, 1).expand(1, h, w))
        xs = ((torch.arange(w, dtype=torch.float32) / w)
              .reshape(1, 1, w).expand(1, h, w))
        for i in range(out.shape[0]):                 # serial, like the ref
            feat = torch.cat([out[i], ys - 0.5, xs - 0.5], 0)
            feat = torch.nn.functional.normalize(
                feat.reshape(feat.shape[0], -1), dim=0).reshape(feat.shape)
            torch_kmeans_per_image(feat)

    run()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    return batch / dt


def measure_jax_cpu(hw, batch, reps):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from hsg_tpu.config import default_config
    from hsg_tpu.models import fcn as fcn_lib

    cfg = default_config()
    cfg.network.embedding_dim = 128
    cfg.network.kmeans_num_clusters = (6, 6)
    cfg.network.kmeans_iterations = 10
    cfg.network.max_segments_per_view = 64
    cfg.network.label_divisor = 2048
    cfg.network.compute_dtype = 'float32'  # match torch fp32

    model = fcn_lib.resnet_50_fcn_test(cfg)
    images = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, hw, hw, 3)), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1], None, None,
                           train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    f = jax.jit(lambda im: model.apply(variables, im, None, None,
                                       train=False)['cluster_index'])
    f(images).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        f(images).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return batch / dt


def measure_flops(hw):
    """FLOPs/img of the exact bench.py pipeline via XLA CPU cost analysis
    (the TPU executable's cost_analysis under-reports convolutions)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from hsg_tpu.config import default_config
    from hsg_tpu.models import fcn as fcn_lib

    out = {}
    for dtype in ('float32', 'bfloat16'):
        cfg = default_config()
        cfg.network.embedding_dim = 128
        cfg.network.kmeans_num_clusters = (6, 6)
        cfg.network.kmeans_iterations = 10
        cfg.network.max_segments_per_view = 64
        cfg.network.label_divisor = 2048
        cfg.network.compute_dtype = dtype
        model = fcn_lib.resnet_50_fcn_test(cfg)
        images = jnp.zeros((1, hw, hw, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda m=model, im=images: m.init(jax.random.PRNGKey(0), im,
                                              None, None, train=False))
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)
        f = jax.jit(lambda im, m=model, v=variables: m.apply(
            v, im, None, None, train=False)['cluster_index'])
        ca = f.lower(images).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out[dtype + '_flops_per_img'] = float(ca['flops'])
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hw', type=int, default=448)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--reps', type=int, default=2)
    ap.add_argument('--flops', action='store_true',
                    help='print XLA-CPU FLOPs/img of the pipeline and exit')
    args = ap.parse_args()

    if args.flops:
        measure_flops(args.hw)
        return

    torch_img_s = measure_torch(args.hw, args.batch, args.reps)
    jax_img_s = measure_jax_cpu(args.hw, args.batch, args.reps)
    print(json.dumps({
        'host': 'cpu', 'hw': args.hw,
        'torch_fp32_img_s': round(torch_img_s, 4),
        'jax_fp32_img_s': round(jax_img_s, 4),
        'jax_over_torch': round(jax_img_s / torch_img_s, 3),
    }))


if __name__ == '__main__':
    main()
