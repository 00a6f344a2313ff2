"""Capture a jax.profiler trace of the bench.py inference pipeline.

Runs the exact computation bench.py times (448² ResNet-50 OS-8 dense
embeddings + spherical k-means, bf16, chained scan) under
`jax.profiler.trace`, then feed the trace to tools/analyze_profile.py to
see where the 39% of non-MXU time goes (docs/ROADMAP.md perf backlog:
the backbone is ~90% of inference time; candidates are dilated-conv
tiling and BN epilogues).

Usage:
    python tools/profile_inference.py [--out /tmp/prof_infer] [--iters 10]
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/analyze_profile.py /tmp/prof_infer
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/prof_infer')
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--hw', type=int, default=448)
    ap.add_argument('--no_kmeans', action='store_true',
                    help='profile the embedding forward only')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hsg_tpu.config import default_config
    from hsg_tpu.models import fcn as fcn_lib

    cfg = default_config()
    cfg.network.embedding_dim = 128
    cfg.network.kmeans_num_clusters = (6, 6)
    cfg.network.kmeans_iterations = 10
    cfg.network.max_segments_per_view = 64
    cfg.network.label_divisor = 2048
    cfg.network.compute_dtype = 'bfloat16'

    model = fcn_lib.resnet_50_fcn_test(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(args.batch, args.hw, args.hw, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images[:1], None, None,
                           train=False)

    def chained(images):
        def body(carry, _):
            x = images + carry * 1e-12
            if args.no_kmeans:
                out = model.apply(variables, x, None, None, train=False,
                                  method='generate_embeddings')
                return out['embedding'].sum().astype(jnp.float32), None
            out = model.apply(variables, x, None, None, train=False)
            return out['cluster_index'].sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
        return c

    compiled = jax.jit(chained).lower(images).compile()
    float(compiled(images))  # warm

    with jax.profiler.trace(args.out):
        t0 = time.perf_counter()
        float(compiled(images))
        dt = time.perf_counter() - t0
    print(f'{dt / args.iters * 1e3:.2f} ms/iter '
          f'({args.batch / (dt / args.iters):.1f} img/s); trace -> {args.out}')


if __name__ == '__main__':
    main()
