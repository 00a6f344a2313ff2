"""Benchmark: 448x448 inference (embeddings + spherical k-means) img/s/chip.

Measures the reference's headline inference path (SURVEY.md §6 /
BASELINE.md): ResNet-50 FCN OS-8 dense embeddings at 448², L2-normalize,
and the per-image spherical k-means EM (grid 6x6, 10 iterations) — the
pipeline that pyscripts/inference.py runs per window. The reference's
PyTorch implementation has no published throughput; `vs_baseline` is
computed against REFERENCE_IMG_S, an estimate of the reference pipeline
on one V100 (ResNet-50 OS-8 448² forward + serialized per-image EM).

Timing chains ITERS dependent iterations inside one jitted scan and does a
single host readback, so the number is robust to dispatch/transfer latency
(relevant on tunneled TPU runtimes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_IMG_S = 30.0  # est. PyTorch reference, single GPU, 448² OS-8
ITERS = 10


def main():
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

    batch = 32
    hw = 448
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, hw, hw, 3)), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), images[:1], None, None,
                           train=False)

    @jax.jit
    def chained(images):
        def body(carry, _):
            out = model.apply(variables, images + carry * 1e-12, None, None,
                              train=False)
            return out['cluster_index'].sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    float(chained(images))  # compile + warm
    t0 = time.perf_counter()
    float(chained(images))
    dt = (time.perf_counter() - t0) / ITERS
    img_s = batch / dt

    print(json.dumps({
        'metric': '448x448 ResNet50-OS8 inference + spherical k-means',
        'value': round(img_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_s / REFERENCE_IMG_S, 2),
    }))


if __name__ == '__main__':
    main()
