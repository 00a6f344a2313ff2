"""Conv-friendly channel padding A/B (docs/ROADMAP.md perf backlog).

The one remaining named inference-perf candidate after round 3: the
ResNet stem consumes 3-channel images, and 3 is not a TPU-friendly minor
dimension — does zero-padding the input (and the [7,7,C,64] stem kernel)
to 4 or 8 channels change 448² OS-8 inference throughput? Padding with
zeros keeps the math identical (extra kernel columns multiply zeros), so
this is purely a layout/tiling experiment.

Methodology = bench.py's: chain ITERS dependent forwards of the exact
eval pipeline (embeddings + spherical k-means) in one jitted scan, one
host readback.

  python tools/channel_pad_ab.py            # inference A/B on the chip
  HSG_CHAINED=10 python tools/rehearse_recipes.py --stage stage1 ...
      with HSG_PAD_CHANNELS=8               # train-step A/B

Result is recorded in docs/ROADMAP.md / docs/DESIGN.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 10
BATCH, HW = 32, 448


def time_variant(channels):
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
    images = rng.normal(size=(BATCH, HW, HW, 3)).astype(np.float32)
    if channels > 3:
        images = np.concatenate(
            [images, np.zeros((BATCH, HW, HW, channels - 3), np.float32)],
            -1)
    images = jnp.asarray(images)
    variables = model.init(jax.random.PRNGKey(0), images[:1], None, None,
                           train=False)

    from hsg_tpu.utils.timing import time_chained

    def step(images, carry):
        out = model.apply(variables, images + carry * 1e-12, None, None,
                          train=False)
        return out['cluster_index'].sum().astype(jnp.float32)

    return BATCH / time_chained(step, images, ITERS)


def main():
    rows = {}
    for c in (3, 4, 8):
        rows[c] = round(time_variant(c), 1)
        print(json.dumps({'input_channels': c, 'img_per_s': rows[c]}),
              flush=True)
    base = rows[3]
    best = max(rows, key=rows.get)
    print(json.dumps({
        'baseline_img_s': base,
        'best_channels': best,
        'best_img_s': rows[best],
        'speedup': round(rows[best] / base, 4),
    }))


if __name__ == '__main__':
    main()
