"""Benchmark the exported serving artifact vs the in-process eval path.

VERDICT round-3 #7: pyscripts/export.py's `jax.export` artifact is
correctness-tested (tests/test_export.py) but was never timed. This
times the SAME serving function (embed -> k-means -> top-20 retrieval ->
per-pixel labels, 448^2 OS-8, bf16 backbone, BN folded) two ways on the
current backend:

  - in-process: the Flax model + checkpoint, jitted directly;
  - artifact:   the deserialized `jax.export` blob (`exported.call`),
                jitted the same way — what a serving host that has only
                jax + the .bin would run.

Methodology = bench.py's: ITERS dependent calls chained in one jitted
lax.scan, one host readback, so per-call dispatch latency is excluded
and any artifact-side overhead shows up as pure compute/graph delta.

  python tools/export_bench.py            # prints one JSON line

Result recorded in docs/DESIGN.md ("Serving export artifact").
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 20
HW = 448
MEMORY = 100_000  # baked-in prototype count (~VOC-scale bank / 4)


def build():
    import jax
    import jax.numpy as jnp
    from hsg_tpu.config import default_config
    from hsg_tpu.eval import export_lib
    from hsg_tpu.models import fcn as fcn_lib
    from hsg_tpu.models import fold as fold_lib

    cfg = default_config()
    cfg.network.embedding_dim = 128
    cfg.network.kmeans_num_clusters = (6, 6)
    cfg.network.kmeans_iterations = 10
    cfg.network.max_segments_per_view = 64
    cfg.network.label_divisor = 2048
    cfg.network.compute_dtype = 'bfloat16'
    cfg.test.crop_size = (HW, HW)
    cfg.test.image_size = HW
    cfg.dataset.num_classes = 21

    model = fcn_lib.resnet_50_fcn_test(cfg)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(HW, HW, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), image[None], None, None,
                           train=False)
    model, variables = fold_lib.fold_inference(model, variables)

    memory = rng.normal(size=(MEMORY, 128)).astype(np.float32)
    memory /= np.linalg.norm(memory, axis=-1, keepdims=True)
    memory_labels = rng.integers(0, 21, size=(MEMORY,)).astype(np.int32)

    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    cfg)
    return fn, image, cfg


def time_serving(fn, image):
    """Images/s of `fn(image, vh, vw) -> u8 labels`, ITERS dependent
    calls in one dispatch (shared methodology: hsg_tpu/utils/timing.py)."""
    import jax.numpy as jnp

    from hsg_tpu.utils.timing import time_chained

    def step(image, carry):
        out = fn(image + carry * 1e-12, jnp.int32(HW), jnp.int32(HW))
        return out.sum().astype(jnp.float32) * 0.0

    return 1.0 / time_chained(step, image, ITERS)


def main():
    from hsg_tpu.eval import export_lib

    fn, image, cfg = build()
    inproc = time_serving(fn, image)
    print(json.dumps({'path': 'in-process', 'img_per_s': round(inproc, 1)}),
          flush=True)

    artifact = '/tmp/export_bench_serving.bin'
    export_lib.export_serving(
        fn, (image, np.int32(HW), np.int32(HW)), artifact)
    size_mb = os.path.getsize(artifact) / 2**20
    loaded = export_lib.load_serving(artifact)
    art = time_serving(loaded, image)
    print(json.dumps({'path': 'artifact', 'img_per_s': round(art, 1),
                      'artifact_mb': round(size_mb, 1)}), flush=True)
    print(json.dumps({
        'inprocess_img_s': round(inproc, 1),
        'artifact_img_s': round(art, 1),
        'artifact_vs_inprocess': round(art / inproc, 4),
        'artifact_mb': round(size_mb, 1),
        'memory_prototypes': MEMORY,
    }))


if __name__ == '__main__':
    main()
