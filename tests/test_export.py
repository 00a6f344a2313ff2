"""AOT serving export round-trip (hsg_tpu/eval/export_lib.py).

The exported artifact must reproduce the direct jitted pipeline
bit-exactly after serialize -> deserialize, with the memory bank baked
in as constants (no model defs or checkpoint needed at load time).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsg_tpu.config import default_config
from hsg_tpu.eval import export_lib
from hsg_tpu.models import fcn as fcn_lib


def _tiny_setup():
    cfg = default_config()
    cfg.network.embedding_dim = 16
    cfg.network.kmeans_num_clusters = (2, 2)
    cfg.network.kmeans_iterations = 2
    cfg.network.max_segments_per_view = 8
    cfg.network.label_divisor = 255
    cfg.dataset.num_classes = 4
    cfg.dataset.semantic_ignore_index = 255
    cfg.test.crop_size = (32, 32)
    model = fcn_lib.ResnetFcn(
        backbone_depth=(1, 1, 1, 1), embedding_dim=16,
        kmeans_num_clusters=(2, 2), kmeans_iterations=2, max_segments=8)
    image = jnp.zeros((1, 32, 32, 3), jnp.float32)
    sem = jnp.zeros((1, 32, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), image, sem, sem,
                           train=False)
    rng = np.random.default_rng(1)
    memory = rng.normal(size=(24, 16)).astype(np.float32)
    memory /= np.linalg.norm(memory, axis=-1, keepdims=True)
    memory_labels = rng.integers(0, 4, size=(24,))
    return cfg, model, variables, memory, memory_labels


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    cfg, model, variables, memory, memory_labels = _tiny_setup()
    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    cfg)
    example = (jnp.zeros((32, 32, 3), jnp.float32), jnp.int32(32),
               jnp.int32(32))
    artifact = str(tmp_path / 'serving.bin')
    export_lib.export_serving(fn, example, artifact)

    rng = np.random.default_rng(2)
    image = jnp.asarray(rng.normal(size=(32, 32, 3)), jnp.float32)
    vh, vw = jnp.int32(24), jnp.int32(28)
    want = np.asarray(jax.jit(fn)(image, vh, vw))
    got = np.asarray(export_lib.load_serving(artifact)(image, vh, vw))
    np.testing.assert_array_equal(got, want)

    assert got.dtype == np.uint8 and got.shape == (32, 32)
    # Retrieval labels come from the memory bank's label set; padding is 0.
    assert got.max() < cfg.dataset.num_classes
    assert (got[24:, :] == 0).all() and (got[:, 28:] == 0).all()
    # The valid region must not be a constant map for a random input
    # unless retrieval collapsed — guard against an all-padding bug by
    # checking the valid extent actually went through the pipeline.
    assert (np.asarray(jax.jit(fn)(image, jnp.int32(8), jnp.int32(8)))
            [8:, :] == 0).all()


@pytest.mark.slow
def test_export_multiplatform(tmp_path):
    """A ('tpu','cpu') artifact lowers from a CPU host and runs on CPU —
    the shippable cross-platform deployment file."""
    cfg, model, variables, memory, memory_labels = _tiny_setup()
    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    cfg)
    example = (jnp.zeros((32, 32, 3), jnp.float32), jnp.int32(32),
               jnp.int32(32))
    artifact = str(tmp_path / 'serving_mp.bin')
    exported = export_lib.export_serving(fn, example, artifact,
                                         platforms=('tpu', 'cpu'))
    assert exported.platforms == ('tpu', 'cpu')
    got = np.asarray(export_lib.load_serving(artifact)(
        example[0], jnp.int32(24), jnp.int32(28)))
    assert got.shape == (32, 32) and got.dtype == np.uint8


@pytest.mark.slow
def test_export_folded_matches_unfolded(tmp_path):
    """A BN-folded export (pyscripts/export.py default) labels pixels
    identically to the unfolded pipeline — the fold is exact math
    (models/fold.py), and retrieval majority labels are robust to the
    fp rounding shift the re-rounded kernels introduce."""
    from hsg_tpu.models import fold as fold_lib

    cfg, model, variables, memory, memory_labels = _tiny_setup()
    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    cfg)
    fmodel, fvars = fold_lib.fold_inference(model, variables)
    ffn = export_lib.make_serving_fn(fmodel, fvars, memory, memory_labels,
                                     cfg)
    artifact = str(tmp_path / 'serving_folded.bin')
    example = (jnp.zeros((32, 32, 3), jnp.float32), jnp.int32(32),
               jnp.int32(32))
    export_lib.export_serving(ffn, example, artifact)

    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.normal(size=(32, 32, 3)), jnp.float32)
    vh, vw = jnp.int32(24), jnp.int32(28)
    want = np.asarray(jax.jit(fn)(image, vh, vw))
    got = np.asarray(export_lib.load_serving(artifact)(image, vh, vw))
    # The fold is exact math but reorders fp ops, so a near-tie pixel in
    # the retrieval argmax can legitimately flip on another platform/XLA
    # version; tolerate a vanishing mismatch fraction instead of exact
    # label equality.
    assert np.mean(got != want) < 1e-3, (
        f'folded/unfolded labels disagree on {np.mean(got != want):.2%} '
        'of pixels')


def test_export_sidecar(tmp_path):
    cfg, _, _, memory, _ = _tiny_setup()
    meta = export_lib.write_sidecar(str(tmp_path / 'serving.json'), cfg,
                                    memory.shape[0])
    assert meta['crop_size'] == [32, 32]
    assert meta['num_classes'] == 4
    assert meta['memory_prototypes'] == 24
