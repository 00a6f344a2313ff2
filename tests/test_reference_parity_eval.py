"""Eval-path parity against the ACTUAL reference implementation.

`tests/test_reference_parity.py` certifies the train side; this module
certifies the path that produces the mIoU (VERDICT r4, missing #3):

- the OS-8 test backbone `resnet_50_fcn_test`
  (reference `hsg/models/embeddings/resnet_fcn.py:236-245`),
- the sliding-window embedding canvas of
  `pyscripts/inference/inference.py:160-207` (linspace end-index window
  grid, per-window normalize, overlap-count averaging),
- plain k-means clustering of the canvas with the fake-label scheme
  (`inference.py:143-153, 209-217`),
- `Segsort.predictions` top-20 retrieval + majority voting
  (`hsg/models/predictions/segsort.py:66-123`).

Identical weights are transplanted into our Flax OS-8 model; both sides
run float64 on one small padded image against one shared random memory
bank, and the test asserts: embedding canvases bitwise-close, cluster
partitions equal up to renumbering, and per-pixel predicted labels
IDENTICAL. Our side runs the production code (`eval_common.make_embed_fn
/ make_cluster_fn / make_retrieve_fn`, `hsg_tpu/eval/sliding.py`), so
any drift in our retrieval protocol fails this test.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

# Reuses the reference import path, easydict stub, CPU device-index shim
# and partition comparator from the train-side parity module.
import test_reference_parity as refpar

import hsg.models.embeddings.resnet_fcn as ref_fcn  # noqa: E402
import hsg.utils.general.common as ref_common  # noqa: E402

pytestmark = pytest.mark.slow

EMB_DIM = 32
PAD_H, PAD_W = 48, 64          # padded canvas (test.crop padding)
RH, RW = 40, 52                # valid (resized-image) region
CROP = (32, 32)
STRIDE = (16, 16)
DIVISOR = 2048                 # inference-time label divisor (CLI)
KMEANS = (2, 3)
ITERS = 10
S_CAP = 16
N_MEMORY = 256
NUM_CLASSES = 21


@pytest.fixture(autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', old)


def _ref_config():
    from hsg.config.default import config as cfg
    cfg.network.embedding_dim = EMB_DIM
    cfg.network.label_divisor = DIVISOR
    cfg.network.kmeans_num_clusters = list(KMEANS)
    cfg.network.kmeans_iterations = ITERS
    cfg.dataset.semantic_ignore_index = 255
    cfg.dataset.num_classes = NUM_CLASSES
    # Prediction model constructed for .predictions only; no losses.
    cfg.train.sem_ann_loss_types = 'none'
    cfg.train.sem_occ_loss_types = 'none'
    cfg.train.img_sim_loss_types = 'none'
    cfg.train.feat_aff_loss_types = 'none'
    return cfg


def _make_image():
    """Smooth structured padded image + the reference's fake labels
    (0 inside the resized image, ignore in the pad border)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, PAD_H), np.linspace(0, 1, PAD_W),
                         indexing='ij')
    rng = np.random.default_rng(5)
    image = np.stack([np.sin(6.28 * (2 * yy + xx)),
                      np.cos(6.28 * (3 * xx)),
                      yy * xx], -1).astype(np.float64)
    image += 0.05 * rng.normal(size=image.shape)
    fake = np.full((PAD_H, PAD_W), 255, np.int64)
    fake[:RH, :RW] = 0
    return image, fake


def _make_memory():
    rng = np.random.default_rng(17)
    memory = rng.normal(size=(N_MEMORY, EMB_DIM))
    memory /= np.linalg.norm(memory, axis=-1, keepdims=True)
    labels = rng.integers(0, NUM_CLASSES, size=(N_MEMORY,))
    return memory, labels


def _ref_sliding_canvas(ref_model, image):
    """Replicates inference.py:160-207: linspace end-index patch grid,
    generate_embeddings(resize_as_input=True), L2-normalize, accumulate
    into a canvas, divide by the visit counts."""
    image_t = torch.from_numpy(image.transpose(2, 0, 1))[None]
    crop_h, crop_w = CROP
    stride_h, stride_w = STRIDE
    npatches_h = math.ceil(1.0 * (PAD_H - crop_h) / stride_h) + 1
    npatches_w = math.ceil(1.0 * (PAD_W - crop_w) / stride_w) + 1
    patch_ind_h = np.linspace(crop_h, PAD_H, npatches_h, dtype=np.int32)
    patch_ind_w = np.linspace(crop_w, PAD_W, npatches_w, dtype=np.int32)

    canvas = torch.zeros(1, EMB_DIM, PAD_H, PAD_W, dtype=torch.float64)
    counts = torch.zeros(1, 1, PAD_H, PAD_W, dtype=torch.float64)
    with torch.no_grad():
        for ind_h in patch_ind_h:
            for ind_w in patch_ind_w:
                sh, eh = ind_h - crop_h, ind_h
                sw, ew = ind_w - crop_w, ind_w
                crop_emb = ref_model.generate_embeddings(
                    {'image': image_t[:, :, sh:eh, sw:ew]},
                    resize_as_input=True)['embedding']
                crop_emb = ref_common.normalize_embedding(
                    crop_emb.permute(0, 2, 3, 1).contiguous())
                canvas[:, :, sh:eh, sw:ew] += crop_emb.permute(0, 3, 1, 2)
                counts[:, :, sh:eh, sw:ew] += 1
    return canvas / counts


@pytest.fixture(scope='module')
def eval_pair():
    """Full eval protocol on both sides with identical weights/inputs."""
    old_x64 = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    try:
        torch.manual_seed(13)
        gen = torch.Generator().manual_seed(29)
        ref_cfg = _ref_config()
        ref_model = ref_fcn.resnet_50_fcn_test(ref_cfg).double().eval()
        refpar._randomize_bn_stats(ref_model, gen)

        image, fake = _make_image()
        memory, memory_labels = _make_memory()

        # --- reference side -------------------------------------------
        ref_canvas = _ref_sliding_canvas(ref_model, image)
        fake_t = refpar._sub(torch.from_numpy(fake)[None])
        with torch.no_grad():
            ref_clusters = ref_model.generate_clusters(
                refpar._sub(ref_canvas), fake_t, fake_t)

        from hsg.models.predictions.segsort import segsort as ref_seg_pred
        ref_pred_model = ref_seg_pred(ref_cfg).double()
        with torch.no_grad():
            ref_pred, _ = ref_pred_model.predictions(
                ref_clusters,
                {'semantic_memory_prototype':
                     torch.from_numpy(memory),
                 'semantic_memory_prototype_label':
                     torch.from_numpy(memory_labels)})
        ref_pred_img = ref_pred.view(RH, RW).numpy()

        # --- our side (production eval components) --------------------
        from hsg_tpu.config import load_config
        from hsg_tpu.eval import sliding
        from hsg_tpu.models import import_torch
        from hsg_tpu.models.fcn import ResnetFcn
        from pyscripts import eval_common

        params, stats = import_torch.torch_hsg_to_flax(
            dict(ref_model.state_dict()))
        model = ResnetFcn(
            backbone_depth=(3, 4, 6, 3), strides=(1, 2, 1, 1),
            dilations=(1, 1, 2, 4), embedding_dim=EMB_DIM,
            label_divisor=DIVISOR, semantic_ignore_index=255,
            kmeans_num_clusters=KMEANS, kmeans_iterations=ITERS,
            max_segments=S_CAP, dtype=jnp.float64)
        variables = {
            'params': jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float64), params),
            'batch_stats': jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float64), stats),
        }
        embed_fn = eval_common.make_embed_fn(model, variables)
        cluster_fn = eval_common.make_cluster_fn(model, variables)

        our_canvas = sliding.sliding_window_embeddings(
            embed_fn, jnp.asarray(image), CROP, STRIDE)
        out = cluster_fn(our_canvas[None], jnp.asarray(fake)[None],
                         jnp.asarray(fake)[None])
        out = jax.tree_util.tree_map(np.asarray, out)

        cfg = load_config(None)
        cfg.dataset.num_classes = NUM_CLASSES
        retrieve = eval_common.make_retrieve_fn(
            cfg, jnp.asarray(memory), jnp.asarray(memory_labels))
        our_pred = np.asarray(retrieve(
            out['cluster_embedding'][0], out['cluster_index'][0],
            out['pixel_valid'][0], out['segment_valid'][0]))
        our_pred_img = our_pred.reshape(PAD_H, PAD_W)[:RH, :RW]

        yield {
            'ref_canvas': ref_canvas.numpy(),
            'our_canvas': np.asarray(our_canvas),
            'ref_clusters': {k: v.numpy()
                             for k, v in ref_clusters.items()},
            'our_clusters': out,
            'fake': fake,
            'ref_pred_img': ref_pred_img,
            'our_pred_img': our_pred_img,
        }
    finally:
        jax.config.update('jax_enable_x64', old_x64)


def test_sliding_canvas_matches_reference(eval_pair):
    """inference.py:160-207 semantics: same window grid, same normalize-
    then-average accumulation, f64-tight."""
    ref = eval_pair['ref_canvas'][0].transpose(1, 2, 0)
    np.testing.assert_allclose(eval_pair['our_canvas'], ref,
                               rtol=1e-9, atol=1e-9)


def test_eval_partition_matches_reference(eval_pair):
    """Plain-FCN generate_clusters on the canvas (resnet_fcn.py:90-148)
    partitions the valid pixels identically up to renumbering."""
    valid = eval_pair['our_clusters']['pixel_valid'][0]
    np.testing.assert_array_equal(
        valid.reshape(PAD_H, PAD_W), eval_pair['fake'] != 255)
    ours = eval_pair['our_clusters']['cluster_index'][0][valid]
    ref = eval_pair['ref_clusters']['cluster_index']
    assert ours.shape[0] == ref.shape[0]
    refpar._assert_same_partition(ref, ours, 'eval cluster_index')


def test_eval_path_matches_reference(eval_pair):
    """Per-pixel predicted labels of the full retrieval protocol
    (predictions/segsort.py:66-123 -> inference.py canvas slice) are
    IDENTICAL."""
    np.testing.assert_array_equal(eval_pair['ref_pred_img'],
                                  eval_pair['our_pred_img'])
