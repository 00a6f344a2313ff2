"""One-step parity against the ACTUAL reference implementation.

Every other equivalence test in this suite compares against independent
torch re-implementations. These tests import `/root/reference` itself
(torch, CPU, float64), transplant identical weights into our Flax models
via `models/import_torch.py`, feed an identical 4-view batch, and assert:

- k-means EM assignments equal (`hsg/utils/segsort/common.py:67-97`);
- `segment_by_kmeans` partitions equal up to renumbering
  (`hsg/utils/segsort/common.py:270-408`);
- the full `MultiviewResnetFcn` forward agrees: embeddings bitwise-close,
  segment partitions equal, hierarchy grouping labels equal
  (`hsg/models/embeddings/resnet_fcn_hsg.py:784-970`);
- all loss terms of `predictions/hsg.py:78-227` equal within fp
  tolerance, with the reference's own trainer glue
  (`hsg/models/utils.py`) assembling its targets.

This is the strongest parity certificate obtainable without real
datasets/weights.

The reference is CUDA-only in two incidental ways, shimmed here without
touching its algorithm:
- `tensor.device.index` is None on CPU, and segsort/common.py:376-377
  derives batch offsets from it -> a `torch.Tensor` subclass whose
  `.device` reports index 0;
- `torch.nn.parallel.scatter_gather.gather` raises for CPU tensors (the
  trainer's cross-GPU transport) -> replaced by a same-device concat.
Plus `easydict` (the reference's config dep) is stubbed if absent.

The tests run under jax x64 so both sides compute in float64; fp noise is
then ~1e-12 and every argmax/partition comparison is exact in practice.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

REF = '/root/reference'
if REF not in sys.path:
    sys.path.insert(0, REF)

# --- easydict stub (reference config dep; not installed here) -------------
if 'easydict' not in sys.modules:
    try:
        import easydict  # noqa: F401
    except ImportError:
        class _EasyDict(dict):
            def __init__(self, d=None):
                super().__init__()
                for k, v in (d or {}).items():
                    self[k] = v

            def __setattr__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, _EasyDict):
                    v = _EasyDict(v)
                self[k] = v

            __setitem__ = dict.__setitem__

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        mod = types.ModuleType('easydict')
        mod.EasyDict = _EasyDict
        sys.modules['easydict'] = mod

import hsg.utils.segsort.common as ref_segsort  # noqa: E402
import hsg.models.utils as ref_model_utils  # noqa: E402


# --- CPU shims -------------------------------------------------------------

class _CPUIndexed(torch.Tensor):
    """Reports device index 0 so the reference's CUDA-only batch-offset
    arithmetic (segsort/common.py:376-377) runs on CPU. All ops propagate
    the subclass, so derived tensors keep the property."""

    @property
    def device(self):
        return torch.device('cpu', 0)


def _sub(t):
    return t.as_subclass(_CPUIndexed)


def _cpu_gather(outputs, target_device, dim=0):
    """CPU stand-in for torch.nn.parallel.scatter_gather.gather (which
    asserts CUDA): same contract, trivial same-device concat."""
    if isinstance(outputs[0], dict):
        return {k: _cpu_gather([o[k] for o in outputs], target_device, dim)
                for k in outputs[0]}
    if isinstance(outputs[0], (list, tuple)):
        return type(outputs[0])(
            _cpu_gather(list(group), target_device, dim)
            for group in zip(*outputs))
    return torch.cat(outputs, dim)


@pytest.fixture(autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', old)


@pytest.fixture(autouse=True)
def _patch_gather(monkeypatch):
    monkeypatch.setattr(ref_model_utils.scatter_gather, 'gather',
                        _cpu_gather)


def _segment_mean_dtype_following(x, index):
    """The reference's segment_mean hard-codes float32 accumulators
    (general/common.py:131-138) — incidental, its whole model is f32;
    under the f64 parity run the scatter_add dtype-mismatches. Same
    algorithm, accumulators follow x.dtype."""
    x = x.view(-1, x.shape[-1])
    index = index.view(-1)
    max_index = index.max() + 1
    num = torch.zeros((max_index,), dtype=x.dtype).scatter_add_(
        0, index, torch.ones_like(index, dtype=x.dtype))
    num = torch.where(num == 0, torch.ones_like(num), num)
    idx2 = index.view(-1, 1).expand(-1, x.shape[-1])
    s = torch.zeros((max_index, x.shape[-1]),
                    dtype=x.dtype).scatter_add_(0, idx2, x)
    return s / num.view(-1, 1)


# --- helpers ---------------------------------------------------------------

def _assert_same_partition(ids_a, ids_b, what=''):
    """Two integer label arrays describe the same partition iff the
    (a, b) pair mapping is a bijection."""
    ids_a = np.asarray(ids_a).reshape(-1)
    ids_b = np.asarray(ids_b).reshape(-1)
    assert ids_a.shape == ids_b.shape
    pairs = set(zip(ids_a.tolist(), ids_b.tolist()))
    a_of = {}
    b_of = {}
    for a, b in pairs:
        assert a_of.setdefault(a, b) == b, (
            f'{what}: ref segment {a} split across ours {a_of[a]}/{b}')
        assert b_of.setdefault(b, a) == a, (
            f'{what}: our segment {b} merges ref {b_of[b]}/{a}')


def _make_batch(rng, n_img=2, views=2, size=96, divisor=256):
    """4-view batch: smooth structured images + grid superpixels + an
    ignore stripe, the selfsup data contract (unsup_dataset.py)."""
    b = n_img * views
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing='ij')
    images = np.stack([
        np.stack([np.sin(6.28 * (yy * (i % 3 + 1) + xx)),
                  np.cos(6.28 * (xx * (i % 2 + 1))),
                  yy * xx], -1)
        for i in range(b)
    ]).astype(np.float64)
    images += 0.05 * rng.normal(size=images.shape)
    # Superpixel ids on a 4x4 grid (instance labels), semantic all-zero
    # with a 255-ignore stripe (crop padding in the real pipeline).
    cell = size // 4
    inst = (yy * 4).astype(np.int64).clip(0, 3) * 4 + \
           (xx * 4).astype(np.int64).clip(0, 3)
    inst = np.broadcast_to(inst, (b, size, size)).copy()
    sem = np.zeros((b, size, size), np.int64)
    sem[:, :cell // 2, :] = 255
    image_index = np.repeat(np.arange(n_img), views)
    return images, sem, inst, image_index


# --- 1. k-means EM kernel ----------------------------------------------------

def test_kmeans_with_initial_labels_matches_reference():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(200, 10))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    init = rng.integers(0, 6, size=(200,))

    ref = ref_segsort.kmeans_with_initial_labels(
        torch.from_numpy(emb), torch.from_numpy(init), 6, 10)

    from hsg_tpu.ops import kmeans as our_kmeans
    ours = our_kmeans.kmeans_with_initial_labels(
        jnp.asarray(emb), jnp.asarray(init), 6, 10)

    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_segment_by_kmeans_partition_matches_reference():
    rng = np.random.default_rng(1)
    b, h, w, c = 2, 12, 12, 8
    emb = rng.normal(size=(b, h, w, c))
    labels = rng.integers(0, 3, size=(b, h, w))
    labels[:, :2, :] = 99  # ignore stripe

    ref_out = ref_segsort.segment_by_kmeans(
        _sub(torch.from_numpy(emb.transpose(0, 3, 1, 2)).contiguous()),
        _sub(torch.from_numpy(labels)),
        num_clusters=[3, 3], ignore_index=99, iterations=10)
    (ref_emb, _, ref_labels, ref_cluster_ids, ref_batch_ids) = ref_out

    from hsg_tpu.ops import kmeans as our_kmeans
    s_cap = 64
    ours = our_kmeans.segment_by_kmeans(
        jnp.asarray(emb), jnp.asarray(labels), (3, 3),
        max_segments=s_cap, ignore_index=99, iterations=10)

    valid = np.asarray(ours.pixel_valid)
    np.testing.assert_array_equal(valid, labels.reshape(b, -1) != 99)
    assert bool(np.all(np.asarray(ours.segment_valid).sum(-1) < s_cap)), \
        'cap overflow would invalidate the comparison'

    # Reference keeps only valid pixels, per image in row-major order —
    # exactly our [B, P] arrays masked by pixel_valid.
    our_global = (np.arange(b)[:, None] * s_cap
                  + np.asarray(ours.segment_id))[valid]
    assert our_global.shape[0] == ref_cluster_ids.shape[0]
    np.testing.assert_array_equal(
        np.asarray(ours.label)[valid], ref_labels.numpy())
    _assert_same_partition(ref_cluster_ids.numpy(), our_global,
                           'segment_by_kmeans')
    # Normalized embeddings of surviving pixels agree too.
    np.testing.assert_allclose(
        np.asarray(ours.embedding)[valid], ref_emb.numpy(), atol=1e-12)


# --- 2. full model forward + losses ----------------------------------------

EMB_DIM = 64
N_IMG, VIEWS, SIZE = 2, 2, 96
DIVISOR = 256
S_CAP = 128  # per view; M = 2*128 = the reference's max_num_clusters=256


def _ref_config():
    from hsg.config.default import config as ref_cfg
    cfg = ref_cfg
    cfg.network.embedding_dim = EMB_DIM
    cfg.network.label_divisor = DIVISOR
    cfg.network.kmeans_num_clusters = [2, 2]
    cfg.network.kmeans_iterations = 10
    cfg.dataset.semantic_ignore_index = 255
    cfg.dataset.num_classes = 21
    cfg.train.fine_hrchy_clusters = 8
    cfg.train.coarse_hrchy_clusters = 4
    cfg.train.img_sim_loss_types = 'segsort'
    cfg.train.img_sim_concentration = 16
    cfg.train.img_sim_loss_weight = 1.0
    cfg.train.fine_hrchy_loss_types = 'segsort'
    cfg.train.fine_hrchy_concentration = 16
    cfg.train.fine_hrchy_loss_weight = 0.1
    cfg.train.coarse_hrchy_loss_types = 'segsort'
    cfg.train.coarse_hrchy_concentration = 16
    cfg.train.coarse_hrchy_loss_weight = 0.1
    cfg.train.dmon_loss_types = 'dmon'
    cfg.train.dmon_knn = 2
    cfg.train.dmon_loss_weight = 1.0
    cfg.train.centroid_cont_loss_types = 'segsort'
    cfg.train.centroid_cont_concentration = 16
    cfg.train.centroid_cont_loss_weight = 1.0
    return cfg


def _our_config():
    from hsg_tpu.config import load_config
    cfg = load_config(None)
    cfg.network.backbone_types = 'fcn_50_hsg'
    cfg.network.prediction_types = 'hsg'
    cfg.network.embedding_dim = EMB_DIM
    cfg.network.label_divisor = DIVISOR
    cfg.network.kmeans_num_clusters = (2, 2)
    cfg.network.kmeans_iterations = 10
    cfg.network.max_segments_per_view = S_CAP
    cfg.network.num_views = VIEWS
    cfg.dataset.semantic_ignore_index = 255
    cfg.dataset.num_classes = 21
    for k, v in (('img_sim', 1.0), ('fine_hrchy', 0.1),
                 ('coarse_hrchy', 0.1), ('centroid_cont', 1.0)):
        cfg.train[k + '_loss_types'] = 'segsort'
        cfg.train[k + '_concentration'] = 16
        cfg.train[k + '_loss_weight'] = v
    cfg.train.dmon_loss_types = 'dmon'
    cfg.train.dmon_knn = 2
    cfg.train.dmon_loss_weight = 1.0
    cfg.train.fine_hrchy_clusters = 8
    cfg.train.coarse_hrchy_clusters = 4
    return cfg


def _randomize_bn_stats(model, gen):
    for mod in model.modules():
        if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
            mod.running_mean.copy_(
                0.3 * torch.randn(mod.running_mean.shape, generator=gen,
                                  dtype=mod.running_mean.dtype))
            mod.running_var.copy_(
                0.5 + torch.rand(mod.running_var.shape, generator=gen,
                                 dtype=mod.running_var.dtype))


@pytest.fixture(scope='module')
def forward_pair():
    """Runs the reference model and ours on identical weights + batch.

    Module-scoped: one f64 ResNet-50 forward per side (seconds), shared
    by the forward-, partition-, and loss-parity tests.

    NB module-scoped fixtures instantiate BEFORE function-scoped autouse
    fixtures, so x64 and the segment_mean dtype shim are applied inline
    here (try/finally) rather than relying on the autouse fixtures.
    """
    import hsg.utils.general.common as ref_common
    old_x64 = jax.config.jax_enable_x64
    old_segment_mean = ref_common.segment_mean
    jax.config.update('jax_enable_x64', True)
    ref_common.segment_mean = _segment_mean_dtype_following
    try:
        import hsg.models.embeddings.resnet_fcn_hsg as ref_hsg

        torch.manual_seed(7)
        gen = torch.Generator().manual_seed(11)
        ref_cfg = _ref_config()
        ref_model = ref_hsg.resnet_50_fcn_multiview(ref_cfg)
        ref_model = ref_model.double().eval()
        _randomize_bn_stats(ref_model, gen)

        rng = np.random.default_rng(3)
        images, sem, inst, image_index = _make_batch(
            rng, N_IMG, VIEWS, SIZE, DIVISOR)

        datas = {'image': _sub(torch.from_numpy(
            images.transpose(0, 3, 1, 2)).contiguous())}
        targets = {
            'semantic_label': _sub(torch.from_numpy(sem)),
            'instance_label': _sub(torch.from_numpy(inst)),
            'image_index': _sub(torch.from_numpy(image_index)),
        }
        with torch.no_grad():
            ref_out = ref_model(datas, targets)

        # --- ours, same weights ---
        from hsg_tpu.models import import_torch
        from hsg_tpu.models.hsg import MultiviewResnetFcn

        params, stats = import_torch.torch_hsg_to_flax(
            {k: v for k, v in ref_model.state_dict().items()})
        model = MultiviewResnetFcn(
            backbone_depth=(3, 4, 6, 3), strides=(1, 2, 2, 1),
            dilations=(1, 1, 1, 2), embedding_dim=EMB_DIM,
            label_divisor=DIVISOR, semantic_ignore_index=255,
            kmeans_num_clusters=(2, 2), kmeans_iterations=10,
            max_segments=S_CAP, num_views=VIEWS,
            fine_hrchy_clusters=8, coarse_hrchy_clusters=4,
            dtype=jnp.float64)
        variables = {
            'params': jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float64), params),
            'batch_stats': jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float64), stats),
        }
        our_out = model.apply(
            variables, jnp.asarray(images, jnp.float64),
            jnp.asarray(sem), jnp.asarray(inst), train=False)
        our_out = jax.tree_util.tree_map(np.asarray, our_out)

        yield {
            'ref': {k: (v.numpy() if torch.is_tensor(v) else v)
                    for k, v in ref_out.items()},
            'ours': our_out,
            'batch': (images, sem, inst, image_index),
            'ref_model': ref_model,
            'ref_cfg': ref_cfg,
            'ref_out_torch': ref_out,
            'targets_torch': targets,
        }
    finally:
        jax.config.update('jax_enable_x64', old_x64)
        ref_common.segment_mean = old_segment_mean


@pytest.mark.slow
def test_forward_embeddings_match_reference(forward_pair):
    ref, ours = forward_pair['ref'], forward_pair['ours']
    np.testing.assert_allclose(
        ref['embedding'].transpose(0, 2, 3, 1), ours['embedding'],
        rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        ref['position_embedding'].transpose(0, 2, 3, 1),
        ours['position_embedding'], rtol=1e-9, atol=1e-9)
    # The reference builds its location grid in float32 regardless of the
    # model dtype (generate_location_features), so this one is only
    # f32-close under the f64 run.
    np.testing.assert_allclose(
        ref['local_feature'], ours['local_feature'], rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_forward_partitions_match_reference(forward_pair):
    ref, ours = forward_pair['ref'], forward_pair['ours']
    b = ours['cluster_index'].shape[0]
    valid = ours['pixel_valid']
    our_global = (np.arange(b)[:, None] * S_CAP
                  + ours['cluster_index'])[valid]
    assert our_global.shape[0] == ref['cluster_index'].shape[0]
    _assert_same_partition(ref['cluster_index'], our_global,
                           'model cluster_index')
    # Hierarchy labels are direct argmax ids over transplanted queries:
    # equal outright, not just up to renumbering. Reference keeps valid
    # pixels only, ordered per image.
    for name in ('finehrchy_cluster_index', 'coarsehrchy_cluster_index'):
        np.testing.assert_array_equal(ref[name], ours[name][valid], name)
    # Per-slot grouping labels: reference slots are ordered per image by
    # its unique() pass; ours by (view, segment). Match slots through the
    # prototype vectors (bijective nearest-match), then compare labels.
    ref_protos = ref['nd_prototype'].transpose(0, 2, 1)     # [n, M, C]
    our_protos = ours['nd_prototype']
    ref_valid = ~ref['nd_prototype_padding_mask']
    our_valid = ~ours['nd_prototype_padding_mask']
    assert ref_valid.sum() == our_valid.sum()
    for i in range(ref_protos.shape[0]):
        rp = ref_protos[i][ref_valid[i]]
        op = our_protos[i][our_valid[i]]
        d = np.linalg.norm(rp[:, None] - op[None, :], axis=-1)
        match = d.argmin(1)
        assert np.all(np.sort(match) == np.arange(len(op))), \
            'slot matching is not a bijection'
        # Our prototype pooling runs in float32 (the TPU production
        # dtype) even under the x64 run, so matched slots agree to f32
        # noise, not f64.
        assert d[np.arange(len(rp)), match].max() < 1e-5
        for name in ('finehrchy_nd_prototype_grouping_label',
                     'coarsehrchy_nd_prototype_grouping_label'):
            np.testing.assert_array_equal(
                ref[name][i][ref_valid[i]],
                ours[name][i][our_valid[i]][match], name)


def _assemble_ref_targets(forward_pair):
    """Replicates the reference trainer's target assembly
    (pyscripts/train/train.py:169-268) on the fixture's forward outputs:
    global prototype gather + re-index, hierarchy mapping tables,
    centroid gathers. Returns (ref_out, label_batch) ready for a
    prediction head."""
    ref_out = dict(forward_pair['ref_out_torch'])
    label_batch = dict(forward_pair['targets_torch'])
    dev = torch.device('cpu', 0)

    image_indices = ref_model_utils.gather_and_reorder_image_indices(
        [label_batch['image_index']], dev)
    label_batch['image_index'] = image_indices[0]

    (protos, protos_loc, proto_sem, proto_inst, proto_batch,
     c_inds) = ref_model_utils.gather_clustering_and_update_prototypes(
        [ref_out['cluster_embedding']],
        [ref_out['cluster_embedding_with_loc']],
        [ref_out['cluster_index']],
        [ref_out['cluster_batch_index']],
        [ref_out['cluster_semantic_label']],
        [ref_out['cluster_instance_label']], dev)
    label_batch.update(prototype=protos[0],
                       prototype_with_loc=protos_loc[0],
                       prototype_semantic_label=proto_sem[0],
                       prototype_instance_label=proto_inst[0],
                       prototype_batch_index=proto_batch[0])
    ref_out['cluster_index'] = c_inds[0]

    for name in ('finehrchy', 'coarsehrchy'):
        inds = torch.gather(label_batch['image_index'], 0,
                            ref_out['cluster_batch_index'])
        zeros = torch.zeros_like(ref_out[name + '_cluster_index'])
        _, _, _, _, _, hier_inds = (
            ref_model_utils.gather_clustering_and_update_prototypes(
                [ref_out['cluster_embedding']],
                [ref_out['cluster_embedding_with_loc']],
                [ref_out[name + '_cluster_index']], [inds],
                [zeros], [zeros], dev))
        ref_out[name + '_cluster_index'] = hier_inds[0]
        maps = ref_model_utils.gather_and_update_cluster_mappings(
            [ref_out['cluster_index']],
            [ref_out[name + '_cluster_index']], dev)
        label_batch[name + '_mapping_index'] = maps[0]

    for key in ('finehrchy_nd_prototype_grouping_centroid',
                'coarsehrchy_nd_prototype_grouping_centroid'):
        vals = ref_model_utils.gather_and_update_datas(
            [ref_out[key].clone()], dev)
        label_batch[key] = vals[0]
    return ref_out, label_batch


def _assert_loss_parity(ref_losses, our_losses):
    for key in ('img_sim_loss', 'hrchy_group_loss', 'clustering_loss',
                'accuracy'):
        ref_v = float(ref_losses[key])
        our_v = float(np.asarray(our_losses[key]))
        # Our loss pipeline intentionally computes in float32 (TPU
        # production dtype; e.g. SegSortLoss nca_dtype), so the agreement
        # floor is f32 rounding of an equal value, not f64.
        np.testing.assert_allclose(
            our_v, ref_v, rtol=5e-6, atol=1e-7,
            err_msg=f'{key}: ref {ref_v} vs ours {our_v}')


@pytest.mark.slow
def test_losses_match_reference(forward_pair):
    """All loss terms vs the reference's Hsg head, with the reference's
    own trainer glue assembling its targets (train.py:169-268)."""
    from hsg.models.predictions.hsg import hsg as ref_hsg_pred

    ref_cfg = forward_pair['ref_cfg']
    ref_out, label_batch = _assemble_ref_targets(forward_pair)

    ref_pred = ref_hsg_pred(ref_cfg).double()
    with torch.no_grad():
        ref_losses = ref_pred(ref_out, label_batch, with_loss=True)

    # --- ours ---
    from hsg_tpu.models import predictions as pred_lib
    our_pred = pred_lib.hsg(_our_config())
    _, _, _, image_index = forward_pair['batch']
    our_losses = our_pred(
        forward_pair['ours'], {'image_index': jnp.asarray(image_index)},
        with_loss=True)
    _assert_loss_parity(ref_losses, our_losses)


@pytest.mark.slow
def test_losses_match_reference_hsg_cs(forward_pair):
    """The HsgCs prediction variant (reference predictions/hsg_cs.py:
    DMoN without the per-view K-NN group restriction — its only diff vs
    hsg.py is dropping `nd_prototype_batch_index`) against our
    `variant='cs'` head, on the SAME transplanted forward outputs.

    The embedding-side `_cs` difference (dynamic max_num_clusters,
    resnet_fcn_hsg_cs.py:499-502) is a padding-size choice, invariant to
    loss values, so reusing the fixed-pad forward isolates exactly the
    loss-semantics diff."""
    from hsg.models.predictions.hsg_cs import hsg_cs as ref_cs_pred

    ref_cfg = forward_pair['ref_cfg']
    ref_out, label_batch = _assemble_ref_targets(forward_pair)

    ref_pred = ref_cs_pred(ref_cfg).double()
    with torch.no_grad():
        ref_losses = ref_pred(ref_out, label_batch, with_loss=True)

    from hsg_tpu.models import predictions as pred_lib
    our_pred = pred_lib.hsg_cs(_our_config())
    _, _, _, image_index = forward_pair['batch']
    our_losses = our_pred(
        forward_pair['ours'], {'image_index': jnp.asarray(image_index)},
        with_loss=True)
    _assert_loss_parity(ref_losses, our_losses)
