"""Oracle test of the eval protocol: with class-separable embeddings, the
prototype -> NN-retrieval -> majority-vote pipeline must recover the GT.

Isolates the retrieval mechanics (prototype.py / inference.py semantics)
from training convergence.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hsg_tpu.losses import segsort as segsort_loss
from hsg_tpu.ops import common, kmeans
import pytest

pytestmark = pytest.mark.slow


def _oracle_embeddings(gt, num_classes, dim=16, noise=0.05, seed=0):
    """Unit-norm embeddings clustered by GT class. The class directions are
    FIXED across images (only the noise varies with `seed`)."""
    dir_rng = np.random.default_rng(12345)
    directions = dir_rng.normal(size=(num_classes, dim))
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    emb = directions[gt] + rng.normal(0, noise, (*gt.shape, dim))
    return emb.astype(np.float32)


def test_prototype_then_retrieval_recovers_labels():
    rng = np.random.default_rng(1)
    num_classes, h, w = 4, 32, 32
    # "Training" images -> memory bank. Needs enough prototypes that the
    # reference's top-20 vote has >20 same-class neighbors available
    # (the shipped protocol assumes thousands of memory prototypes).
    memory_protos, memory_labels = [], []
    for i in range(40):
        gt = rng.integers(0, num_classes, (h // 8, w // 8)).repeat(
            8, 0).repeat(8, 1)
        emb = _oracle_embeddings(gt, num_classes, seed=i)
        out = kmeans.segment_by_kmeans(
            jnp.asarray(emb)[None], jnp.asarray(gt)[None], (2, 2),
            max_segments=64, iterations=3)
        s = 64
        protos = common.calculate_prototypes_from_labels(
            out.embedding[0], out.segment_id[0], s,
            out.pixel_valid[0].astype(jnp.float32))
        _, majority = common.find_majority_label_index(
            jnp.asarray(gt).reshape(-1), out.segment_id[0], s, 256,
            valid=out.pixel_valid[0])
        n_seg = int(out.segment_valid[0].sum())
        memory_protos.append(np.asarray(protos)[:n_seg])
        memory_labels.append(np.asarray(majority)[:n_seg])
    memory = jnp.asarray(np.concatenate(memory_protos))
    memory_labels = jnp.asarray(np.concatenate(memory_labels))

    # "Test" image -> retrieval.
    gt = rng.integers(0, num_classes, (h // 8, w // 8)).repeat(8, 0).repeat(8, 1)
    emb = _oracle_embeddings(gt, num_classes, seed=99)
    out = kmeans.segment_by_kmeans(
        jnp.asarray(emb)[None], jnp.zeros((1, h, w), jnp.int32), (4, 4),
        max_segments=64, iterations=5)
    s = 64
    protos = common.calculate_prototypes_from_labels(
        out.embedding[0], out.segment_id[0], s,
        out.pixel_valid[0].astype(jnp.float32))
    _, topk = segsort_loss.top_k_ranking(
        protos, jnp.zeros((s,), jnp.int32), memory, memory_labels, 20)
    majority = segsort_loss.majority_label_from_topk(topk, num_classes)
    pred = np.asarray(majority[out.segment_id[0]]).reshape(h, w)

    acc = (pred == gt).mean()
    assert acc > 0.85, f'oracle retrieval accuracy too low: {acc}'
