"""Shared front-half of the eval scripts (prototype.py / inference.py).

Mirrors the reference's eval preprocessing (pyscripts/inference/
inference.py:111-217): resize the larger side to test.image_size, pad to
crop_size, sliding-window embeddings averaged into a full-resolution
canvas, then per-image k-means clustering with padding marked ignore.
"""

from __future__ import annotations

import numpy as np


def make_embed_fn(model, variables, mesh=None):
    """Jitted `[N, ch, cw, 3] -> [N, ch, cw, C]` window embedder
    (resize_as_input upsampling inside, unnormalized).

    With `mesh` (a 1-D `('data',)` device mesh), the window batch is
    sharded across the mesh — sliding-window eval windows are
    embarrassingly parallel, so val-set inference scales linearly over
    ICI with zero collectives (each window's eval-mode forward reads
    only replicated params/running stats). The batch is padded to a
    multiple of the mesh size inside and sliced back, so callers see the
    single-device contract unchanged.
    """
    import jax

    def raw(images):
        out = model.apply(
            variables, images,
            method=lambda m, x: m.generate_embeddings(
                x, resize_as_input=True, train=False))
        return out['embedding']

    if mesh is None:
        return jax.jit(raw)

    from hsg_tpu.parallel import mesh as mesh_lib

    variables = jax.device_put(variables, mesh_lib.replicated(mesh))
    sharded = jax.jit(raw, in_shardings=mesh_lib.batch_sharding(mesh),
                      out_shardings=mesh_lib.batch_sharding(mesh))
    span = mesh.size

    def fn(images):
        import jax.numpy as jnp
        n = images.shape[0]
        pad = (-n) % span
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad,) + images.shape[1:],
                                   images.dtype)], axis=0)
        return sharded(images)[:n]

    return fn


def make_cluster_fn(model, variables):
    """Jitted clustering of a full-resolution embedding canvas."""
    import jax

    @jax.jit
    def fn(embedding, semantic, instance):
        return model.apply(
            variables, embedding, semantic, instance,
            method=lambda m, e, s, i: m.generate_clusters(e, s, i))

    return fn


def preprocess_image(image_np, sem_np, inst_np, config):
    """Resize larger side + pad to crop. Returns (padded image, resized
    (sem, inst), (resize_h, resize_w))."""
    from hsg_tpu.data import transforms

    if config.test.image_size > 0:
        image_np = transforms.resize_with_interpolation(
            image_np, config.test.image_size)
        if sem_np is not None:
            sem_np = transforms.resize_with_interpolation(
                sem_np, config.test.image_size, nearest=True)
        if inst_np is not None:
            inst_np = transforms.resize_with_interpolation(
                inst_np, config.test.image_size, nearest=True)
    rh, rw = image_np.shape[:2]
    image_np = transforms.resize_with_pad(
        image_np, tuple(config.test.crop_size), 0)
    return image_np, (sem_np, inst_np), (rh, rw)


def compute_canvas_and_clusters(embed_fn, cluster_fn, image_np, rh, rw,
                                config):
    """Sliding-window embeddings + k-means on the padded canvas.

    Padding outside (rh, rw) is marked ignore so clustering matches the
    reference's fake-label scheme (inference.py:143-153).
    """
    import jax.numpy as jnp
    from hsg_tpu.eval import sliding

    image = jnp.asarray(image_np, jnp.float32)
    canvas = sliding.sliding_window_embeddings(
        embed_fn, image, tuple(config.test.crop_size),
        tuple(config.test.stride))
    h, w, _ = canvas.shape
    ignore = config.dataset.semantic_ignore_index
    fake_sem = np.full((h, w), ignore, np.int32)
    fake_sem[:rh, :rw] = 0
    fake_inst = fake_sem.copy()
    out = cluster_fn(canvas[None], jnp.asarray(fake_sem)[None],
                     jnp.asarray(fake_inst)[None])
    return canvas, out


def compute_canvas_tta(embed_fn, cluster_fn, image_np, rh, rw, config,
                       scales, use_flip):
    """Multi-scale (+ horizontal flip) TTA canvas + clustering.

    The reference ships a `test.scales` config knob (default.py:88) and an
    image-pyramid helper (general/others.py:10-47) that its inference
    script never uses; here they are wired end-to-end: per (scale, flip)
    variant, sliding-window embeddings are computed, un-flipped, resized to
    the base resolution and averaged before clustering.
    """
    import jax
    import jax.numpy as jnp
    from hsg_tpu.data import transforms
    from hsg_tpu.eval import sliding
    from hsg_tpu.ops import common as ops_common

    crop = tuple(config.test.crop_size)
    stride = tuple(config.test.stride)
    total = None
    count = 0
    for scale in scales:
        if scale == 1.0:
            scaled = image_np
        else:
            h, w = image_np.shape[:2]
            scaled = transforms._resize(image_np, int(round(w * scale)),
                                        int(round(h * scale)), nearest=False)
        for flip in ((False, True) if use_flip else (False,)):
            im = scaled[:, ::-1].copy() if flip else scaled
            im = transforms.resize_with_pad(im, crop, 0)
            canvas = sliding.sliding_window_embeddings(
                embed_fn, jnp.asarray(im, jnp.float32), crop, stride)
            sh, sw = scaled.shape[:2]
            c = canvas[:sh, :sw]
            if flip:
                c = c[:, ::-1]
            c = jax.image.resize(c[None], (1, rh, rw, c.shape[-1]),
                                 method='bilinear')[0]
            c = ops_common.normalize_embedding(c)
            total = c if total is None else total + c
            count += 1
    avg = total / count
    # Pad back to crop for the (static-shape) clustering program.
    h, w = avg.shape[:2]
    pad_h = max(crop[0], h) - h
    pad_w = max(crop[1], w) - w
    avg = jnp.pad(avg, ((0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = avg.shape[:2]
    ignore = config.dataset.semantic_ignore_index
    fake = np.full((ph, pw), ignore, np.int32)
    fake[:rh, :rw] = 0
    out = cluster_fn(avg[None], jnp.asarray(fake)[None],
                     jnp.asarray(fake)[None])
    return avg, out


def filter_existing(todo, artifact_paths, tag='skip_existing'):
    """Drops items whose outputs ALL already exist and load cleanly.

    `artifact_paths(idx)` returns every output of an item as
    `(path, loader)` pairs, where `loader(path)` raises on a write that a
    killed run truncated. An item counts as done only if EVERY artifact
    validates — writes happen in order, so checking just the first-written
    one (the old prototype.py behavior) would permanently skip items whose
    later artifacts were cut off mid-write.
    """
    def _done(idx):
        import os as _os
        for path, loader in artifact_paths(idx):
            if not _os.path.exists(path):
                return False
            try:
                loader(path)
            except Exception:
                return False
        return True

    kept = [i for i in todo if not _done(i)]
    print(f'{tag}: {len(todo) - len(kept)}/{len(todo)} already done',
          flush=True)
    return kept


def eval_image_loop(dataset, todo, process_fn, tag, backlog=8):
    """Prefetch/write scaffolding shared by prototype.py and inference.py.

    Per item: the NEXT image decodes on a worker thread while the device
    computes, and host writes ride the same pool behind a bounded backlog
    (the reference's loop serializes decode, compute, and PNG encode —
    inference.py:111-252). `process_fn(pos, idx, inputs, labels, submit)`
    does the device work and calls `submit(write_fn, *args)` for its host
    writes. Returns `{'wall_s', 'host_load_s', 'device_s', 'images'}`.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    timings = {'host_load_s': 0.0, 'device_s': 0.0,
               'images': len(todo), 'wall_s': 0.0}
    if not todo:
        return timings
    pool = ThreadPoolExecutor(max_workers=2)
    write_futures = []

    def submit(fn, *fn_args):
        write_futures.append(pool.submit(fn, *fn_args))
        if len(write_futures) > backlog:
            write_futures.pop(0).result()

    t_start = time.perf_counter()
    prefetch = pool.submit(dataset.__getitem__, todo[0])
    for pos, idx in enumerate(todo):
        t0 = time.perf_counter()
        inputs, labels, _ = prefetch.result()
        if pos + 1 < len(todo):
            prefetch = pool.submit(dataset.__getitem__, todo[pos + 1])
        t1 = time.perf_counter()
        process_fn(pos, idx, inputs, labels, submit)
        t2 = time.perf_counter()
        timings['host_load_s'] += t1 - t0
        timings['device_s'] += t2 - t1
        if (pos + 1) % 50 == 0 or pos == len(todo) - 1:
            print(f'[{pos + 1}/{len(todo)}] {tag}', flush=True)
    for f in write_futures:
        f.result()
    pool.shutdown()
    timings['wall_s'] = time.perf_counter() - t_start
    return timings


def make_retrieve_fn(config, memory, memory_labels):
    """Jitted per-image retrieval labeler: cluster embeddings -> segment
    prototypes -> top-20 NN against the memory bank -> majority vote ->
    per-pixel labels.

    This IS the eval protocol that produces the mIoU (reference
    `predictions/segsort.py:66-123` semantics; its <=10-way query
    chunking is a memory-saving detail with no effect on results, since
    each query row retrieves independently against the full bank).
    Shared by pyscripts/inference.py and the reference-parity suite so
    the tested path is the production path.
    """
    import jax
    import jax.numpy as jnp
    from hsg_tpu.losses import segsort as segsort_loss
    from hsg_tpu.ops import common as ops_common

    @jax.jit
    def retrieve(cluster_embedding, cluster_index, pixel_valid, seg_valid):
        s = seg_valid.shape[0]
        protos = ops_common.calculate_prototypes_from_labels(
            cluster_embedding, cluster_index, s,
            pixel_valid.astype(cluster_embedding.dtype))
        _, topk_labels = segsort_loss.top_k_ranking(
            protos, jnp.zeros((s,), jnp.int32), memory, memory_labels, 20)
        majority = segsort_loss.majority_label_from_topk(
            topk_labels, config.dataset.num_classes)
        return majority[cluster_index]

    return retrieve
