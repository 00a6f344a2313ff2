"""Input-pipeline throughput: host loader rates + sustained train steps/s.

Round-1 finding: one chip consumes ~1600 views/s at stage-1 (224², bf16)
but this 1-vCPU host delivered only ~270 views/s via tf.data (~155 via
the python loader) — end-to-end training was host-bound. Two fixes landed
since: a decoded-image cache (skip file IO + decode after epoch 1) and an
on-device photometric stage (ColorJitter/grayscale/normalize inside the
jitted step — hsg_tpu/data/device_aug.py), which removes the host's most
expensive augmentation ops.

This tool measures, on a synthetic on-disk dataset of COCO-like images:

  --loaders   views/s of each host pipeline config:
                python | tf | tf+cache | tf+cache+device-photometric
  --e2e       sustained end-to-end steps/s of the REAL stage-1 train loop
              (same component calls as pyscripts/train.py: TfDataLoader ->
              shard_batch -> jitted train step) on the chip, compared
              against the step-time bound measured on a fixed resident
              batch.

Run: PYTHONPATH=. python tools/measure_input_pipeline.py --loaders
     PYTHONPATH=. python tools/measure_input_pipeline.py --e2e

Prints ONE JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_data(root, n_images=192, size=480):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests'))
    from make_synthetic_data import make_dataset
    if not os.path.exists(os.path.join(root, 'list.txt')):
        make_dataset(root, n_images=n_images, size=size)
    return root, os.path.join(root, 'list.txt')


def _drain(loader, batches, rows):
    next(loader)  # warm (fills caches/prefetch, triggers tf graph build)
    t0 = time.perf_counter()
    for _ in range(batches):
        next(loader)
    dt = time.perf_counter() - t0
    return rows * batches / dt


def measure_loaders(data_dir, data_list, crop=224, batch_images=16,
                    batches=8):
    from hsg_tpu.data.dataset import SelfsupListDataset
    from hsg_tpu.data.loader import PrefetchLoader
    from hsg_tpu.data.tf_pipeline import TfDataLoader

    rows = batch_images * 2
    out = {}

    ds = SelfsupListDataset(data_dir, data_list, size=(crop, crop),
                            training=True)
    loader = PrefetchLoader(ds, rows, shuffle=True, num_workers=2, seed=0)
    out['python'] = round(_drain(loader, batches, rows), 1)
    loader.close()

    for name, kwargs in (
            ('tf', {}),
            ('tf_cache', dict(cache_decoded=True)),
            ('tf_cache_devaug', dict(cache_decoded=True,
                                     photometric='device'))):
        loader = TfDataLoader(data_dir, data_list, (crop, crop),
                              batch_images=batch_images, seed=0, **kwargs)
        # One pass over the data first so .cache() is populated and the
        # steady state (epoch >= 2) is what gets timed.
        n_warm = 192 // batch_images + 1
        for _ in range(n_warm):
            next(loader)
        out[name] = round(_drain(loader, batches, rows), 1)
        loader.close()

    # Raw staging (fully on-device augmentation): the host emits uint8
    # canvases only; each image feeds num_views views on device.
    from hsg_tpu.data.tf_pipeline import TfRawLoader
    loader = TfRawLoader(data_dir, data_list, staging_size=512,
                         batch_images=batch_images, seed=0)
    n_warm = 192 // batch_images + 1
    for _ in range(n_warm):
        next(loader)
    out['tf_raw'] = round(_drain(loader, batches, batch_images) * 2, 1)
    loader.close()

    print(json.dumps({'measurement': 'host_loader_views_per_s',
                      'crop': crop, **out}), flush=True)
    return out


def measure_e2e(data_dir, data_list, steps=100, raw=False):
    """Stage-1 train loop (configs/coco_stage1.yaml shapes, one chip):
    sustained steps/s vs the step-time bound on a resident batch.

    raw=False: tf+cache+device-photometric pipeline (host does geometry).
    raw=True:  tf_raw staging — the host only decodes/stacks uint8
               canvases; geometry AND photometric run inside the step.
    """
    import jax
    from hsg_tpu.config import default_config, update_config
    from hsg_tpu.data.tf_pipeline import TfDataLoader, TfRawLoader
    from hsg_tpu.parallel import mesh as mesh_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model, head_multipliers)

    config = update_config(default_config(), 'configs/coco_stage1.yaml')
    crop = tuple(config.train.crop_size)
    batch_images = 64                       # 128 views: recipe global batch
    rows = batch_images * config.network.num_views

    if raw:
        loader = TfRawLoader(data_dir, data_list, staging_size=512,
                             batch_images=batch_images, seed=0)

        def to_batch(sample):
            n = sample['image_raw'].shape[0]
            return {
                'image_raw': np.asarray(sample['image_raw'], np.uint8),
                'instance_raw': np.asarray(sample['instance_raw'],
                                           np.uint16),
                'true_hw': np.asarray(sample['true_hw'], np.int32),
                'image_index': np.arange(n, dtype=np.int32),
            }
    else:
        loader = TfDataLoader(
            data_dir, data_list, crop, batch_images=batch_images, seed=0,
            img_mean=tuple(config.network.pixel_means),
            img_std=tuple(config.network.pixel_stds),
            cache_decoded=True, photometric='device')

        def to_batch(sample):
            return {
                'image': np.asarray(sample['image'], np.float32),
                'semantic_label': np.asarray(sample['semantic_label'],
                                             np.int32),
                'instance_label': np.asarray(sample['instance_label'],
                                             np.int32),
                'image_index': (np.arange(rows) // 2).astype(np.int32),
            }

    embedding_model = build_embedding_model(config)
    prediction_model = build_prediction_model(config)
    batch = to_batch(next(loader))
    if raw:
        init_batch = {
            'image': np.zeros((rows, crop[0], crop[1], 3), np.float32),
            'semantic_label': np.zeros((rows, crop[0], crop[1]), np.int32),
            'instance_label': np.zeros((rows, crop[0], crop[1]), np.int32),
        }
    else:
        init_batch = batch
    hw_mult, hb_mult = head_multipliers(config)
    state, update_fn = ts_lib.create_train_state(
        embedding_model, jax.random.PRNGKey(0), init_batch,
        head_weight_mult=hw_mult, head_bias_mult=hb_mult,
        momentum=config.train.momentum,
        weight_decay=config.train.weight_decay)
    schedule = opt_lib.schedule_from_config(config)
    device_photometric = {'mean': tuple(config.network.pixel_means),
                          'std': tuple(config.network.pixel_stds)}
    if raw:
        device_photometric['geometric'] = {'crop': crop[0],
                                           'num_views': 2}
    step_fn = jax.jit(ts_lib.make_train_step(
        embedding_model, prediction_model, schedule, update_fn,
        device_photometric=device_photometric), donate_argnums=(0,))

    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(state, mesh)
    rng = jax.random.PRNGKey(1)

    # -- step-time bound: resident batch, no host pipeline ----------------
    resident = mesh_lib.shard_batch(batch, mesh)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, resident, sub)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    n_bound = max(10, steps // 4)
    for _ in range(n_bound):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, resident, sub)
    jax.block_until_ready(metrics)
    bound_dt = (time.perf_counter() - t0) / n_bound

    # -- sustained: the trainer's actual loop shape -----------------------
    batch = to_batch(next(loader))
    t0 = time.perf_counter()
    for _ in range(steps):
        sharded = mesh_lib.shard_batch(batch, mesh)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, sharded, sub)
        batch = to_batch(next(loader))       # overlaps with device step
    jax.block_until_ready(metrics)
    sus_dt = (time.perf_counter() - t0) / steps

    print(json.dumps({
        'measurement': ('stage1_e2e_sustained_raw' if raw
                        else 'stage1_e2e_sustained'),
        'rows': rows, 'crop': crop[0],
        'step_bound_ms': round(bound_dt * 1e3, 1),
        'sustained_ms': round(sus_dt * 1e3, 1),
        'bound_views_per_s': round(rows / bound_dt, 1),
        'sustained_views_per_s': round(rows / sus_dt, 1),
        'efficiency_vs_bound': round(bound_dt / sus_dt, 3),
        'loss': round(float(metrics['loss']), 4),
    }), flush=True)


def measure_device_resident(data_dir, data_list, steps=150):
    """Device-resident dataset mode: ALL staged canvases live in HBM;
    every step samples its batch, expands views, and augments entirely
    on-device — zero steady-state host involvement. This is the
    fits-in-HBM pipeline endgame (a 192-image synthetic set is ~350 MB),
    and it isolates the train step from this environment's tunneled
    host->device link (~50-80 MB/s, vs >=10 GB/s PCIe on production TPU
    hosts), which caps any streaming pipeline here."""
    import jax
    import jax.numpy as jnp
    from hsg_tpu.config import default_config, update_config
    from hsg_tpu.data.tf_pipeline import TfRawLoader
    from hsg_tpu.parallel import mesh as mesh_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model, head_multipliers)

    config = update_config(default_config(), 'configs/coco_stage1.yaml')
    crop = tuple(config.train.crop_size)
    batch_images = 64
    rows = batch_images * 2

    # Stage the whole dataset through the loader once.
    loader = TfRawLoader(data_dir, data_list, staging_size=512,
                         batch_images=8, seed=0, shuffle=False,
                         cache_decoded=False)
    imgs, insts, hws = [], [], []
    n_seen = 0
    with open(data_list) as f:
        n_total = sum(1 for line in f if line.strip())
    while n_seen < n_total:
        b = next(loader)
        imgs.append(b['image_raw'])
        insts.append(b['instance_raw'].astype(np.uint16))
        hws.append(b['true_hw'])
        n_seen += b['image_raw'].shape[0]
    data = {
        'image_raw': jnp.asarray(np.concatenate(imgs)[:n_total]),
        'instance_raw': jnp.asarray(np.concatenate(insts)[:n_total]),
        'true_hw': jnp.asarray(np.concatenate(hws)[:n_total]),
    }
    loader.close()

    embedding_model = build_embedding_model(config)
    prediction_model = build_prediction_model(config)
    init_batch = {
        'image': np.zeros((rows, crop[0], crop[1], 3), np.float32),
        'semantic_label': np.zeros((rows, crop[0], crop[1]), np.int32),
        'instance_label': np.zeros((rows, crop[0], crop[1]), np.int32),
    }
    hw_mult, hb_mult = head_multipliers(config)
    state, update_fn = ts_lib.create_train_state(
        embedding_model, jax.random.PRNGKey(0), init_batch,
        head_weight_mult=hw_mult, head_bias_mult=hb_mult,
        momentum=config.train.momentum,
        weight_decay=config.train.weight_decay)
    schedule = opt_lib.schedule_from_config(config)
    base_step = ts_lib.make_train_step(
        embedding_model, prediction_model, schedule, update_fn,
        device_photometric={
            'mean': tuple(config.network.pixel_means),
            'std': tuple(config.network.pixel_stds),
            'geometric': {'crop': crop[0], 'num_views': 2},
        })

    def resident_step(state, data, rng):
        rng_sel, rng_step = jax.random.split(rng)
        idx = jax.random.randint(rng_sel, (batch_images,), 0, n_total)
        batch = {
            'image_raw': data['image_raw'][idx],
            'instance_raw': data['instance_raw'][idx].astype(jnp.int32),
            'true_hw': data['true_hw'][idx],
            'image_index': idx.astype(jnp.int32),
        }
        return base_step(state, batch, rng_step)

    step_fn = jax.jit(resident_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, data, sub)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, data, sub)
    loss = float(metrics['loss'])
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        'measurement': 'stage1_e2e_device_resident',
        'rows': rows, 'crop': crop[0], 'dataset_images': int(n_total),
        'sustained_ms': round(dt * 1e3, 1),
        'sustained_views_per_s': round(rows / dt, 1),
        'loss': round(loss, 4),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--loaders', action='store_true')
    ap.add_argument('--e2e', action='store_true')
    ap.add_argument('--e2e_raw', action='store_true')
    ap.add_argument('--e2e_resident', action='store_true')
    ap.add_argument('--root', default='/tmp/hsg_pipe_data')
    ap.add_argument('--n_images', type=int, default=192)
    ap.add_argument('--size', type=int, default=480)
    ap.add_argument('--steps', type=int, default=100)
    args = ap.parse_args()

    data_dir, data_list = make_data(args.root, args.n_images, args.size)
    if args.loaders:
        measure_loaders(data_dir, data_list)
    if args.e2e:
        measure_e2e(data_dir, data_list, steps=args.steps)
    if args.e2e_raw:
        measure_e2e(data_dir, data_list, steps=args.steps, raw=True)
    if args.e2e_resident:
        measure_device_resident(data_dir, data_list, steps=args.steps)


if __name__ == '__main__':
    main()
