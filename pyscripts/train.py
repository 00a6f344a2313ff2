"""Training script: pixel embeddings via pixel-segment contrastive learning.

Capability parity with reference `pyscripts/train/train.py` — but the whole
per-iteration orchestration (multi-GPU scatter, prototype gathers, SyncBN)
is one jitted SPMD step over a `data` mesh (see hsg_tpu/train/train_step.py).

Usage mirrors the reference:
  python pyscripts/train.py --data_dir D --data_list L \
      --snapshot_dir S --cfg_path C
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_image_panels(writer, embedding_model, state, batch, config, it):
    """Colorized label + PCA-embedding panels, parity with the reference's
    tensorboard visualization (pyscripts/train/train.py:272-308,
    hsg/utils/general/vis.py)."""
    try:
        import jax
        from hsg_tpu.utils import vis
        # Jit (and cache across calls — shapes are fixed) the two panel
        # forwards: eager apply is minutes-slow on high-dispatch-latency
        # TPU runtimes.
        cache = _write_image_panels.__dict__
        if 'embed_fn' not in cache:
            cache['embed_fn'] = jax.jit(
                lambda v, im: embedding_model.apply(
                    v, im, method=lambda m, im: m.generate_embeddings(im)))
            cache['full_fn'] = jax.jit(
                lambda v, im, s, i: embedding_model.apply(
                    v, im, s, i, train=False))
        variables = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        if 'image' not in batch:
            # Raw-staged batches (tf_raw pipeline): normalize a 2-view
            # stand-in from the first staged canvases.
            crop = int(config.train.crop_size[0])
            img = np.asarray(batch['image_raw'][:2, :crop, :crop],
                             np.float32) / 255.0
            sem = np.zeros(img.shape[:3], np.int32)
            inst = np.asarray(batch['instance_raw'][:2, :crop, :crop],
                              np.int32)
            batch = {'semantic_label': sem, 'instance_label': inst}
            img = ((img - np.asarray(config.network.pixel_means))
                   / np.asarray(config.network.pixel_stds))
        else:
            img = np.asarray(batch['image'][:2])
            if config.train.get('device_photometric', False):
                img = ((img - np.asarray(config.network.pixel_means))
                       / np.asarray(config.network.pixel_stds))
        out = cache['embed_fn'](variables, img)
        emb = np.asarray(out['embedding'])
        rgb = vis.embedding_to_rgb(emb)           # [2, h, w, 3]
        color_map = vis.load_color_map(
            config.dataset.color_map_path or None)
        sem = vis.convert_label_to_color(
            np.asarray(batch['semantic_label'][:2]), color_map)
        inst = vis.convert_label_to_color(
            np.asarray(batch['instance_label'][:2]), color_map)
        for name, panel in (('embedding_pca', rgb),
                            ('semantic_label', sem),
                            ('instance_label', inst)):
            writer.add_image(name, panel[0].transpose(2, 0, 1), it)

        # Hierarchy panels (beyond-reference extra): colorized per-pixel
        # fine/coarse group maps from the clustering transformers.
        sem_in = np.asarray(batch['semantic_label'][:2])
        inst_in = np.asarray(batch['instance_label'][:2])
        full = cache['full_fn'](variables, np.asarray(img, np.float32),
                                sem_in, inst_in)
        h, w = full['embedding'].shape[1:3]
        for key, name in (('finehrchy_cluster_index', 'fine_hierarchy'),
                          ('coarsehrchy_cluster_index',
                           'coarse_hierarchy')):
            if key not in full:
                continue
            m = np.asarray(full[key][:1]).reshape(1, h, w)
            colored = vis.convert_label_to_color(m, color_map)
            writer.add_image(name, colored[0].transpose(2, 0, 1), it)
    except Exception as e:  # vis must never take down training
        print(f'tensorboard image panel failed: {e}', flush=True)


def main():
    from pyscripts.common import (parse_args, build_embedding_model,
                                  build_prediction_model, head_multipliers)
    args, config = parse_args('Training for pixel-wise embeddings.')
    profile_dir = os.environ.get('HSG_TPU_PROFILE_DIR')

    import jax
    import jax.numpy as jnp
    from hsg_tpu.data.dataset import SelfsupListDataset
    from hsg_tpu.data.loader import PrefetchLoader
    from hsg_tpu.parallel import mesh as mesh_lib
    from hsg_tpu.train import checkpoint as ckpt_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib
    from hsg_tpu.models import import_torch

    # Multi-host: join the cluster BEFORE first device use (SURVEY.md §2.5
    # — the same SPMD program spans hosts; only data feeding changes).
    multihost = mesh_lib.maybe_initialize_distributed()

    # Graceful preemption (single-process runs): on SIGTERM, finish the
    # in-flight dispatch, write a snapshot, and exit cleanly — so an
    # eviction costs seconds of progress instead of a full
    # snapshot_step interval. Multi-process runs keep the default
    # die-on-signal behavior: a signal delivered to ONE rank must not
    # start a collective orbax save the other ranks never join.
    _stop_signal: list = []
    if jax.process_count() == 1:
        import signal as _signal
        _signal.signal(_signal.SIGTERM,
                       lambda signum, frame: _stop_signal.append(signum))

    os.makedirs(args.snapshot_dir, exist_ok=True)

    num_devices = len(jax.devices())         # global device count
    images_per_step = config.train.batch_size * num_devices
    num_views = config.network.num_views
    # Each process loads only its local rows of the global batch; the
    # loaders below are sized per-process and seeded per-process so
    # processes read disjoint data.
    local_images = images_per_step // jax.process_count()
    if multihost:
        print(f'multi-host: process {jax.process_index()}/'
              f'{jax.process_count()}, {jax.local_device_count()} local / '
              f'{num_devices} global devices', flush=True)

    data_dir = args.data_dir or config.dataset.data_dir
    data_list = args.data_list or config.dataset.train_data_list
    # On-device photometric stage: host loaders emit raw [0, 1] views and
    # the jitted step runs ColorJitter/grayscale/normalize on the TPU
    # (hsg_tpu/data/device_aug.py) — 3-4x host throughput at stage-1 rates.
    photometric = ('device' if config.train.get('device_photometric', False)
                   else 'host')
    pipeline = config.train.get('data_pipeline', 'python')
    raw_mode = pipeline in ('tf_raw', 'device_resident')
    resident = pipeline == 'device_resident'
    if resident and jax.process_count() > 1:
        # Every process stages the FULL dataset (deterministic list
        # order), so the replicated resident arrays are identical across
        # hosts; batch selection is a pure function of state.step and
        # picks the same global rows everywhere. Each host's HBM must
        # fit the whole dataset — for bigger-than-HBM datasets use the
        # streaming tf_raw pipeline instead.
        print(f'device_resident multi-host: dataset replicated on all '
              f'{jax.process_count()} processes', flush=True)
    if raw_mode:
        # FULLY on-device augmentation: the host only decodes (cached)
        # and stacks fixed-size uint8 canvases; mirror/scale/crop run as
        # fused gathers inside the jitted step (data/device_aug.py
        # `random_geometric_views`) and photometric jitter follows.
        from hsg_tpu.data.tf_pipeline import TfRawLoader
        photometric = 'device'
        if resident:
            # Stage the WHOLE dataset into HBM once; batch selection and
            # all augmentation then run inside the step — zero
            # steady-state host work (sampling is i.i.d. uniform rather
            # than epoch-shuffled). For fits-in-HBM datasets this runs
            # at the step-time bound (docs/DESIGN.md).
            loader = TfRawLoader(
                data_dir, data_list,
                staging_size=config.train.get('staging_size', 512),
                batch_images=min(local_images, 8), shuffle=False,
                seed=0, cache_decoded=False)
        else:
            loader = TfRawLoader(
                data_dir, data_list,
                staging_size=config.train.get('staging_size', 512),
                batch_images=local_images,
                shuffle=config.train.shuffle,
                seed=jax.process_index(),
                cache_decoded=config.train.get('cache_decoded', True))
    elif pipeline == 'tf':
        # High-throughput tf.data path (hsg_tpu/data/tf_pipeline.py).
        from hsg_tpu.data.tf_pipeline import TfDataLoader
        loader = TfDataLoader(
            data_dir, data_list, tuple(config.train.crop_size),
            batch_images=local_images,
            seed=jax.process_index(),
            img_mean=tuple(config.network.pixel_means),
            img_std=tuple(config.network.pixel_stds),
            num_views=num_views,
            random_mirror=config.train.random_mirror,
            random_scale=config.train.random_scale,
            random_crop=config.train.random_crop,
            random_grayscale=config.train.get('random_grayscale', True),
            shuffle=config.train.shuffle,
            photometric=photometric,
            cache_decoded=config.train.get('cache_decoded', False))
    else:
        dataset = SelfsupListDataset(
            data_dir, data_list,
            img_mean=config.network.pixel_means,
            img_std=config.network.pixel_stds,
            size=tuple(config.train.crop_size),
            random_crop=config.train.random_crop,
            random_scale=config.train.random_scale,
            random_mirror=config.train.random_mirror,
            random_grayscale=config.train.get('random_grayscale', True),
            random_blur=config.train.get('random_blur', False),
            photometric=photometric,
            training=True)
        loader = PrefetchLoader(dataset, local_images,
                                shuffle=config.train.shuffle,
                                num_workers=config.num_threads,
                                seed=jax.process_index())

    embedding_model = build_embedding_model(config)
    prediction_model = build_prediction_model(config)

    # Image ids must be unique across the GLOBAL batch (they define the
    # multiview positive pairs); local rows land at global offset
    # process_index * local_rows under make_array_from_process_local_data.
    image_id_offset = jax.process_index() * local_images

    def to_batch(sample):
        # Keep host numpy until shard_batch places it directly onto the
        # mesh (avoids a device-0 staging copy + reshard).
        if raw_mode:
            n_img = sample['image_raw'].shape[0]
            return {
                'image_raw': np.asarray(sample['image_raw'], np.uint8),
                # stays uint16 until on-device widening (train_step)
                'instance_raw': np.asarray(sample['instance_raw'],
                                           np.uint16),
                'true_hw': np.asarray(sample['true_hw'], np.int32),
                'image_index': (np.arange(n_img)
                                + image_id_offset).astype(np.int32),
            }
        rows = sample['image'].shape[0]
        return {
            'image': np.asarray(sample['image'], np.float32),
            'semantic_label': np.asarray(sample['semantic_label'], np.int32),
            'instance_label': np.asarray(sample['instance_label'], np.int32),
            'image_index': (np.arange(rows) // num_views
                            + image_id_offset).astype(np.int32),
        }

    resident_data = None
    if resident:
        # Stage every listed image once (the loader repeats; stop at the
        # list length).
        with open(data_list) as f:
            n_total = sum(1 for line in f if line.strip())
        imgs, insts, hws = [], [], []
        staged = 0
        while staged < n_total:
            s = next(loader)
            imgs.append(np.asarray(s['image_raw'], np.uint8))
            insts.append(np.asarray(s['instance_raw'], np.uint16))
            hws.append(np.asarray(s['true_hw'], np.int32))
            staged += s['image_raw'].shape[0]
        inst_all = np.concatenate(insts)[:n_total]
        if inst_all.max() < 256:
            # Label ids fit a byte: halve the staged label HBM footprint
            # (the step widens to int32 on read either way).
            inst_all = inst_all.astype(np.uint8)
        resident_data = {
            'image_raw': np.concatenate(imgs)[:n_total],
            'instance_raw': inst_all,
            'true_hw': np.concatenate(hws)[:n_total],
        }
        print(f'device-resident dataset: {n_total} images, '
              f'{sum(a.nbytes for a in resident_data.values()) / 2**20:.0f}'
              f' MiB staged to HBM', flush=True)
        # Host-side stand-in for tensorboard panels.
        batch = {'image_raw': resident_data['image_raw'][:2],
                 'instance_raw': resident_data['instance_raw'][:2]
                 .astype(np.int32)}
    else:
        batch = to_batch(next(loader))
    if raw_mode:
        # Model init wants the VIEW shape the step will produce.
        ch, cw = config.train.crop_size
        rows = local_images * num_views
        init_batch = {
            'image': np.zeros((rows, ch, cw, 3), np.float32),
            'semantic_label': np.zeros((rows, ch, cw), np.int32),
            'instance_label': np.zeros((rows, ch, cw), np.int32),
        }
    else:
        init_batch = batch

    hw_mult, hb_mult = head_multipliers(config)
    state, update_fn = ts_lib.create_train_state(
        embedding_model, jax.random.PRNGKey(235), init_batch,
        head_weight_mult=hw_mult, head_bias_mult=hb_mult,
        momentum=config.train.momentum,
        weight_decay=config.train.weight_decay,
        optimizer=config.train.get('optimizer', 'sgd'))

    # Warm start / resume (train.py:113-131; the reference's resume path is
    # bit-rotted — fixed here).
    curr_iter = config.train.begin_iteration
    resume_step = None
    if config.train.resume:
        # begin_iteration 0 + resume -> pick the newest snapshot (simple
        # preemption recovery; the reference has no equivalent). A fresh
        # snapshot dir has nothing to resume — fall through to
        # pretrained/scratch so `resume: true` is safe from step 0.
        resume_step = curr_iter or ckpt_lib.latest_step(args.snapshot_dir)
    if resume_step:
        curr_iter = resume_step
        print(f'Resume training from iteration {curr_iter}')
        state = ckpt_lib.restore_checkpoint(args.snapshot_dir, curr_iter,
                                            template=state)
    elif config.network.pretrained:
        p = config.network.pretrained
        print(f'Loading pre-trained model: {p}')
        if p.endswith('.pth'):
            variables = import_torch.load_pretrained_backbone(
                {'params': state.params, 'batch_stats': state.batch_stats}, p)
            state = state._replace(params=variables['params'],
                                   batch_stats=variables['batch_stats'])
        else:
            prev = ckpt_lib.restore_variables(p, ckpt_lib.latest_step(p))
            merged = ckpt_lib.partial_overlay(
                {'params': state.params, 'batch_stats': state.batch_stats},
                prev)
            state = state._replace(params=merged['params'],
                                   batch_stats=merged['batch_stats'])
    else:
        print('Training from scratch')

    schedule = opt_lib.schedule_from_config(config)
    # Rolling prototype memory bank (reference train.py:328-345); shipped
    # recipes run memory_bank_size=0 (off).
    bank_size = int(config.train.get('memory_bank_size', 0) or 0)
    # donate_argnums=(0,): the previous TrainState's buffers are reused for
    # the new one in place, avoiding a second copy of params + momentum in
    # HBM (the host never touches the stale state). With a bank, donate it
    # too (argnum 3) — it is rewritten every step.
    device_photometric = None
    if photometric == 'device':
        device_photometric = {
            'mean': tuple(config.network.pixel_means),
            'std': tuple(config.network.pixel_stds),
        }
        if not config.train.get('random_grayscale', True):
            device_photometric.update(jitter_p=0.0, grayscale_p=0.0)
        if raw_mode:
            ch, cw = config.train.crop_size
            if ch != cw:
                raise ValueError(
                    f'raw-staged pipelines ({pipeline}) warp to a square '
                    f'crop; got crop_size={ch}x{cw} — use the tf/python '
                    'pipeline for rectangular crops')
            no_scale = not config.train.random_scale
            device_photometric['geometric'] = {
                'crop': int(ch),
                'num_views': num_views,
                'scale_min': (1.0 if no_scale
                              else float(config.train.get('scale_min', 0.5))),
                'scale_max': (1.0 if no_scale
                              else float(config.train.get('scale_max', 1.5))),
                'mirror_p': 0.5 if config.train.random_mirror else 0.0,
                'ignore_index': int(config.dataset.semantic_ignore_index),
            }
    base_step = ts_lib.make_train_step(
        embedding_model, prediction_model, schedule, update_fn,
        grad_clip=config.train.get('grad_clip'),
        use_memory_bank=bank_size > 0,
        device_photometric=device_photometric)

    mesh = mesh_lib.create_mesh()
    donate = (0, 3) if bank_size > 0 else (0,)
    # chain_steps > 1: run N steps per dispatch (lax.scan) to amortize
    # host round-trip latency — only possible when stepping needs no
    # per-iteration host data (device_resident).
    chain = int(config.train.get('chain_steps', 1) or 1)
    if chain > 1 and not resident:
        print('train.chain_steps requires data_pipeline: '
              'device_resident; ignoring', flush=True)
        chain = 1
    chained_fns = {}
    if resident:
        from hsg_tpu.train import resident as res_lib
        n_total = resident_data['image_raw'].shape[0]
        # Epoch-shuffled on-device sampling (hsg_tpu/train/resident.py):
        # same coverage semantics as the host loaders' shuffled epochs.
        # Selection draws the GLOBAL batch (identical pure function of
        # state.step on every process); the sharding constraint then
        # splits its rows across the global mesh.
        res_step = res_lib.make_resident_step(base_step, n_total,
                                              images_per_step, mesh)
        step_fn = jax.jit(res_step, donate_argnums=donate)

        def chained_fn(n):
            if n not in chained_fns:
                chained_fns[n] = jax.jit(
                    res_lib.make_chained_step(res_step, n),
                    donate_argnums=donate)
            return chained_fns[n]

        # mesh_lib.replicate handles both topologies: device_put on one
        # process, make_array_from_process_local_data across processes
        # (every process staged the identical list-ordered dataset).
        resident_data = mesh_lib.replicate(resident_data, mesh)
    else:
        step_fn = jax.jit(base_step, donate_argnums=donate)
    state = mesh_lib.replicate(state, mesh)
    bank = None
    if bank_size > 0:
        from hsg_tpu.train import memory_bank as mb_lib
        # The jitted step writes the GLOBAL batch's prototypes into one
        # bank slot, so size the slot group by global rows.
        local_rows = (local_images * num_views if raw_mode
                      else batch['image'].shape[0])
        group = (local_rows * jax.process_count()
                 * config.network.max_segments_per_view)
        bank = mb_lib.create(bank_size, group,
                             config.network.embedding_dim)
        bank = mesh_lib.replicate(bank, mesh)

    writer = None
    # Host-side artifacts (tensorboard events, snapshots) are written by
    # process 0 only — the state is replicated, so other processes hold
    # identical values and writing from them would just race on the dir.
    is_primary = jax.process_index() == 0
    if config.train.tensorboard_step and is_primary:
        try:
            import tensorboardX
            writer = tensorboardX.SummaryWriter(logdir=args.snapshot_dir)
        except Exception:
            writer = None

    max_iter = config.train.max_iteration
    if args.max_steps is not None:
        max_iter = min(max_iter, curr_iter + args.max_steps)

    # Per-step rng is a pure function of the iteration index so a
    # resumed run draws the same augmentation/dropout randomness as an
    # uninterrupted one (a sequential split chain would restart) — and
    # chained dispatches fold the same way (state.step == it), so any
    # chain_steps setting draws identical randomness.
    rng = jax.random.PRNGKey(1235)
    tb = max(1, config.train.tensorboard_step or 0)
    # Image panels (PCA vis + hierarchy maps) cost a separate device
    # forward plus host SVD/PNG work — on a tunneled chip that is
    # seconds per write. `train.panel_step` decouples their cadence
    # from the cheap scalar logs (0/absent = every tensorboard_step,
    # the reference's coupling, train.py:272-308).
    panel = config.train.get('panel_step', 0) or tb
    # Panels are emitted inside the scalar-log block, so their cadence
    # must be a multiple of tensorboard_step (otherwise off-multiple
    # panel iterations would silently never fire); round up and say so.
    if panel % tb:
        rounded = ((panel + tb - 1) // tb) * tb
        print(f'panel_step {panel} is not a multiple of tensorboard_step '
              f'{tb}; rounding up to {rounded}', flush=True)
        panel = rounded
    snap = config.train.snapshot_step

    def _chain_len(i):
        """Longest chain from iteration `i` that ends ON (not past) the
        next post-step action — log (j % tb == 0), snapshot
        ((j+1) % snap == 0), profiler hook, or max_iter. Shipped recipes
        have chain | tb | snap, so this settles into one compiled
        length."""
        n = min(chain, max_iter - i)
        if config.train.tensorboard_step:
            j = i + (-i) % tb
            n = min(n, j - i + 1)
        if snap:
            j = i + (snap - 1 - i % snap) % snap
            n = min(n, j - i + 1)
        if profile_dir:
            for j in (curr_iter + 2, curr_iter + 4):
                if j >= i:
                    n = min(n, j - i + 1)
        return max(1, n)

    _aligned_programs: set = set()

    def dispatch(fn, *fargs):
        """Run one jitted step program, aligning ranks before its FIRST
        execution in multi-process mode.

        XLA:CPU builds a fresh gloo communicator the first time each
        compiled executable runs a collective, and that TCP rendezvous
        has a short window no flag controls. Ranks can be minutes apart
        at exactly that moment: compile time skews under host load, and
        only the primary compiles the tensorboard-panel forwards. So:
        AOT-compile (lower().compile() populates the jit cache), rejoin
        all ranks over the coordination service (explicit 30-min
        timeout), and only then execute. Single-process: plain call.
        """
        if jax.process_count() > 1 and id(fn) not in _aligned_programs:
            _aligned_programs.add(id(fn))
            fn.lower(*fargs).compile()
            mesh_lib.coordination_barrier('hsg_tpu:first_dispatch')
        return fn(*fargs)

    t0 = time.time()
    it = curr_iter
    while it < max_iter:
        if chain > 1:
            n = _chain_len(it)
            if bank is not None:
                state, metrics, bank = dispatch(
                    chained_fn(n), state, resident_data, rng, bank)
            else:
                state, metrics = dispatch(chained_fn(n), state,
                                          resident_data, rng)
            it = it + n - 1          # iteration the last metrics belong to
        elif resident:
            step_rng = jax.random.fold_in(rng, it)
            if bank is not None:
                state, metrics, bank = dispatch(step_fn, state,
                                                resident_data, step_rng,
                                                bank)
            else:
                state, metrics = dispatch(step_fn, state, resident_data,
                                          step_rng)
        else:
            step_rng = jax.random.fold_in(rng, it)
            sharded = mesh_lib.shard_batch(batch, mesh)
            if bank is not None:
                state, metrics, bank = dispatch(step_fn, state, sharded,
                                                step_rng, bank)
            else:
                state, metrics = dispatch(step_fn, state, sharded,
                                          step_rng)
            # Overlap: prepare the next host batch while the device runs.
            batch = to_batch(next(loader))

        if profile_dir and it == curr_iter + 2:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and it == curr_iter + 4:
            jax.profiler.stop_trace()
            print(f'profiler trace -> {profile_dir}', flush=True)

        if (config.train.tensorboard_step
                and it % max(1, config.train.tensorboard_step) == 0):
            vals = {k: float(v) for k, v in metrics.items()}
            line = ', '.join(f'{k}={v:.4f}' for k, v in sorted(vals.items()))
            dt = time.time() - t0
            print(f'[{it}/{max_iter}] {line} ({dt:.1f}s)', flush=True)
            if writer is not None:
                for k, v in vals.items():
                    writer.add_scalar(k, v, it)
                if it % panel == 0:
                    _write_image_panels(writer, embedding_model, state,
                                        batch, config, it)

        saved_this_iter = bool(
            config.train.snapshot_step
            and ((it + 1) % config.train.snapshot_step == 0
                 or it == max_iter - 1))
        if saved_this_iter:
            # orbax save is a COLLECTIVE operation: every process must
            # call it (it synchronizes internally and only the primary
            # host writes data) — a primary-only call deadlocks or
            # cross-talks with other ranks' syncs in multi-process runs.
            path = ckpt_lib.save_checkpoint(args.snapshot_dir, state)
            if is_primary:
                print(f'snapshot -> {path}', flush=True)
        if _stop_signal:
            # Don't re-save when SIGTERM landed exactly on a snapshot
            # boundary — the state was just written, and a duplicate
            # force-save would only eat into the preemptor's SIGKILL
            # grace window.
            if not saved_this_iter:
                path = ckpt_lib.save_checkpoint(args.snapshot_dir, state)
            print(f'SIGTERM: snapshot -> {path}; exiting cleanly',
                  flush=True)
            it += 1
            break
        it += 1

    if not config.train.snapshot_step:
        ckpt_lib.save_checkpoint(args.snapshot_dir, state)
    loader.close()
    # Rejoin all ranks before process exit (no-op single-process). Only
    # the primary writes tensorboard panels, so on a loaded host a
    # non-primary rank can otherwise reach the interpreter-exit shutdown
    # barrier minutes ahead of rank 0 and blow its short,
    # non-configurable timeout.
    mesh_lib.coordination_barrier('hsg_tpu:train_done')
    # `it` is the first iteration NOT executed (the loop increments it
    # after each step, including the SIGTERM early-exit path), so this
    # counts the steps that actually ran in this leg.
    final_loss = float(metrics["loss"]) if it > curr_iter else float("nan")
    print(f'done: {it - curr_iter} steps, final loss '
          f'{final_loss:.4f}')


if __name__ == '__main__':
    main()
