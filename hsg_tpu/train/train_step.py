"""The jitted SPMD train step.

Replaces the reference's entire per-iteration orchestration
(pyscripts/train/train.py:157-361): embedding forward, global prototype
formation, losses, backward, and the custom SGD update are ONE compiled
XLA program over the global batch. The reference's six host/device
boundaries per step (SURVEY.md §3.1) collapse to a single dispatch; its
cross-GPU gathers become XLA collectives chosen automatically from the
shardings.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from hsg_tpu.train import optimizer as opt_lib


class TrainState(NamedTuple):
    """Carried training state (a pytree; replicated over the mesh)."""
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(embedding_model, rng, sample_batch,
                       head_weight_mult=10.0, head_bias_mult=20.0,
                       momentum=0.9, weight_decay=1e-4,
                       optimizer: str = 'sgd'):
    """Initializes params/batch-stats and the optimizer ('sgd' or 'adam',
    both with the reference's per-group LR-multiplier semantics).

    init is jitted: eager (op-by-op) execution of the full
    forward+clustering graph is pathologically slow on high-dispatch-
    latency runtimes (measured 380 s vs ~40 s jitted through a tunneled
    TPU) and wasteful everywhere else.
    """
    variables = jax.jit(
        embedding_model.init, static_argnames=('train',))(
        {'params': rng, 'dropout': rng},
        sample_batch['image'], sample_batch.get('semantic_label'),
        sample_batch.get('instance_label'), train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    mults = opt_lib.lr_multipliers(params, head_weight_mult, head_bias_mult)
    mask = opt_lib.weight_decay_mask(params)
    if optimizer == 'adam':
        init_fn, update_fn = opt_lib.adam(
            weight_decay=weight_decay, multipliers=mults, decay_mask=mask)
    else:
        init_fn, update_fn = opt_lib.sgd(momentum, weight_decay, mults, mask)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=init_fn(params))
    return state, update_fn


def make_train_step(embedding_model, prediction_model, schedule,
                    update_fn, grad_clip: float | None = None,
                    use_memory_bank: bool = False,
                    device_photometric: dict | None = None) -> Callable:
    """Builds the pure train-step function (jit it with shardings).

    batch: dict with 'image' `[B, H, W, 3]`, 'semantic_label' /
    'instance_label' `[B, H, W]`, 'image_index' `[B]`; arranged as
    num_views consecutive views per image. `grad_clip` applies the
    reference's element-wise clamp (lib/nn/optimizer.py:182).

    With `use_memory_bank=True` the step takes a `MemoryBank` as 4th arg
    and returns `(new_state, metrics, new_bank)`: memory_* targets are fed
    to the prediction model and the bank rolls forward with this step's
    global prototypes — the reference's trainer-side accumulation loop
    (pyscripts/train/train.py:328-345) fused into the compiled step.

    `device_photometric`: dict with 'mean'/'std' (and optional jitter
    kwargs). When set, batch['image'] is expected RAW [0, 1] and the
    ColorJitter/grayscale/normalize stage runs on-device at the top of
    the step (hsg_tpu/data/device_aug.py) — offloading the host input
    pipeline's most expensive stage. With an additional 'geometric' dict
    ({'crop', 'num_views', 'scale_min', 'scale_max'}), the batch instead
    carries raw staged canvases ('image_raw' uint8 `[B, S, S, 3]`,
    'instance_raw' `[B, S, S]`, 'true_hw' `[B, 2]`) and the ENTIRE view
    pipeline (mirror/scale/crop + jitter) runs as fused gathers inside
    the step — the host only decodes and stacks.
    """
    from hsg_tpu.train import memory_bank as mb_lib

    def run_losses(params, batch_stats, batch, dropout_rng, targets):
        sem = batch.get('semantic_label')
        inst = batch.get('instance_label')
        if device_photometric is not None:
            from hsg_tpu.data import device_aug
            dp = dict(device_photometric)
            geo = dp.pop('geometric', None)
            mean, std = dp.pop('mean'), dp.pop('std')
            if geo is not None:
                geo_rng, aug_rng, dropout_rng = jax.random.split(
                    dropout_rng, 3)
                # Labels stream as uint16 (host bytes); widen on device
                # before label arithmetic (inst * label_divisor).
                # label_pad=0 (not 255): pad pixels are invalidated via
                # the semantic ignore channel below, and 255 would
                # collide with a real superpixel id when
                # max_segments > 255 (PMI 1024-segment mode).
                images, inst, inside = device_aug.random_geometric_views(
                    batch['image_raw'],
                    batch['instance_raw'].astype(jnp.int32),
                    batch['true_hw'], geo_rng, geo['crop'],
                    num_views=geo.get('num_views', 2),
                    scale_min=geo.get('scale_min', 0.5),
                    scale_max=geo.get('scale_max', 1.5),
                    mirror_p=geo.get('mirror_p', 0.5),
                    image_pad=mean, label_pad=0)
                # The reference pads the semantic channel with 255 so
                # crop padding never enters clustering or the selfsup
                # losses (base_dataset.py:135-155); mark pad pixels
                # with the ignore index here.
                ignore = geo.get('ignore_index', 255)
                sem = jnp.where(inside, 0, ignore).astype(jnp.int32)
            else:
                images = batch['image']
                aug_rng, dropout_rng = jax.random.split(dropout_rng)
            images = device_aug.photometric_and_normalize(
                images, aug_rng, mean, std, **dp)
        else:
            images = batch['image']
        outputs, mutated = embedding_model.apply(
            {'params': params, 'batch_stats': batch_stats},
            images,
            sem,
            inst,
            train=True,
            mutable=['batch_stats'],
            rngs={'dropout': dropout_rng})
        pred = prediction_model(outputs, targets, with_loss=True)
        terms = {k: v for k, v in pred.items()
                 if k.endswith('_loss') and v is not None}
        total = sum(terms.values()) if terms else jnp.float32(0)
        aux = dict(terms)
        aux['accuracy'] = pred.get('accuracy', jnp.float32(0))
        return total, (mutated['batch_stats'], aux, outputs)

    def apply_grads(state, loss_out, grads):
        (loss, (new_stats, aux, outputs)) = loss_out
        if grad_clip:
            grads = opt_lib.clip_grad(grads, grad_clip)
        lr = schedule(state.step)
        updates, new_opt_state = update_fn(
            grads, state.opt_state, state.params, lr)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state)
        metrics = {'loss': loss, 'lr': lr}
        metrics.update(aux)
        return new_state, metrics, outputs

    geo_views = None
    if device_photometric and device_photometric.get('geometric'):
        geo_views = device_photometric['geometric'].get('num_views', 2)

    def image_index_targets(batch):
        idx = batch.get('image_index')
        if idx is not None and geo_views:
            # Raw-staged batches carry one row per IMAGE; the loss wants
            # one id per view row (consecutive views share their id).
            idx = jnp.repeat(idx, geo_views)
        return {'image_index': idx}

    if not use_memory_bank:
        def train_step(state: TrainState, batch, dropout_rng):
            targets = image_index_targets(batch)
            loss_out, grads = jax.value_and_grad(
                lambda p: run_losses(p, state.batch_stats, batch,
                                     dropout_rng, targets),
                has_aux=True)(state.params)
            new_state, metrics, _ = apply_grads(state, loss_out, grads)
            return new_state, metrics

        return train_step

    def train_step_mem(state: TrainState, batch, dropout_rng,
                       bank: mb_lib.MemoryBank):
        if geo_views:
            b = batch['image_raw'].shape[0] * geo_views
        else:
            b = batch['image'].shape[0]
        targets = image_index_targets(batch)
        targets.update(mb_lib.as_targets(bank, state.step, b))
        loss_out, grads = jax.value_and_grad(
            lambda p: run_losses(p, state.batch_stats, batch, dropout_rng,
                                 targets),
            has_aux=True)(state.params)
        new_state, metrics, outputs = apply_grads(state, loss_out, grads)

        # Roll the bank forward with this step's global prototypes.
        from hsg_tpu.models.predictions import _flat_global_prototypes
        proto_flat, proto_valid, _ = _flat_global_prototypes(outputs)
        s = outputs['segment_valid'].shape[1]
        seg_sem = jnp.where(outputs['segment_valid'],
                            outputs['segment_semantic_label'],
                            -1).reshape(-1)
        seg_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s)
        new_bank = mb_lib.update(bank, proto_flat, seg_sem, seg_batch,
                                 proto_valid, state.step)
        return new_state, metrics, new_bank

    return train_step_mem
