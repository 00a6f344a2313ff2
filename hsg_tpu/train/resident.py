"""Device-resident dataset stepping: epoch-shuffled on-device sampling.

`train.data_pipeline: device_resident` stages the whole (fits-in-HBM)
dataset once; batch selection and all augmentation then run inside the
jitted step with zero steady-state host work. Sampling is EPOCH-SHUFFLED
(a fresh `jax.random.permutation` per epoch, consumed in contiguous
slices) to match the coverage semantics of every other pipeline's
shuffled epoch iteration (reference: torch DataLoader(shuffle=True),
pyscripts/train/train.py:63-80) — i.i.d. with-replacement sampling
changes effective data coverage at exactly the small-dataset scales this
mode targets, and can duplicate an image inside one batch (merging its
views' positive pairs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hsg_tpu.parallel import mesh as mesh_lib


def epoch_indices(step, n_total: int, batch_images: int, key):
    """Global image indices for `step` under per-epoch reshuffling.

    Pure function of (step, key): epoch `e = step // steps_per_epoch`
    draws `permutation(fold_in(key, e), n_total)` and step `p` within the
    epoch takes slice `[p*B : (p+1)*B]`. The trailing `n_total % B`
    images of each permutation are dropped (standard drop-remainder
    epoch semantics). When the dataset is smaller than a batch the
    permutation is tiled (duplicates are then unavoidable).
    """
    steps_per_epoch = max(1, n_total // batch_images)
    epoch = step // steps_per_epoch
    pos = step % steps_per_epoch
    perm = jax.random.permutation(jax.random.fold_in(key, epoch), n_total)
    if n_total < batch_images:
        reps = -(-batch_images // n_total)
        perm = jnp.tile(perm, reps)
    return jax.lax.dynamic_slice(
        perm, (pos * batch_images,), (batch_images,)).astype(jnp.int32)


def make_resident_step(base_step, n_total: int, batch_images: int, mesh,
                       perm_seed: int = 4217):
    """Wraps a raw-staged train step with on-device batch selection.

    `base_step(state, batch, rng[, bank])` must consume raw-staged
    batches ('image_raw'/'instance_raw'/'true_hw'/'image_index'); the
    wrapper selects this step's rows from the replicated resident arrays
    and re-shards them over the mesh's batch axis. A memory bank, if
    used, passes through positionally (jit with donate_argnums=(0, 3)).
    """
    key = jax.random.PRNGKey(perm_seed)

    def resident_step(state, data, rng, *bank):
        idx = epoch_indices(state.step, n_total, batch_images, key)
        sel = {
            'image_raw': data['image_raw'][idx],
            'instance_raw': data['instance_raw'][idx].astype(jnp.int32),
            'true_hw': data['true_hw'][idx],
            'image_index': idx,
        }
        sel = jax.lax.with_sharding_constraint(
            sel, mesh_lib.batch_sharding(mesh))
        return base_step(state, sel, rng, *bank)

    return resident_step


def make_chained_step(resident_step, length: int):
    """Runs `length` resident steps in ONE dispatch via `lax.scan`.

    `train.chain_steps`: on high-RTT runtimes each dispatch costs a host
    round-trip (~25-30 ms through this environment's tunnel); chaining
    amortizes it over `length` steps. Only meaningful for the
    device_resident pipeline, where batch selection needs no host.

    `rng` must be the UNFOLDED base key: each scanned step derives its
    per-iteration key as `fold_in(rng, state.step)` — identical to the
    host loop's `fold_in(rng, it)` (state.step == it), so chained and
    unchained runs draw the same randomness and a resumed run is
    bit-reproducible across chain lengths.

    Returns the final state (and bank) plus the LAST step's metrics —
    matching what a host loop stepping one-by-one would observe at the
    chain's final iteration (log lines and tensorboard points land on
    the same iterations with the same values).
    """

    def chained(state, data, rng, *bank):
        def body(carry, _):
            st = carry[0]
            step_rng = jax.random.fold_in(rng, st.step)
            out = resident_step(st, data, step_rng, *carry[1:])
            return (out[0], *out[2:]), out[1]

        carry, metrics = jax.lax.scan(body, (state, *bank), None,
                                      length=length)
        last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
        return (carry[0], last, *carry[1:])

    return chained
