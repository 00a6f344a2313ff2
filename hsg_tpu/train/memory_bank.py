"""Trainer-side rolling prototype memory bank.

Capability parity with the reference's per-step memory-bank update
(pyscripts/train/train.py:328-345): after every step the live global
prototypes (+ labels + batch indices) are appended and the bank is
trimmed to `memory_bank_size` steps; stored batch indices are shifted by
the global batch size once per elapsed step so memory entries never
alias live batch indices (train.py:340-345).

TPU re-architecture: the reference keeps a Python list of ragged tensors
on the host; here the bank is a fixed-capacity ring buffer of device
arrays (`capacity = memory_bank_size * G` slots where G is the global
prototype count per step), updated with one `dynamic_update_slice` inside
the jitted train step — no host round-trip, no recompilation, and the
FIFO trim is the ring cursor. Instead of mutating stored indices every
step, each slot-group records its write step and the consumer-side shift
`(current_step - write_step) * batch_size` is computed on read —
identical semantics, O(1) work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MemoryBank(NamedTuple):
    """Ring buffer over `bank_size` slot-groups of `group` prototypes."""
    prototypes: jnp.ndarray        # [bank_size, group, C] float32
    semantic_labels: jnp.ndarray   # [bank_size, group] int32
    batch_indices: jnp.ndarray     # [bank_size, group] int32
    valid: jnp.ndarray             # [bank_size, group] bool
    write_steps: jnp.ndarray       # [bank_size] int32 (-1 = never written)
    cursor: jnp.ndarray            # [] int32, next group to overwrite


def create(bank_size: int, group: int, channels: int) -> MemoryBank:
    """Empty bank holding `bank_size` steps of `group` prototypes each
    (reference `memory_bank_size`, config/default.py knob)."""
    return MemoryBank(
        prototypes=jnp.zeros((bank_size, group, channels), jnp.float32),
        semantic_labels=jnp.full((bank_size, group), -1, jnp.int32),
        batch_indices=jnp.full((bank_size, group), -1, jnp.int32),
        valid=jnp.zeros((bank_size, group), bool),
        write_steps=jnp.full((bank_size,), -1, jnp.int32),
        cursor=jnp.zeros((), jnp.int32))


def update(bank: MemoryBank, prototypes: jnp.ndarray,
           semantic_labels: jnp.ndarray, batch_indices: jnp.ndarray,
           valid: jnp.ndarray, step: jnp.ndarray) -> MemoryBank:
    """Appends one step's global prototype set, evicting the oldest
    (reference train.py:331-338: append + trim-from-front)."""
    protos = jax.lax.stop_gradient(prototypes.astype(jnp.float32))
    i = bank.cursor
    return MemoryBank(
        prototypes=bank.prototypes.at[i].set(protos),
        semantic_labels=bank.semantic_labels.at[i].set(
            semantic_labels.astype(jnp.int32)),
        batch_indices=bank.batch_indices.at[i].set(
            batch_indices.astype(jnp.int32)),
        valid=bank.valid.at[i].set(valid),
        write_steps=bank.write_steps.at[i].set(step.astype(jnp.int32)),
        cursor=(bank.cursor + 1) % bank.prototypes.shape[0])


def as_targets(bank: MemoryBank, current_step: jnp.ndarray,
               batch_size: int) -> dict:
    """Flattens the bank into the `memory_*` target keys consumed by the
    prediction models (predictions/segsort.py:151-181 naming).

    Batch indices are shifted by `(age in steps) * batch_size`, matching
    the reference's once-per-iteration `+= batch_size * num_gpus`
    (train.py:340-345) so memory never matches a live batch index.
    """
    n, g, c = bank.prototypes.shape
    written = bank.write_steps >= 0                              # [n]
    age = jnp.maximum(current_step - bank.write_steps, 1)        # [n]
    shift = (age * batch_size)[:, None]                          # [n, 1]
    shifted = jnp.where(written[:, None],
                        bank.batch_indices + shift, -1)
    return {
        'memory_prototype': bank.prototypes.reshape(n * g, c),
        'memory_prototype_semantic_label':
            bank.semantic_labels.reshape(n * g),
        'memory_prototype_batch_index': shifted.reshape(n * g),
        'memory_prototype_valid':
            (bank.valid & written[:, None]).reshape(n * g),
    }
