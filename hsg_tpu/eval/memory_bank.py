"""Prototype memory-bank IO (.npy dicts, one per training image).

Capability parity with reference `hsg/utils/segsort/others.py:11-41`
(load) and pyscripts/inference/prototype.py:204-208 (save): each file is a
pickled dict {'prototype': [N, C] float32, 'prototype_label': [N] int}.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def save_memory_bank(path: str, prototypes: np.ndarray,
                     prototype_labels: np.ndarray) -> None:
    np.save(path, {'prototype': np.asarray(prototypes, np.float32),
                   'prototype_label': np.asarray(prototype_labels,
                                                 np.int64)})


def load_memory_banks(memory_dir: str):
    """Concatenates all stored prototypes + labels in the directory."""
    paths = sorted(glob.glob(os.path.join(memory_dir, '*.npy')))
    assert paths, f'No memory stored in {memory_dir}'
    protos, labels = [], []
    for p in paths:
        data = np.load(p, allow_pickle=True).item()
        protos.append(data['prototype'])
        labels.append(data['prototype_label'])
    return (np.concatenate(protos, 0).astype(np.float32),
            np.concatenate(labels, 0).astype(np.int64))
