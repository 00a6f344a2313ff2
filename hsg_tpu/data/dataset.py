"""List-file datasets (images + semantic/instance label paths).

Capability parity with reference `hsg/data/datasets/{base_dataset,
unsup_dataset}.py`: list files contain `image [semantic_label]
[instance_label]` path triplets relative to a data root; training applies
mirror -> scale [0.5, 1.5] -> pad-crop; the self-supervised dataset emits
TWO independently augmented views per image (the multiview cosegmentation
input) with photometric jitter. Batches come out as numpy dicts shaped for
the SPMD trainer: views are flattened into the batch dim as consecutive
entries (image i's views at rows i*V .. i*V+V-1).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from hsg_tpu.data import transforms


def read_list_file(data_dir: str, data_list: str):
    """Parse `image [semantic] [instance]` lines -> three path lists."""
    images, semantics, instances = [], [], []
    with open(data_list) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(' ')
            images.append(os.path.join(data_dir, parts[0]))
            if len(parts) > 1:
                semantics.append(os.path.join(data_dir, parts[1]))
            if len(parts) > 2:
                instances.append(os.path.join(data_dir, parts[2]))
    return images, semantics, instances


def _read_image(path):
    img = np.asarray(Image.open(path).convert('RGB'), dtype=np.float32)
    return img / 255.0


def _read_label(path):
    return np.asarray(Image.open(path).convert('I'), dtype=np.int32)


class ListDataset:
    """Supervised-style dataset (used by prototype/inference scripts)."""

    def __init__(self, data_dir, data_list, img_mean=(0, 0, 0),
                 img_std=(1, 1, 1), size=None, random_crop=False,
                 random_scale=False, random_mirror=False, training=False,
                 seed=0):
        (self.image_paths, self.semantic_label_paths,
         self.instance_label_paths) = read_list_file(data_dir, data_list)
        self.img_mean = np.asarray(img_mean, np.float32)
        self.img_std = np.asarray(img_std, np.float32)
        self.size = size
        self.random_crop = random_crop
        self.random_scale = random_scale
        self.random_mirror = random_mirror
        self.training = training
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.image_paths)

    def _load(self, idx):
        image = _read_image(self.image_paths[idx])
        sem = (_read_label(self.semantic_label_paths[idx])
               if self.semantic_label_paths else None)
        inst = (_read_label(self.instance_label_paths[idx])
                if self.instance_label_paths else None)
        return image, sem, inst

    def _augment(self, image, sem, inst):
        label = np.stack([sem, inst], axis=2)
        if self.random_mirror:
            image, label = transforms.random_mirror(image, label, self._rng)
        if self.random_scale:
            image, label = transforms.random_resize(
                image, label, 0.5, 1.5, self._rng)
        if self.random_crop:
            image, label = transforms.random_crop_with_pad(
                image, label, self.size, self.img_mean, 255, self._rng)
        return image, label[..., 0], label[..., 1]

    def __getitem__(self, idx):
        image, sem, inst = self._load(idx)
        if self.training:
            image, sem, inst = self._augment(image, sem, inst)
        elif self.size is not None:
            image = transforms.resize_with_pad(image, self.size, self.img_mean)
            image = image[:self.size[0], :self.size[1]]
        image = (image - self.img_mean) / self.img_std
        return ({'image': image.astype(np.float32)},
                {'semantic_label': sem, 'instance_label': inst}, idx)

    def collate(self, items):
        images = np.stack([it[0]['image'] for it in items])
        sem = (np.stack([it[1]['semantic_label'] for it in items])
               if items[0][1]['semantic_label'] is not None else None)
        inst = (np.stack([it[1]['instance_label'] for it in items])
                if items[0][1]['instance_label'] is not None else None)
        idx = np.asarray([it[2] for it in items], np.int32)
        return {'image': images, 'semantic_label': sem,
                'instance_label': inst, 'index': idx}


class UnsupListDataset(ListDataset):
    """Zeros out semantic labels (unsup_dataset.py:14-55)."""

    def _load(self, idx):
        image = _read_image(self.image_paths[idx])
        h, w = image.shape[:2]
        sem = np.zeros((h, w), np.int32)
        inst = (_read_label(self.instance_label_paths[idx])
                if self.instance_label_paths else None)
        return image, sem, inst


class SelfsupListDataset(UnsupListDataset):
    """THE training dataset: two independently augmented views per image.

    Parity with unsup_dataset.py:58-199: each view gets its own
    mirror/scale/crop plus ColorJitter(0.4, 0.4, 0.4, 0.1)@p=0.8 and
    RandomGrayscale@p=0.2 (optional Gaussian blur). Views are stacked as
    consecutive batch rows sharing an image id.
    """

    def __init__(self, *args, random_grayscale=True, random_blur=False,
                 photometric='host', **kwargs):
        """photometric: 'host' runs ColorJitter/grayscale + normalization
        here; 'device' skips BOTH and emits raw [0, 1] views for the
        on-device stage (hsg_tpu/data/device_aug.py) — the host then only
        decodes + does the cheap geometric ops."""
        super().__init__(*args, **kwargs)
        self.random_grayscale = random_grayscale
        self.random_blur = random_blur
        self.photometric = photometric

    def _one_view(self, image, sem, inst):
        img, s, i = self._augment(image, sem, inst)
        if self.random_grayscale and self.photometric == 'host':
            if self._rng.uniform() < 0.8:
                img = transforms.color_jitter(img, self._rng)
            img = transforms.random_grayscale(img, self._rng, p=0.2)
        if self.random_blur:
            img = transforms.random_gaussian_blur(img, self._rng, p=0.5)
        return img, s, i

    def __getitem__(self, idx):
        image, sem, inst = self._load(idx)
        views = [self._one_view(image, sem, inst) for _ in range(2)]
        if self.photometric == 'device':
            imgs = np.stack([v[0] for v in views]).astype(np.float32)
        else:
            imgs = np.stack([(v[0] - self.img_mean) / self.img_std
                             for v in views]).astype(np.float32)
        sems = np.stack([v[1] for v in views])
        insts = np.stack([v[2] for v in views])
        return ({'image': imgs},
                {'semantic_label': sems, 'instance_label': insts,
                 'image_id': np.asarray([idx, idx], np.int32)}, idx)

    def collate(self, items):
        """Flattens views into the batch dim: `[n_img, V, ...] -> [B, ...]`
        with consecutive views (unsup_dataset.py:179-199)."""
        images = np.concatenate([it[0]['image'] for it in items])
        sem = np.concatenate([it[1]['semantic_label'] for it in items])
        inst = np.concatenate([it[1]['instance_label'] for it in items])
        image_id = np.concatenate([it[1]['image_id'] for it in items])
        return {'image': images.astype(np.float32),
                'semantic_label': sem.astype(np.int32),
                'instance_label': inst.astype(np.int32),
                'image_id': image_id}
