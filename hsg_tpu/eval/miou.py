"""mIoU / pixel accuracy benchmark (pure numpy).

Capability parity with reference `pyscripts/benchmark/benchmark_by_mIoU.py`:
per-class TP/FP/FN histograms over prediction/GT PNG pairs, per-class IoU
table, mean IoU and mean pixel accuracy. Class-name tables for VOC-21,
Cityscapes-19, Potsdam-6 and Densepose-15 match the reference
(benchmark_by_mIoU.py:92-114).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

CLASS_NAMES = {
    6: ['Road', 'Building', 'Vegetation', 'Tree', 'Car', 'Clutter'],
    15: ['Background', 'Torso', 'R. Hand', 'L. Hand', 'L. Foot', 'R. Foot',
         'R. Thigh', 'L. Thigh', 'R. Leg', 'L. Leg', 'L. Arm', 'R. Arm',
         'L. Forearm', 'R. Forearm', 'Head'],
    19: ['Road', 'Sidewalk', 'Building', 'Wall', 'Fence', 'Pole',
         'Traffic Light', 'Traffic Sign', 'Vegetation', 'Terrain', 'Sky',
         'Person', 'Rider', 'Car', 'Truck', 'Bus', 'Train', 'Motorcycle',
         'Bicycle'],
    21: ['Background', 'Aero', 'Bike', 'Bird', 'Boat', 'Bottle', 'Bus',
         'Car', 'Cat', 'Chair', 'Cow', 'Table', 'Dog', 'Horse', 'MBike',
         'Person', 'Plant', 'Sheep', 'Sofa', 'Train', 'TV'],
}


def iou_stats(pred: np.ndarray, target: np.ndarray, num_classes: int = 21):
    """Per-class (TP+FN, TP+FP, TP) histograms; labels outside
    [0, num_classes) are ignored."""
    keep = (target > -1) & (target < num_classes)
    bins = np.arange(num_classes + 1)
    tp_fn, _ = np.histogram(target[keep], bins=bins)
    tp_fp, _ = np.histogram(pred[keep], bins=bins)
    hit = keep & (pred == target)
    tp, _ = np.histogram(target[hit], bins=bins)
    return tp_fn, tp_fp, tp


def benchmark_directories(pred_dir: str, gt_dir: str, num_classes: int = 21,
                          string_replace: str = ',', verbose: bool = True):
    """Walks pred_dir, pairs GT files by path substitution, and reports
    per-class IoU + mean IoU + pixel accuracy."""
    tp_fn = np.zeros(num_classes, np.float64)
    tp_fp = np.zeros(num_classes, np.float64)
    tp = np.zeros(num_classes, np.float64)
    for dirpath, _, filenames in os.walk(pred_dir):
        for filename in filenames:
            pred_path = os.path.join(dirpath, filename)
            gt_path = pred_path.replace(pred_dir, gt_dir)
            if string_replace and string_replace != ',':
                a, b = string_replace.split(',')
                gt_path = gt_path.replace(a, b)
            pred = np.asarray(Image.open(pred_path).convert('L'), np.uint8)
            gt = np.asarray(Image.open(gt_path).convert('L'), np.uint8)
            f_n, f_p, t = iou_stats(pred, gt, num_classes)
            tp_fn += f_n
            tp_fp += f_p
            tp += t

    iou = tp / (tp_fn + tp_fp - tp + 1e-12) * 100.0
    mean_iou = iou.sum() / num_classes
    pixel_acc = tp.sum() / (tp_fp.sum() + 1e-12)
    if verbose:
        names = CLASS_NAMES.get(num_classes,
                                [str(i) for i in range(num_classes)])
        for i, name in enumerate(names[:num_classes]):
            print(f'class {name:>14s}: {i:02d}, IoU: {iou[i]:2.4f}%')
        print(f'mean IoU: {mean_iou:2.4f}%')
        print(f'mean Pixel Acc: {pixel_acc * 100.0:2.4f}%')
    return {'iou': iou, 'mean_iou': mean_iou, 'pixel_acc': pixel_acc}
