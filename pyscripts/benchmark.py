"""mIoU benchmark over prediction / ground-truth PNG directories.

Capability parity with reference `pyscripts/benchmark/benchmark_by_mIoU.py`
(same flags: --pred_dir --gt_dir --num_classes --string_replace).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description='Benchmark segmentation predictions')
    parser.add_argument('--pred_dir', type=str, default='')
    parser.add_argument('--gt_dir', type=str, default='')
    parser.add_argument('--num_classes', type=int, default=21)
    parser.add_argument('--string_replace', type=str, default=',')
    args = parser.parse_args()

    from hsg_tpu.eval import miou
    assert os.path.isdir(args.pred_dir), args.pred_dir
    assert os.path.isdir(args.gt_dir), args.gt_dir
    print(args.pred_dir)
    miou.benchmark_directories(args.pred_dir, args.gt_dir,
                               args.num_classes, args.string_replace)


if __name__ == '__main__':
    main()
