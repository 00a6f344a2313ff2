"""Builds dataset list files (`image [semantic] [superpixel]` triplets).

Companion to the reference's shipped `datasets/{voc12,coco,cityscapes}/*.txt`
lists: walks an image directory and emits one line per image with the
matching semantic-label and superpixel paths (relative to --data_dir),
skipping entries whose label files are missing.

Usage:
  python tools/build_list.py --data_dir /data/VOCdevkit \
      --image_dir VOC2012/JPEGImages --semantic_dir VOC2012/segcls \
      --superpixel_dir VOC2012/sp_rf48 --out datasets/voc12/train_rf.txt
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--data_dir', required=True)
    parser.add_argument('--image_dir', required=True)
    parser.add_argument('--semantic_dir', default=None)
    parser.add_argument('--superpixel_dir', default=None)
    parser.add_argument('--out', required=True)
    parser.add_argument('--image_ext', default='.jpg')
    parser.add_argument('--label_ext', default='.png')
    parser.add_argument('--names', default=None,
                        help='optional file of basenames (one per line) to '
                             'restrict the split')
    args = parser.parse_args()

    img_root = os.path.join(args.data_dir, args.image_dir)
    if args.names:
        with open(args.names) as f:
            names = [line.strip() for line in f if line.strip()]
    else:
        names = sorted(os.path.splitext(n)[0]
                       for n in os.listdir(img_root)
                       if n.endswith(args.image_ext))

    lines = []
    skipped = 0
    for name in names:
        parts = [os.path.join(args.image_dir, name + args.image_ext)]
        ok = True
        for d in (args.semantic_dir, args.superpixel_dir):
            if d is None:
                continue
            rel = os.path.join(d, name + args.label_ext)
            if not os.path.exists(os.path.join(args.data_dir, rel)):
                ok = False
                break
            parts.append(rel)
        if not ok:
            skipped += 1
            continue
        lines.append(' '.join(parts))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'{len(lines)} entries -> {args.out} ({skipped} skipped)')


if __name__ == '__main__':
    main()
