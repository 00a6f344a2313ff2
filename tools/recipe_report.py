"""Report a recipe run from its snapshot dir's tensorboard event files.

Stitches the (possibly kill+resumed, overlapping) event files into one
step-indexed history — later files win on overlap, matching what a
resumed trainer actually executed — and prints:

- per-file step coverage (the resume seams),
- LR-milestone crossings (step-policy drops) with the loss around them,
- loss quantiles over the run and the final window,
- wall-clock per file and sustained ms/step (from event wall times).

This is the measurement behind docs/DESIGN.md's full-recipe-execution
numbers (reference analog: reading the reference's train.py:331-343
print log by eye — bashscripts/cityscapes/train.sh:13-53 recipes have no
reporting tool at all).

Usage:
    python tools/recipe_report.py snapshots/cityscapes_synthetic/fcn_res50_hsg_cs
"""

import argparse
import glob
import os


def load_history(snapshot_dir):
    """-> (per_file, merged) where merged = {tag: {step: (wall, value)}}."""
    from tensorflow.python.summary.summary_iterator import summary_iterator

    per_file = []
    merged = {}
    for path in sorted(glob.glob(os.path.join(snapshot_dir, 'events.out*'))):
        tags = {}
        try:
            for e in summary_iterator(path):
                for v in e.summary.value:
                    tags.setdefault(v.tag, {})[e.step] = (e.wall_time,
                                                          v.simple_value)
        except Exception:
            pass  # live/truncated tail record of a running trainer
        if not tags:
            continue
        per_file.append((os.path.basename(path), tags))
        for tag, by_step in tags.items():
            merged.setdefault(tag, {}).update(by_step)
    return per_file, merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('snapshot_dir')
    ap.add_argument('--loss_tag', default='loss')
    ap.add_argument('--lr_tag', default='lr')
    ap.add_argument('--json', dest='json_out', default=None,
                    help='also write a one-line JSON quality record '
                         '(loss/accuracy trend + milestone mIoU evals) '
                         'for the round-end artifacts (QUALITY_r{N}.json)')
    ap.add_argument('--milestones_dir', default='artifacts/coco_milestones',
                    help='dir of iter-*/QUALITY.json milestone eval records '
                         'merged into the --json output')
    args = ap.parse_args()

    per_file, merged = load_history(args.snapshot_dir)
    if not per_file:
        raise SystemExit(f'no event files with scalars in '
                         f'{args.snapshot_dir}')

    print('== segments (resume seams) ==')
    for name, tags in per_file:
        loss = tags.get(args.loss_tag, {})
        if not loss:
            continue
        ks = sorted(loss)
        wall = loss[ks[-1]][0] - loss[ks[0]][0]
        rate = wall / max(1, ks[-1] - ks[0]) * 1e3
        print(f'  {name}: steps {ks[0]}..{ks[-1]} '
              f'loss {loss[ks[0]][1]:.3f}->{loss[ks[-1]][1]:.3f} '
              f'({wall / 3600:.2f} h logged, ~{rate:.0f} ms/step)')

    loss = {s: v for s, (_, v) in merged.get(args.loss_tag, {}).items()}
    lr = {s: v for s, (_, v) in merged.get(args.lr_tag, {}).items()}
    steps = sorted(loss)

    if lr:
        print('== lr milestones ==')
        lr_steps = sorted(lr)
        prev = lr[lr_steps[0]]
        for s in lr_steps[1:]:
            if lr[s] != prev:
                near = [t for t in steps if abs(t - s) <= 600]
                ls = (f' loss~{sum(loss[t] for t in near) / len(near):.3f}'
                      if near else '')
                print(f'  step {s}: lr {prev:g} -> {lr[s]:g}{ls}')
                prev = lr[s]

    print('== loss ==')
    q = lambda f: loss[steps[min(len(steps) - 1, int(f * len(steps)))]]
    tail = [loss[s] for s in steps[-10:]]
    print(f'  start {loss[steps[0]]:.3f}  25% {q(.25):.3f}  '
          f'50% {q(.5):.3f}  75% {q(.75):.3f}  end {loss[steps[-1]]:.3f} '
          f'(last-10-point mean {sum(tail) / len(tail):.3f})')
    print(f'  logged points {len(steps)}, last step {steps[-1]}')

    # Quality trend without touching the chip: the trainer logs the
    # rolling memory-bank retrieval accuracy every tensorboard_step
    # (train_step.py metrics) — its run-position quartiles show whether
    # the long run is still improving, not just descending in loss.
    acc = {s: v for s, (_, v) in merged.get('accuracy', {}).items()}
    if acc:
        a_steps = sorted(acc)
        aq = lambda f: acc[a_steps[min(len(a_steps) - 1,
                                       int(f * len(a_steps)))]]
        a_tail = [acc[s] for s in a_steps[-10:]]
        print('== retrieval accuracy (run-position quartiles) ==')
        print(f'  start {acc[a_steps[0]]:.4f}  25% {aq(.25):.4f}  '
              f'50% {aq(.5):.4f}  75% {aq(.75):.4f}  '
              f'end {acc[a_steps[-1]]:.4f} '
              f'(last-10-point mean {sum(a_tail) / len(a_tail):.4f})')

    if args.json_out:
        import json

        # Milestone eval records (recipes/coco_milestone_eval.sh writes
        # one QUALITY.json per evaluated snapshot).
        milestones = []
        for p in sorted(glob.glob(os.path.join(
                args.milestones_dir, 'iter-*', 'QUALITY.json'))):
            try:
                with open(p) as f:
                    milestones.append(json.load(f))
            except (OSError, ValueError):
                pass
        milestones.sort(key=lambda m: m.get('milestone', 0))

        record = {
            'snapshot_dir': args.snapshot_dir,
            'last_step': steps[-1] if steps else None,
            'loss_last10_mean': (round(sum(tail) / len(tail), 4)
                                 if steps else None),
            'retrieval_acc_last10_mean': (
                round(sum(a_tail) / len(a_tail), 4) if acc else None),
            'logged_points': len(steps),
            'milestones': milestones,
        }
        with open(args.json_out, 'w') as f:
            json.dump(record, f)
            f.write('\n')
        print(f'quality record -> {args.json_out}')


if __name__ == '__main__':
    main()
