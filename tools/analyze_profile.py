"""Summarize a jax.profiler xplane trace: where does the step go?

Parses the raw .xplane.pb (tensorflow xplane proto) directly — the
tensorboard_plugin_profile converter is version-mismatched against the
installed TF — aggregating device-plane XEvent self-times per HLO op and
grouping them into coarse buckets (conv fwd/bwd, BN-ish elementwise,
matmuls, EM/segment ops, copies/transposes, host gaps). This is the
measurement behind the training-MFU work (round-2 VERDICT weak #1).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/analyze_profile.py /tmp/prof_stage1 [--top 40]
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xspaces(xdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(xdir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        sys.exit(f'no .xplane.pb under {xdir}')
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, 'rb') as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def device_events(space):
    """Yields (line_name, event_name, duration_ps, occurrences) from TPU
    device planes (ignoring host threads)."""
    for plane in space.planes:
        if not re.search(r'TPU|/device', plane.name, re.I):
            continue
        if 'host' in plane.name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                yield (plane.name, line.name, ev_names.get(ev.metadata_id,
                       str(ev.metadata_id)), ev.duration_ps)


BUCKETS = [
    ('conv', r'convolution|conv_general|select-and-scatter'),
    ('matmul/dot', r'\bdot\b|dot_general|einsum'),
    ('scatter/gather', r'scatter|gather|dynamic-update|dynamic-slice'),
    ('reduce', r'reduce'),
    ('sort/topk', r'sort|top-k|topk'),
    ('copy/transpose/reshape', r'copy|transpose|reshape|bitcast|slice|pad|concatenate'),
    ('elementwise/fusion', r'fusion|add|multiply|subtract|divide|select|compare|exp|log|rsqrt|tanh|maximum|minimum|convert|broadcast'),
    ('rng', r'rng|random|threefry'),
    ('infeed/outfeed/transfer', r'infeed|outfeed|transfer|send|recv'),
]

# Classification looks at the INSTRUCTION NAME only (the `%lhs` before
# `=`): XLA names instructions after their op (`%while.8`,
# `%copy-start.12`, `%select-and-scatter`), and fusion names embed the
# root op (`%convert_reduce_fusion.4`, `%add_add_fusion.2`). Matching
# the whole line is wrong — operand text routinely contains
# `%bitcast...` / `%copy...` INPUTS, which mis-buckets matmul fusions
# as copies.
_LHS_RE = re.compile(r'^%?(?P<lhs>[\w.\-]+)')


def bucket_of(name):
    low = name.lower()
    m = _LHS_RE.match(low)
    lhs = m.group('lhs') if m else low
    root = lhs.rsplit('.', 1)[0]          # strip the `.N` suffix
    if root == 'fusion':
        # Generic %fusion.N — the root op is not recoverable from the
        # trace alone; keep it distinct instead of guessing.
        return 'fusion (unknown root)'
    for b, pat in BUCKETS:
        if re.search(pat, root):
            return b
    if root in ('while', 'conditional', 'call'):
        return 'control flow (loops)'
    if root == 'custom-call':
        return 'custom-call (topk/pallas)'
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--line', default=None,
                    help='breakdown line name (default: busiest)')
    args = ap.parse_args()

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    plane_lines = collections.Counter()
    for space in load_xspaces(args.trace_dir):
        for plane, line, name, dur_ps in device_events(space):
            key = (plane, line)
            plane_lines[key] += dur_ps
            per_op[(line, name)] += dur_ps
            per_op_n[(line, name)] += 1

    print('== device planes/lines (total event time, ms) ==')
    for (plane, line), ps in plane_lines.most_common(12):
        print(f'  {plane} :: {line}: {ps / 1e9:.2f} ms')

    # Default to the synchronous "XLA Ops" line: async lines
    # ("Async XLA Ops") record SPANS that include in-flight wait, so
    # their totals over-count overlapped copies/DMAs; the sync line is
    # the exclusive critical-path time. Fall back to the busiest line.
    if not plane_lines:
        sys.exit('no device events found')
    sync_lines = [k[1] for k in plane_lines
                  if k[1] == 'XLA Ops']
    best_line = args.line or (sync_lines[0] if sync_lines else
                              max(plane_lines, key=plane_lines.get)[1])
    ops = {k[1]: v for k, v in per_op.items() if k[0] == best_line}
    ops_n = {k[1]: v for k, v in per_op_n.items() if k[0] == best_line}
    total = sum(ops.values())
    print(f'\n== op breakdown on line "{best_line}" '
          f'(total {total / 1e9:.2f} ms across trace) ==')

    buckets = collections.Counter()
    for name, ps in ops.items():
        buckets[bucket_of(name)] += ps
    for b, ps in buckets.most_common():
        print(f'  {b:<28s} {ps / 1e9:9.2f} ms  {100.0 * ps / total:5.1f}%')

    print(f'\n== top {args.top} ops ==')
    for name, ps in sorted(ops.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f'  {ps / 1e9:9.3f} ms  x{ops_n[name]:<5d} '
              f'[{bucket_of(name):<22s}] {name[:110]}')


if __name__ == '__main__':
    main()
