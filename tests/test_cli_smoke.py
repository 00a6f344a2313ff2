"""FAST-tier CLI smoke: every pyscripts/ entry point runs as a real
subprocess.

Round 3 shipped a one-line NameError in pyscripts/prototype.py that only a
subprocess invocation could catch — the fast tier was module-level only, so
the breakage reached the snapshot. This test closes that hole: `--help` for
every script plus a micro train -> prototype -> inference -> export chain
with a [1,1,1,1]-depth backbone at 32² (configs/micro_synthetic.yaml), so
import errors, CLI drift, and glue breakage in any entry point fail the
fast tier (reference entry points: pyscripts/{train/train.py,
inference/{prototype.py,inference.py}, benchmark/benchmark_by_mIoU.py}).
"""

import os
import subprocess
import sys

import pytest

from make_synthetic_data import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ['train.py', 'prototype.py', 'inference.py', 'benchmark.py',
           'export.py', 'demo.py', 'serve.py']


def _env():
    return dict(os.environ, HSG_TPU_PLATFORM='cpu',
                XLA_FLAGS='--xla_force_host_platform_device_count=2',
                PYTHONPATH=REPO + ':' + os.environ.get('PYTHONPATH', ''))


def _run(script, *args, timeout=600):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'pyscripts', script), *args],
        capture_output=True, text=True, env=_env(), timeout=timeout)
    assert proc.returncode == 0, (
        f'{script} {" ".join(args)} failed:\n'
        f'{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}')
    return proc.stdout


def test_cli_help():
    """Every entry point parses --help and exits 0 (run concurrently)."""
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'pyscripts', s), '--help'],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_env())
        for s in SCRIPTS
    ]
    for script, proc in zip(SCRIPTS, procs):
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, f'{script} --help failed:\n{err[-2000:]}'
        assert 'usage' in (out + err).lower(), script


def test_cli_micro_pipeline(tmp_path):
    """1-image micro invocation of the train/eval/export chain."""
    data = str(tmp_path / 'data')
    snap = str(tmp_path / 'snap')
    res = str(tmp_path / 'res')
    make_dataset(data, n_images=2, size=32)
    cfg = os.path.join(REPO, 'configs', 'micro_synthetic.yaml')
    lst = os.path.join(data, 'list.txt')

    out = _run('train.py', '--data_dir', data, '--data_list', lst,
               '--snapshot_dir', snap, '--cfg_path', cfg, '--max_steps', '1')
    assert 'done: 1 steps' in out
    assert 'nan' not in out

    _run('prototype.py', '--data_dir', data, '--data_list', lst,
         '--snapshot_dir', snap, '--save_dir', res + '/train',
         '--kmeans_num_clusters', '2,2', '--label_divisor', '256',
         '--cfg_path', cfg, '--num_images', '1')
    assert len(os.listdir(res + '/train/semantic_prototype')) == 1

    _run('inference.py', '--data_dir', data, '--data_list', lst,
         '--snapshot_dir', snap, '--save_dir', res + '/val',
         '--semantic_memory_dir', res + '/train/semantic_prototype',
         '--kmeans_num_clusters', '2,2', '--label_divisor', '256',
         '--cfg_path', cfg, '--num_images', '1')
    assert len(os.listdir(res + '/val/semantic_gray')) == 1

    out = _run('benchmark.py', '--pred_dir', res + '/val/semantic_gray',
               '--gt_dir', os.path.join(data, 'segcls'),
               '--num_classes', '4', '--string_replace', '')
    assert 'mean IOU' in out or 'mean IoU' in out

    _run('export.py', '--snapshot_dir', snap,
         '--semantic_memory_dir', res + '/train/semantic_prototype',
         '--save_dir', res + '/serving',
         '--kmeans_num_clusters', '2,2', '--label_divisor', '256',
         '--cfg_path', cfg)
    assert any(f.endswith('.bin') for f in os.listdir(res + '/serving'))


@pytest.mark.slow
def test_sigterm_writes_snapshot_and_exits_cleanly(tmp_path):
    """Graceful preemption: SIGTERM mid-run makes train.py finish the
    in-flight step, write a snapshot, and exit 0 — so an eviction (or
    bench.py's _release_tpu taking the chip at round end) costs seconds
    of progress, not a snapshot_step interval."""
    import signal
    import time

    data = str(tmp_path / 'data')
    snap = str(tmp_path / 'snap')
    make_dataset(data, n_images=2, size=32)
    cfg = os.path.join(REPO, 'configs', 'micro_synthetic.yaml')
    lst = os.path.join(data, 'list.txt')

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'pyscripts', 'train.py'),
         '--data_dir', data, '--data_list', lst, '--snapshot_dir', snap,
         '--cfg_path', cfg, '--max_steps', '10000'],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env())
    # Wait until training is actually stepping (first metrics line),
    # then request a graceful stop. The deadline must hold even if the
    # trainer wedges BEFORE printing anything (readline would block
    # forever and never reach a time check), so it is enforced by a
    # watchdog timer that hard-kills the subprocess — the loop then sees
    # EOF and the returncode assertion reports the failure.
    import threading
    killer = threading.Timer(540, proc.kill)
    killer.start()
    lines = []
    try:
        for line in proc.stdout:
            lines.append(line)
            if line.startswith('['):
                break
        proc.send_signal(signal.SIGTERM)
        out = ''.join(lines) + proc.stdout.read()
        proc.wait(timeout=300)
    finally:
        killer.cancel()
    assert proc.returncode == 0, out[-3000:]
    assert 'SIGTERM: snapshot ->' in out, out[-3000:]
    saved = [d for d in os.listdir(snap) if d.startswith('model-')
             and 'tmp' not in d]
    assert saved, out[-3000:]


def test_cli_import_error_is_caught(tmp_path):
    """Meta-test: an injected import-time NameError in a script fails the
    smoke invocation (the exact round-3 escape mode)."""
    bad = tmp_path / 'bad_script.py'
    bad.write_text('import sys\nlen(jax.devices())\n')
    proc = subprocess.run([sys.executable, str(bad)], capture_output=True,
                          text=True, env=_env())
    assert proc.returncode != 0
    assert 'NameError' in proc.stderr
