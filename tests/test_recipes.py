"""Shell-level tests for the continuation machinery
(recipes/coco_watchdog.sh staging + recipes/coco_guard.sh wiring).

The staged resume point under artifacts/coco_stage1_resume/ is the only
thing that survives between rounds (snapshots/ and /tmp are wiped), so
the staging function's failure modes — misordered snapshots, destroyed
last-good copy on a failed cp — are round-losing bugs. These tests
drive the actual shell function extracted from the script.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_copy_newest(snapdir, dest):
    """Source copy_newest() from the watchdog script and run one pass."""
    script = (
        f'SNAPDIR="{snapdir}"; DEST="{dest}"\n'
        'source <(sed -n "/^copy_newest()/,/^}/p" '
        f'"{REPO}/recipes/coco_watchdog.sh")\n'
        'copy_newest\n')
    return subprocess.run(['bash', '-c', script], capture_output=True,
                          text=True)


def _make_snapshot(snapdir, tag, complete=True, payload='data'):
    d = os.path.join(snapdir, tag)
    os.makedirs(os.path.join(d, 'd'), exist_ok=True)
    with open(os.path.join(d, 'd', 'blob'), 'w') as f:
        f.write(payload)
    if complete:
        with open(os.path.join(d, '_CHECKPOINT_METADATA'), 'w') as f:
            f.write('x')


def test_watchdog_stages_numerically_newest_despite_dashed_path(tmp_path):
    # A '-' in the snapshot dir path must not break iteration ordering
    # (the sort runs on basenames).
    snapdir = str(tmp_path / 'run-2' / 'stage1')
    dest = str(tmp_path / 'dest')
    for tag in ('model-5000', 'model-45000', 'model-9000'):
        _make_snapshot(snapdir, tag)
    with open(os.path.join(snapdir, 'config.yaml'), 'w') as f:
        f.write('cfg: 1\n')

    out = _run_copy_newest(snapdir, dest)
    assert out.returncode == 0, out.stderr
    assert os.path.isdir(os.path.join(dest, 'model-45000'))
    assert os.path.isfile(os.path.join(dest, 'config.yaml'))
    progress = open(os.path.join(dest, 'PROGRESS')).read()
    assert 'model-45000 staged' in progress

    # Idempotent: a second pass with no new snapshot changes nothing.
    _run_copy_newest(snapdir, dest)
    assert open(os.path.join(dest, 'PROGRESS')).read() == progress

    # A newer snapshot replaces the staging and APPENDS to PROGRESS.
    _make_snapshot(snapdir, 'model-100000')
    _run_copy_newest(snapdir, dest)
    assert os.path.isdir(os.path.join(dest, 'model-100000'))
    assert not os.path.isdir(os.path.join(dest, 'model-45000'))
    progress2 = open(os.path.join(dest, 'PROGRESS')).read()
    assert 'model-45000 staged' in progress2      # history preserved
    assert 'model-100000 staged' in progress2
    # No leftover swap dirs.
    assert not os.path.exists(dest + '.tmp')
    assert not os.path.exists(dest + '.old')


def test_watchdog_ignores_incomplete_snapshots(tmp_path):
    snapdir = str(tmp_path / 'stage1')
    dest = str(tmp_path / 'dest')
    _make_snapshot(snapdir, 'model-5000', complete=True)
    # Newer but uncommitted (no _CHECKPOINT_METADATA) and orbax tmp dirs
    # must be skipped.
    _make_snapshot(snapdir, 'model-10000', complete=False)
    _make_snapshot(snapdir, 'model-15000.orbax-checkpoint-tmp-123',
                   complete=True)
    _run_copy_newest(snapdir, dest)
    assert os.path.isdir(os.path.join(dest, 'model-5000'))
    assert not os.path.isdir(os.path.join(dest, 'model-10000'))


def test_watchdog_failed_copy_keeps_previous_staging(tmp_path):
    snapdir = str(tmp_path / 'stage1')
    dest = str(tmp_path / 'dest')
    _make_snapshot(snapdir, 'model-5000')
    _run_copy_newest(snapdir, dest)
    assert os.path.isdir(os.path.join(dest, 'model-5000'))

    # Simulate an I/O failure (disk full, read error) for the newer
    # snapshot: a PATH-shimmed `cp` that always fails — root bypasses
    # permission-based failure injection, so shim the binary instead.
    _make_snapshot(snapdir, 'model-10000')
    fakebin = str(tmp_path / 'fakebin')
    os.makedirs(fakebin)
    with open(os.path.join(fakebin, 'cp'), 'w') as f:
        f.write('#!/bin/bash\nexit 1\n')
    os.chmod(os.path.join(fakebin, 'cp'), 0o755)
    script = (
        f'export PATH="{fakebin}:$PATH"\n'
        f'SNAPDIR="{snapdir}"; DEST="{dest}"\n'
        'source <(sed -n "/^copy_newest()/,/^}/p" '
        f'"{REPO}/recipes/coco_watchdog.sh")\n'
        'copy_newest\n')
    out = subprocess.run(['bash', '-c', script], capture_output=True,
                         text=True)
    assert 'FAILED' in out.stdout or out.returncode != 0, (
        out.stdout, out.stderr)
    # The last GOOD staging must be untouched.
    assert os.path.isdir(os.path.join(dest, 'model-5000'))
    assert os.path.isfile(os.path.join(dest, 'model-5000', 'd', 'blob'))
    assert not os.path.exists(dest + '.tmp')


def test_guard_script_wiring():
    """The guard must gate relaunch on a REAL compute probe (not device
    listing), stand down when the pidfile disappears, and chain into the
    finisher on completion — assert the script encodes all three."""
    src = open(os.path.join(REPO, 'recipes', 'coco_guard.sh')).read()
    assert 'jnp.ones' in src and '@' in src        # compute round-trip
    assert 'pidfile gone' in src                   # bench hand-off
    assert 'coco_finish.sh' in src                 # completion chaining
    subprocess.run(['bash', '-n',
                    os.path.join(REPO, 'recipes', 'coco_guard.sh')],
                   check=True)
    subprocess.run(['bash', '-n',
                    os.path.join(REPO, 'recipes', 'coco_finish.sh')],
                   check=True)
