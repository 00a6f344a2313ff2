"""Behavior test for recipes/coco_guard.sh (VERDICT r4, weak #5).

Drives the real guard script against a fake trainer and asserts the
supervision contract that keeps a multi-hour run alive overnight:

1. a trainer whose log goes silent past STALL_SECS is declared wedged;
2. SIGTERM is sent first (graceful-snapshot window), then the guard
   escalates to SIGKILL when the trainer ignores it;
3. the trainer is relaunched via RESUME_SCRIPT once the tunnel probe
   passes;
4. a live bench pidfile makes the guard stand down, and a pidfile that
   disappears afterwards makes it exit for the round.

All timing knobs are shrunk via env; the chip probe is stubbed with
PROBE_CMD=true. No real TPU or training is involved.
"""

import os
import signal
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUARD = os.path.join(REPO, 'recipes', 'coco_guard.sh')


def _wait_for(predicate, timeout, what):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return
        time.sleep(0.2)
    pytest.fail(f'timed out after {timeout}s waiting for: {what}')


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except (OSError, ProcessLookupError):
        return False


@pytest.fixture
def harness(tmp_path):
    """Fake-trainer world: every path the guard touches lives in tmp."""
    # The guard verifies PID identity by 'pyscripts/' in the cmdline
    # (is_continuation_job) — fake scripts live under a pyscripts/ dir.
    scripts = tmp_path / 'pyscripts'
    scripts.mkdir()
    trainlog = tmp_path / 'train.log'
    pidfile = tmp_path / 'trainer.pid'
    benchpid = tmp_path / 'bench.pid'
    snapdir = tmp_path / 'snapshots'
    snapdir.mkdir()
    watchdog_pidfile = tmp_path / 'watchdog.pid'
    # A live watchdog pid (ourselves) so relaunch() skips restarting one.
    watchdog_pidfile.write_text(str(os.getpid()))

    # Stalling trainer: ticks the log briefly, then goes silent but stays
    # alive AND ignores SIGTERM (records receipt) -> forces escalation.
    stall = scripts / 'fake_trainer.sh'
    stall.write_text(f"""#!/bin/bash
echo $$ > {pidfile}
trap 'touch {tmp_path}/got_sigterm' TERM
echo tick > {trainlog}
while :; do sleep 0.2; done
""")
    # Relaunched trainer: healthy forever (stdout -> TRAINLOG keeps the
    # log mtime fresh through the guard's own redirect).
    resume = scripts / 'fake_resume.sh'
    resume.write_text(f"""#!/bin/bash
touch {tmp_path}/relaunched
echo $$ > {pidfile}
while :; do echo tick; sleep 0.5; done
""")
    for s in (stall, resume):
        s.chmod(0o755)

    env = dict(
        os.environ,
        SNAPDIR=str(snapdir),
        PIDFILE=str(pidfile),
        BENCHPID=str(benchpid),
        TRAINLOG=str(trainlog),
        STALL_SECS='3',
        TERM_GRACE='2',
        POLL='1',
        RESUME_SCRIPT=str(resume),
        PROBE_CMD='true',
        WATCHDOG_PIDFILE=str(watchdog_pidfile),
        WATCHDOG_SCRIPT='/bin/true',
    )
    state = {
        'tmp': tmp_path, 'env': env, 'trainlog': trainlog,
        'pidfile': pidfile, 'benchpid': benchpid,
        'stall_script': stall, 'procs': [],
    }
    yield state
    for p in state['procs']:
        if p.poll() is None:
            p.kill()
            p.wait(timeout=10)
    # Reap any fake trainers still alive via their recorded pids.
    for f in (pidfile,):
        try:
            pid = int(f.read_text().strip())
            if _alive(pid):
                os.kill(pid, signal.SIGKILL)
        except (ValueError, OSError):
            pass


def test_stall_kill_relaunch_and_bench_standdown(harness):
    tmp = harness['tmp']
    env = harness['env']
    guard_log = tmp / 'guard.log'

    # Start the stalling trainer; wait until its pidfile exists.
    trainer = subprocess.Popen(
        ['bash', str(harness['stall_script'])],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    harness['procs'].append(trainer)
    _wait_for(lambda: harness['pidfile'].exists(), 10, 'trainer pidfile')
    first_pid = int(harness['pidfile'].read_text().strip())

    with open(guard_log, 'wb') as lf:
        guard = subprocess.Popen(['bash', GUARD], env=env,
                                 stdout=lf, stderr=subprocess.STDOUT)
    harness['procs'].append(guard)

    # 1. Stall detected (log mtime age > STALL_SECS).
    _wait_for(lambda: 'declaring wedged' in guard_log.read_text(),
              40, 'stall detection')
    # 2. SIGTERM first, then SIGKILL since the fake trainer ignores it.
    # (poll() rather than kill(pid, 0): the dead trainer stays a zombie
    # until this test, its parent, reaps it.)
    _wait_for(lambda: (tmp / 'got_sigterm').exists(), 20, 'SIGTERM receipt')
    _wait_for(lambda: trainer.poll() is not None, 30, 'SIGKILL escalation')
    assert trainer.returncode == -signal.SIGKILL
    # 3. Relaunch through RESUME_SCRIPT with a fresh pidfile.
    _wait_for(lambda: (tmp / 'relaunched').exists(), 40, 'relaunch')
    _wait_for(
        lambda: (harness['pidfile'].exists()
                 and int(harness['pidfile'].read_text().strip()) != first_pid
                 and _alive(int(harness['pidfile'].read_text().strip()))),
        20, 'relaunched trainer pidfile')
    second_pid = int(harness['pidfile'].read_text().strip())
    assert guard.poll() is None, 'guard must keep supervising'

    # 4a. Bench takeover: a live bench pidfile makes the guard stand down
    # (it must NOT relaunch while the bench holds the chip).
    bench = subprocess.Popen(['sleep', '300'])
    harness['procs'].append(bench)
    harness['benchpid'].write_text(str(bench.pid))
    _wait_for(lambda: 'bench holds the chip' in guard_log.read_text(),
              20, 'bench stand-down log line')

    # Kill the trainer the way bench.py's _release_tpu does, clear the
    # pidfile, and end the bench: the guard must exit for the round.
    os.kill(second_pid, signal.SIGKILL)
    harness['pidfile'].unlink()
    bench.kill()
    bench.wait(timeout=10)

    # 4b. Guard exits cleanly ("pidfile gone" branch).
    _wait_for(lambda: guard.poll() is not None, 30, 'guard exit')
    assert guard.returncode == 0
    assert 'pidfile gone' in guard_log.read_text()
    assert not (tmp / 'relaunched2').exists()
