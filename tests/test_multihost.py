"""Multi-host readiness: a REAL 2-process CPU cluster (gloo collectives)
running the full HSG train step over one global 8-device mesh, compared
against the single-process 8-device result.

This is the strongest host-side proof of SURVEY.md §2.5's design claim:
the same SPMD program spans hosts; only data feeding changes
(per-process `local_batch_slice` + `make_array_from_process_local_data`).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nprocs, port):
    env = dict(os.environ)
    # The worker forces its own platform/device count in-process.
    env.pop('XLA_FLAGS', None)
    ranks = range(nprocs) if nprocs > 1 else [-1]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(r), str(nprocs), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for r in ranks]
    losses = {}
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith('MULTIHOST_LOSS'):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    return losses


@pytest.mark.slow
def test_two_process_cpu_cluster_matches_single_process():
    single = _run_workers(1, 0)
    multi = _run_workers(2, _free_port())
    assert set(multi) == {0, 1}
    # Both ranks compute the same global loss ...
    np.testing.assert_allclose(multi[0], multi[1], rtol=1e-5)
    # ... and it equals the single-process 8-device result (cross-process
    # gloo reductions may reassociate float sums; tolerance covers that).
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-4)
