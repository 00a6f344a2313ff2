"""Multi-host `device_resident`: a REAL 2-process CPU cluster (gloo)
running pyscripts/train.py with the HBM-resident pipeline, compared
step-by-step against the single-process run.

Why this must work with no special cases: every process stages the
identical list-ordered dataset (TfRawLoader shuffle=False), the resident
arrays are replicated via `make_array_from_process_local_data`, and
batch selection (hsg_tpu/train/resident.py `epoch_indices`) is a pure
function of `state.step` — so the 2-process GLOBAL batch is the same
rows as the 1-process one and the per-step losses must match up to
collective reduction-order FP noise.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

from make_synthetic_data import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, 'pyscripts', 'train.py')
STEPS = 3


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _losses(out):
    """step -> loss from the `[it/max] ... loss=X ...` progress lines."""
    found = {}
    for m in re.finditer(r'\[(\d+)/\d+\].*?(?<=[ ,])loss=([0-9.]+)', out):
        found[int(m.group(1))] = float(m.group(2))
    return found


def _run(nprocs, port, data, lst, cfg_path, snap_base):
    procs = []
    for rank in range(nprocs):
        # Global device count is 8 in both topologies so that
        # images_per_step (= batch_size * num_devices) is identical.
        # On a loaded single-vCPU host one rank can still be compiling
        # minutes after the other reaches the first gloo collective, so
        # raise all three collective timeouts well past the default
        # (~30 s): the call-level warn/terminate pair AND
        # xla_cpu_collective_timeout_seconds, which bounds the gloo
        # CONTEXT INITIALIZATION (tcp pair connect) rendezvous.
        env = dict(
            os.environ, HSG_TPU_PLATFORM='cpu',
            XLA_FLAGS=('--xla_force_host_platform_device_count='
                       f'{8 // nprocs} '
                       '--xla_cpu_collective_timeout_seconds=1800 '
                       '--xla_cpu_collective_call_warn_stuck_timeout_seconds=300 '
                       '--xla_cpu_collective_call_terminate_timeout_seconds=1800'),
            PYTHONPATH=REPO + ':' + os.environ.get('PYTHONPATH', ''))
        if nprocs > 1:
            env.update(JAX_COORDINATOR_ADDRESS=f'localhost:{port}',
                       JAX_NUM_PROCESSES=str(nprocs),
                       JAX_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, TRAIN, '--data_dir', data, '--data_list', lst,
             '--snapshot_dir', f'{snap_base}_{nprocs}p',
             '--cfg_path', cfg_path, '--max_steps', str(STEPS)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    return outs


@pytest.mark.slow
def test_two_process_device_resident_matches_single_process(tmp_path):
    data = str(tmp_path / 'data')
    make_dataset(data, n_images=4, size=64)
    lst = os.path.join(data, 'list.txt')
    base = yaml.safe_load(
        open(os.path.join(REPO, 'configs', 'tiny_synthetic.yaml')))
    cfg = dict(base)
    cfg['train'] = dict(base['train'], data_pipeline='device_resident',
                        staging_size=64, tensorboard_step=1)
    cfg_path = str(tmp_path / 'resident.yaml')
    yaml.safe_dump(cfg, open(cfg_path, 'w'))

    (single,) = _run(1, 0, data, lst, cfg_path, str(tmp_path / 'snap'))
    multi = _run(2, _free_port(), data, lst, cfg_path,
                 str(tmp_path / 'snap'))

    assert 'device-resident dataset: 4 images' in single
    assert 'device_resident multi-host: dataset replicated on all 2' \
        in multi[0]

    ref = _losses(single)
    got0, got1 = _losses(multi[0]), _losses(multi[1])
    assert set(ref) == set(got0) == set(got1) == set(range(STEPS))
    for it in range(STEPS):
        # Both ranks observe the same replicated global metrics.
        np.testing.assert_allclose(got0[it], got1[it], rtol=1e-5)
        # Step 0 runs identical params — only collective reduction-order
        # noise. Later steps run on params that differ by that noise,
        # and the k-means E-step argmax is discrete (a ulp-level tie-
        # break can reassign a pixel) → wider band, same rationale as
        # __graft_entry__.dryrun_multichip.
        rtol = 1e-4 if it == 0 else 2.5e-2
        np.testing.assert_allclose(got0[it], ref[it], rtol=rtol,
                                   err_msg=f'step {it}')
