"""Tests for the measurement/reporting tools behind docs/DESIGN.md claims.

- tools/recipe_report.py: stitching kill+resumed tensorboard event files
  into one step-indexed history (later files win on overlap — what a
  resumed trainer actually executed).
- tools/make_synthetic_dataset.py: the on-disk contract consumed by the
  recipes (list-file triplets, label/superpixel value ranges, palette
  consistency across splits).
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write_events(logdir, points, lr=None):
    """points: {step: loss}; writes one event file then closes it."""
    import tensorboardX

    w = tensorboardX.SummaryWriter(logdir=logdir, flush_secs=1)
    for step, loss in sorted(points.items()):
        w.add_scalar('loss', loss, step)
        if lr is not None:
            w.add_scalar('lr', lr(step), step)
    w.close()
    # event filenames embed a 1-second timestamp; keep files distinct
    # and ordered for the sorted() in load_history.
    time.sleep(1.1)


def test_recipe_report_stitches_resume_overlap(tmp_path):
    from tools.recipe_report import load_history

    d = str(tmp_path)
    # Original run: steps 0..600, killed after logging 600.
    _write_events(d, {0: 8.0, 200: 4.0, 400: 3.0, 600: 2.5})
    # Resumed from the step-400 snapshot: re-logs 400/600 with slightly
    # different values (different in-flight batch), continues to 1000.
    _write_events(d, {400: 3.1, 600: 2.4, 800: 2.0, 1000: 1.8})

    per_file, merged = load_history(d)
    assert len(per_file) == 2
    loss = {s: v for s, (_, v) in merged['loss'].items()}
    # Union of steps, later file wins on the overlap.
    assert sorted(loss) == [0, 200, 400, 600, 800, 1000]
    assert loss[400] == pytest.approx(3.1)
    assert loss[600] == pytest.approx(2.4)
    assert loss[0] == pytest.approx(8.0)
    assert loss[1000] == pytest.approx(1.8)


def test_recipe_report_cli_reports_milestones(tmp_path):
    # step-policy drop at 320 (32% of 1000) must show up in the output.
    lr = lambda s: 0.1 if s < 320 else 0.01
    _write_events(str(tmp_path), {s: 5.0 - s / 500 for s in
                                  range(0, 1001, 100)}, lr=lr)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'recipe_report.py'),
         str(tmp_path)],
        capture_output=True, text=True, check=True).stdout
    assert 'lr 0.1 -> 0.01' in out
    assert 'last step 1000' in out


def test_make_synthetic_dataset_contract(tmp_path):
    from PIL import Image

    root = str(tmp_path / 'ds')
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'tools', 'make_synthetic_dataset.py'),
         '--root', root, '--train', '4', '--train_size', '64,96',
         '--val', '2', '--val_size', '80,80', '--classes', '5',
         '--sp_grid', '4,4', '--seed', '3'],
        check=True, capture_output=True)

    for split, n in (('train', 4), ('val', 2)):
        lines = open(os.path.join(root, f'{split}.txt')).readlines()
        assert len(lines) == n
        cols = lines[0].split()
        # image [semantic] [superpixel] triplets (val may omit superpixel)
        assert len(cols) >= 2
        for rel in cols:
            assert os.path.exists(os.path.join(root, rel)), rel

    # Label/superpixel value contracts on one train sample.
    img_rel, sem_rel, sp_rel = open(
        os.path.join(root, 'train.txt')).readline().split()
    sem = np.asarray(Image.open(os.path.join(root, sem_rel)))
    sp = np.asarray(Image.open(os.path.join(root, sp_rel)))
    assert sem.shape == (64, 96) and sp.shape == (64, 96)
    assert sem.max() < 5 and sem.min() >= 0
    assert sp.dtype.itemsize >= 2 or sp.max() < 256  # uint16-safe ids
    # superpixels must refine the class map: every superpixel id maps to
    # exactly one semantic class (boundaries align with true contours).
    for sid in np.unique(sp):
        classes = np.unique(sem[sp == sid])
        assert classes.size == 1, f'superpixel {sid} spans {classes}'


def test_recipe_report_json_quality_record(tmp_path):
    """--json emits the round-end quality record: loss/acc trend plus any
    milestone QUALITY.json evals (VERDICT r4, item 7)."""
    import json

    import tensorboardX

    logdir = str(tmp_path / 'snap')
    w = tensorboardX.SummaryWriter(logdir=logdir, flush_secs=1)
    for step in range(0, 1001, 100):
        w.add_scalar('loss', 5.0 - step / 500, step)
        w.add_scalar('accuracy', 0.1 + step / 5000, step)
    w.close()

    mdir = tmp_path / 'milestones' / 'iter-100000'
    mdir.mkdir(parents=True)
    (mdir / 'QUALITY.json').write_text(
        '{"milestone": 100000, "miou": 31.5, "pixel_acc": 70.2}')

    out_json = str(tmp_path / 'QUALITY.json')
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'recipe_report.py'),
         logdir, '--json', out_json,
         '--milestones_dir', str(tmp_path / 'milestones')],
        capture_output=True, text=True, check=True)
    rec = json.loads(open(out_json).read())
    assert rec['last_step'] == 1000
    assert rec['loss_last10_mean'] == pytest.approx(3.9, abs=0.2)
    assert rec['retrieval_acc_last10_mean'] == pytest.approx(0.21, abs=0.02)
    assert rec['milestones'] == [
        {'milestone': 100000, 'miou': 31.5, 'pixel_acc': 70.2}]
