"""The chunked NCA path must work inside the full jitted train step.

Forces SegSortLoss's auto-routing threshold down so the global prototype
set (B * S) exceeds it, exercising scan-with-remat under value_and_grad —
the configuration the real stage-1 recipe hits (B*S ~ 32k > 8192).
"""

import numpy as np
import jax
import pytest

from hsg_tpu.losses import segsort
from hsg_tpu.models import predictions as pred_lib
from hsg_tpu.train import optimizer as opt_lib
from hsg_tpu.train import train_step as ts_lib
from test_train_step import _cfg, _model, _batch

pytestmark = pytest.mark.slow


def test_train_step_with_chunked_nca(monkeypatch):
    # B=8 views x S=8 segments = 64 global prototypes; force chunking.
    monkeypatch.setattr(segsort.SegSortLoss, 'AUTO_CHUNK_THRESHOLD', 16)
    cfg = _cfg()
    model = _model(cfg)
    prediction = pred_lib.hsg(cfg)
    batch = _batch()
    state, update_fn = ts_lib.create_train_state(
        model, jax.random.PRNGKey(0), batch,
        momentum=cfg.train.momentum, weight_decay=cfg.train.weight_decay)
    schedule = opt_lib.schedule_from_config(cfg)
    step = jax.jit(ts_lib.make_train_step(model, prediction, schedule,
                                          update_fn))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))

    # And the chunked loss value matches the dense one at the first step.
    monkeypatch.setattr(segsort.SegSortLoss, 'AUTO_CHUNK_THRESHOLD', 1 << 30)
    step_dense = jax.jit(ts_lib.make_train_step(model, prediction, schedule,
                                                update_fn))
    _, metrics_dense = step_dense(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics['img_sim_loss']),
                               float(metrics_dense['img_sim_loss']),
                               rtol=1e-4)
