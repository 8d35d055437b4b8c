"""Metrics-lag pipelining is pure host scheduling: identical epoch output.

per_train_epoch with metrics_lag>0 defers each step's device->host metric
fetch by up to `lag` steps so dispatch runs ahead of the sync (over the
tunnel the per-step RTT can exceed the step itself). Nothing numeric may
change: same epoch mean, same logged lines, and check_finite still halts.
"""

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2,
                  batch_size=8, loss_warmup=-1)


@pytest.fixture(scope="module")
def splits():
    videos = ted_db.make_synthetic_videos(n_videos=3, clip_seconds=8.0)
    return ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)


def _epoch(tmp_path, splits, lag):
    trainer = Trainer(
        CFG, str(tmp_path / f"work_lag{lag}"), train_data=splits,
        val_data=splits, test_data=splits, min_train_epochs=-1, seed=3,
        metrics_lag=lag,
    )
    trainer.epoch = 1
    loss = trainer.per_train_epoch(log_interval=2, max_iters=6)
    log = open(trainer.logger.log_path).read() if hasattr(
        trainer.logger, "log_path") else None
    return loss, log, trainer


def test_lagged_epoch_identical_to_synchronous(tmp_path, splits):
    loss0, _, _ = _epoch(tmp_path, splits, lag=0)
    loss2, _, _ = _epoch(tmp_path, splits, lag=2)
    loss9, _, _ = _epoch(tmp_path, splits, lag=9)  # > iters: all deferred
    assert loss0 == loss2 == loss9


def test_check_finite_still_halts_with_lag(tmp_path, splits):
    trainer = Trainer(
        CFG, str(tmp_path / "work_nan"), train_data=splits,
        val_data=splits, test_data=splits, min_train_epochs=-1, seed=3,
        metrics_lag=3,
    )
    trainer.epoch = 1
    real_step = trainer.train_step

    def poisoned(state, batch, rng, **kw):
        state, metrics = real_step(state, batch, rng, **kw)
        metrics = dict(metrics)
        metrics["s2ag_l1"] = np.float32("nan")
        return state, metrics

    trainer.train_step = poisoned
    with pytest.raises(FloatingPointError, match="iter 0"):
        trainer.per_train_epoch(log_interval=1000, max_iters=6)
