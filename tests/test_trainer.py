"""Trainer driver: epoch loop, checkpoint save/restore, CLI end-to-end."""

import os

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train.trainer import (
    Trainer, find_checkpoint, parse_checkpoint_name,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2,
                  batch_size=8, loss_warmup=-1)


@pytest.fixture(scope="module")
def splits():
    videos = ted_db.make_synthetic_videos(n_videos=3, clip_seconds=8.0)
    full = ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)
    return full


def test_parse_checkpoint_name():
    assert parse_checkpoint_name("epoch_000012_loss_0.1234_model") == (12, 0.1234)
    assert parse_checkpoint_name("garbage") is None


def test_find_checkpoint_best(tmp_path):
    for name in ("epoch_000001_loss_0.5000_model", "epoch_000002_loss_0.2000_model",
                 "epoch_000003_loss_-1.0000_model"):
        os.makedirs(tmp_path / name)
    best = find_checkpoint(str(tmp_path), "best")
    assert best[1] == 2  # smallest positive loss
    at1 = find_checkpoint(str(tmp_path), 1)
    assert at1[2] == 0.5


def test_trainer_epoch_and_checkpoint_roundtrip(tmp_path, splits):
    trainer = Trainer(
        CFG, str(tmp_path / "work"), train_data=splits, val_data=splits,
        test_data=splits, min_train_epochs=-1, seed=3,
    )
    trainer.epoch = 1
    loss = trainer.per_train_epoch(log_interval=1000)
    assert np.isfinite(loss)
    val = trainer.per_val_epoch()
    assert np.isfinite(val)

    trainer.save_checkpoint(val)
    found = find_checkpoint(trainer.work_dir, "best")
    assert found is not None and found[1] == 1

    # fresh trainer restores the state
    trainer2 = Trainer(
        CFG, trainer.work_dir, train_data=splits, val_data=splits,
        test_data=splits, min_train_epochs=-1, seed=4,
    )
    assert trainer2.load_checkpoint("best")
    import jax

    a = jax.tree.leaves(trainer.state.gen_params)[0]
    b = jax.tree.leaves(trainer2.state.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert trainer2.epoch == 1

    # eval path produces the metric dict
    result = trainer2.generate_gestures(batch_size=8)
    assert {"l1", "joint_mae", "accel"} <= set(result)


def test_main_v2_cli_synthetic(tmp_path):
    """End-to-end CLI run on the synthetic corpus (1 epoch, tiny model)."""
    import yaml

    from speech2affective_gestures_tpu.main_v2 import main

    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.dump({
            "hidden_size": 32, "hidden_size_s2eg": 32, "n_layers": 2,
            "epochs": 1, "batch_size": 8, "loss_warmup": -1,
        }, f)
    trainer = main([
        "-b", str(tmp_path), "-c", str(cfg_path),
        "--synthetic-data", "true", "--train-s2ag", "true",
        "--s2ag-num-epoch", "1", "--batch-size", "8",
        "--s2ag-load-last-best", "false",
        "--use-multiple-gpus", "false",
    ])
    assert os.path.exists(os.path.join(trainer.work_dir, "log.txt"))
    assert os.path.exists(os.path.join(trainer.work_dir, "config.yaml"))
