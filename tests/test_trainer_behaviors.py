"""Trainer behavioral tests: full train() loop, best-checkpoint selection,
resume semantics, warmup boundary, NaN guard."""

import os

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train.trainer import Trainer, find_checkpoint

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2,
                  batch_size=8, loss_warmup=1, epochs=3)


@pytest.fixture(scope="module")
def splits():
    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=8.0)
    return ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)


def test_full_train_loop_checkpoints_and_resume(tmp_path, splits):
    work = str(tmp_path / "w")
    tr = Trainer(CFG, work, train_data=splits, val_data=splits,
                 test_data=splits, min_train_epochs=-1, save_interval=100,
                 seed=5)
    tr.train(epochs=3)  # crosses the warmup boundary (epoch 1 -> 2)
    ckpts = [d for d in os.listdir(work) if d.startswith("epoch_")]
    assert ckpts, "no checkpoint written by improving validation"
    best = find_checkpoint(work, "best")
    assert best is not None

    # resume: a fresh trainer continues from the checkpointed epoch & state
    tr2 = Trainer(CFG, work, train_data=splits, val_data=splits,
                  test_data=splits, min_train_epochs=-1, seed=6)
    assert tr2.load_checkpoint("best")
    assert tr2.epoch == best[1]
    assert np.isfinite(tr2.best_loss)
    # optimizer state restored (non-zero Adam moments after training)
    import jax

    mu_leaves = jax.tree.leaves(tr2.state.gen_opt)
    assert any(float(abs(np.asarray(l)).sum()) > 0 for l in mu_leaves
               if hasattr(l, "sum"))
    # training can continue
    tr2.epoch += 1
    loss = tr2.per_train_epoch(log_interval=10**9)
    assert np.isfinite(loss)


def test_warmup_gates_gan(splits, tmp_path):
    tr = Trainer(CFG, str(tmp_path / "w2"), train_data=splits,
                 val_data=splits, seed=2)
    # epoch 0/1 (<= warmup 1): gan off; epoch 2: gan on
    tr.epoch = 1
    sampler_batch = None
    for batch in __import__(
        "speech2affective_gestures_tpu.data.ted_db", fromlist=["BatchSampler"]
    ).BatchSampler(splits, 8, seed=0):
        sampler_batch = batch
        break
    import jax

    # train_step donates its input state — chain it like the trainer does
    state, metrics_off = tr.train_step(
        tr.state, jax.device_put(sampler_batch), jax.random.key(0),
        gan_on=tr.epoch > tr.gan_cfg.loss_warmup,
    )
    assert "dis" not in metrics_off
    tr.epoch = 2
    _, metrics_on = tr.train_step(
        state, jax.device_put(sampler_batch), jax.random.key(0),
        gan_on=tr.epoch > tr.gan_cfg.loss_warmup,
    )
    assert "dis" in metrics_on


def test_nan_guard_raises(splits, tmp_path):
    tr = Trainer(CFG, str(tmp_path / "w3"), train_data=splits, seed=3)
    # poison the generator params -> non-finite loss on the first step
    import jax
    import jax.numpy as jnp

    tr.state = tr.state.replace(
        gen_params=jax.tree.map(
            lambda x: jnp.full_like(x, jnp.nan), tr.state.gen_params
        )
    )
    with pytest.raises(FloatingPointError):
        tr.per_train_epoch(log_interval=10**9)


def test_trimodal_interval_epoch_mean_is_single_metric(splits, tmp_path):
    """With --trimodal-metric-interval K>1 the epoch mean must come ONLY
    from the steps that computed the trimodal differential — never a blend
    with absolute s2ag_l1 from the gated steps (which is ~20x larger and
    would make the logged loss depend on K)."""
    tr = Trainer(CFG, str(tmp_path / "w3"), train_data=splits,
                 val_data=splits, seed=3, trimodal_metric_interval=3)
    tr.epoch = 2  # past warmup
    mean = tr.per_train_epoch(log_interval=10**9)
    assert np.isfinite(mean)
    # the differential |L1(ours) - L1(trimodal)| at random init is far
    # smaller than absolute L1 (~0.1+); a blend with gated-step s2ag_l1
    # values would push the mean into absolute-L1 territory
    assert abs(mean) < 0.08, mean
