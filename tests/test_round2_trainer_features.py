"""Round-2 trainer features: fresh exclude-own diversity speaker draw,
opt-in gradient clipping / LR decay, and grain-loader mid-epoch resume."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train import gan_step
from speech2affective_gestures_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2,
                  batch_size=8, loss_warmup=0, epochs=2)


@pytest.fixture(scope="module")
def splits():
    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=8.0)
    return ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)


# ---------------------------------------------------------------- speakers
def test_draw_other_speakers_never_own_and_covers_vocab():
    """The div-reg second pass must never reuse a sample's current speaker
    (the degenerate case of the reference's randperm, processor_v2.py:902)
    and must be able to reach every other id."""
    n_speakers = 7
    vids = jnp.asarray(np.arange(64) % n_speakers, jnp.int32)
    seen = set()
    for s in range(50):
        out = gan_step.draw_other_speaker_ids(jax.random.key(s), vids, n_speakers)
        out = np.asarray(out)
        assert out.dtype == np.int32
        assert (out != np.asarray(vids)).all()
        assert ((out >= 0) & (out < n_speakers)).all()
        seen.update((int(a), int(b)) for a, b in zip(np.asarray(vids), out))
    # every (own, other) pair with own != other is reachable
    assert len(seen) == n_speakers * (n_speakers - 1)


def test_draw_other_speakers_fallback_permutation():
    vids = jnp.asarray([3, 1, 4, 1], jnp.int32)
    out = gan_step.draw_other_speaker_ids(jax.random.key(0), vids, 0)
    assert sorted(np.asarray(out).tolist()) == [1, 1, 3, 4]


# ------------------------------------------------------- clip + decay opts
def test_gradient_clip_bounds_update_norm():
    cfg = gan_step.GanConfig(learning_rate=1.0, gradient_clip=0.5)
    gopt, _ = gan_step.make_optimizers(cfg)
    params = {"w": jnp.zeros(4)}
    opt_state = gopt.init(params)
    grads = {"w": jnp.array([100.0, -100.0, 100.0, 100.0])}
    updates, _ = gopt.update(grads, opt_state, params)
    # after global-norm clipping to 0.5 the Adam input is tiny but Adam
    # normalizes; verify the clip stage exists by comparing against unclipped
    cfg0 = gan_step.GanConfig(learning_rate=1.0)
    gopt0, _ = gan_step.make_optimizers(cfg0)
    u0, _ = gopt0.update(grads, gopt0.init(params), params)
    # Adam is scale-invariant for constant gradients, so the first-step
    # updates match; what must differ is the internal moment state
    s_clip = gopt.init(params)
    _, s_clip = gopt.update(grads, s_clip, params)
    mu = jax.tree.leaves(s_clip)
    mu0 = jax.tree.leaves(gopt0.update(grads, gopt0.init(params), params)[1])
    norms = sorted(float(jnp.abs(x).max()) for x in mu if hasattr(x, "max"))
    norms0 = sorted(float(jnp.abs(x).max()) for x in mu0 if hasattr(x, "max"))
    assert max(norms) < max(norms0)
    assert np.isfinite(jax.tree.leaves(updates)[0]).all()


def test_lr_decay_schedule_per_epoch():
    cfg = gan_step.GanConfig(learning_rate=1e-3, lr_decay=0.5,
                             decay_steps_per_epoch=10)
    sched = gan_step._lr_schedule(cfg.learning_rate, cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(9)) == pytest.approx(1e-3)
    assert float(sched(10)) == pytest.approx(5e-4)
    assert float(sched(25)) == pytest.approx(2.5e-4)


def test_trainer_with_clip_and_decay_trains(tmp_path, splits):
    tr = Trainer(CFG, str(tmp_path / "w"), train_data=splits,
                 val_data=splits, seed=3, gradient_clip=0.1, lr_decay=0.9)
    loss = tr.per_train_epoch(log_interval=10**9, max_iters=2)
    assert np.isfinite(loss)
    # chained optimizer state (clip + adam) checkpoints round-trip
    tr.save_checkpoint(0.5)
    tr2 = Trainer(CFG, str(tmp_path / "w"), train_data=splits,
                  val_data=splits, seed=4, gradient_clip=0.1, lr_decay=0.9)
    assert tr2.load_checkpoint("best")


# ------------------------------------------------------ grain mid-epoch resume
def test_grain_mid_epoch_resume_identical_continuation(tmp_path, splits):
    """Kill after k batches, resume from the checkpoint, and the continued
    run must produce bit-identical parameters to the uninterrupted one
    (grain iterator state + RNG key live in the checkpoint sidecar)."""
    work = str(tmp_path / "grain")
    steps = splits.n_samples // CFG.batch_size
    assert steps >= 2, "fixture too small for a mid-epoch interruption"
    k = steps - 1
    tr = Trainer(CFG, work, train_data=splits, val_data=splits, seed=11,
                 loader="grain")
    tr.per_train_epoch(log_interval=10**9, max_iters=k)  # "interrupted"
    assert tr._iter_in_epoch == k
    tr.save_checkpoint(0.5)

    # uninterrupted continuation in-process
    tr.per_train_epoch(log_interval=10**9)
    ref_params = jax.device_get(tr.state.gen_params)
    assert tr._iter_in_epoch == 0  # epoch completed

    # fresh process-equivalent: new trainer, restore, continue
    tr2 = Trainer(CFG, work, train_data=splits, val_data=splits, seed=999,
                  loader="grain")
    assert tr2.load_checkpoint("best")
    assert tr2._iter_in_epoch == k
    tr2.per_train_epoch(log_interval=10**9)
    got_params = jax.device_get(tr2.state.gen_params)

    jax.tree.map(np.testing.assert_array_equal, ref_params, got_params)


def test_grain_loader_feeds_full_train(tmp_path, splits):
    tr = Trainer(CFG, str(tmp_path / "g2"), train_data=splits,
                 val_data=splits, seed=7, loader="grain")
    tr.train(epochs=1)
    assert tr._iter_in_epoch == 0
