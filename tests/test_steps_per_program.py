"""K-steps-per-program scanned epoch (Trainer(steps_per_program=K)).

The scanned epoch runs K train steps as one lax.scan device program with
the batch gather inlined, amortizing dispatch and the metrics fetch over
K (reference hot loop: processor_v2.py:959-991). It replays the per-step
loop's exact host draw streams (batch indices, adversarial speakers, rng
splits) and inlines the exact per-step train_step — but XLA compiles a
while-loop body with different fusion choices than the standalone step,
so values agree to float rounding only (verified not fixable with
optimization_barrier; the rounding moves inside the step's ops). Hence
opt-in, default 1 = bit-level parity — same policy as --fused-pass.

The tolerance assertions here ARE the draw-stream test: per-step losses
vary O(1) across random batches, so agreement at ~1e-4 relative is only
possible if both paths consumed identical index/speaker/rng streams.
"""

import re
import tempfile

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train.trainer import Trainer


def _cfg():
    return ModelConfig(batch_size=4, loss_warmup=-1, n_layers=1,
                       hidden_size=32, hidden_size_s2eg=32)


@pytest.fixture(scope="module")
def tiny_ds():
    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=12.0)
    return ted_db.build_dataset_from_videos(videos, _cfg(),
                                            keep_sidecars=False)


def _run_epoch(ds, spp, max_iters, cfg=None, **kw):
    t = Trainer(cfg or _cfg(), tempfile.mkdtemp(), train_data=ds, seed=3,
                steps_per_program=spp, metrics_lag=3, **kw)
    t.epoch = 1
    logs = []
    t.logger.print_log = lambda s: logs.append(s)
    mean = t.per_train_epoch(log_interval=1, max_iters=max_iters)
    return t, mean, logs


def _parse_iter_metrics(logs):
    """{iter: {name: value}} from the per-iteration log lines."""
    out = {}
    for line in logs:
        m = re.match(r"\s*Iter (\d+) Done\. \| (.*)", line)
        if not m:
            continue
        vals = {}
        for part in m.group(2).split(" | "):
            k, v = part.split(": ")
            vals[k] = float(v)
        out[int(m.group(1))] = vals
    return out


@pytest.mark.slow
def test_scanned_epoch_matches_per_step_draws_and_values(tiny_ds):
    # 7 steps with K=4 also exercises the partial final program (4 + 3)
    t1, mean1, logs1 = _run_epoch(tiny_ds, spp=1, max_iters=7)
    t4, mean4, logs4 = _run_epoch(tiny_ds, spp=4, max_iters=7)
    assert t4._use_scanned_epoch()

    it1, it4 = _parse_iter_metrics(logs1), _parse_iter_metrics(logs4)
    assert sorted(it1) == sorted(it4) == list(range(7))
    assert set(it1[0]) == set(it4[0])  # same metric keys, incl. trimodal

    # iter 0 runs on identical state + identical batch: any difference is
    # pure compile-level rounding (observed ~1e-7 relative)
    for k in it1[0]:
        np.testing.assert_allclose(it1[0][k], it4[0][k], rtol=1e-3,
                                   atol=1e-4, err_msg=f"iter0 {k}")
    # downstream iters: GAN dynamics amplify the epsilon, but the values
    # must track far tighter than the O(1) batch-to-batch loss variation
    for i in range(1, 7):
        np.testing.assert_allclose(
            it1[i]["s2ag_l1"], it4[i]["s2ag_l1"], rtol=0.05,
            err_msg=f"iter{i}",
        )
    np.testing.assert_allclose(mean1, mean4, rtol=0.05, atol=5e-3)


@pytest.mark.slow
def test_scanned_epoch_composes_with_mesh(tiny_ds):
    """spp>1 under the data mesh: the dataset is replicated, the index
    vectors are sharded over 'data', and the in-program gather comes out
    batch-sharded — same draws, same values (to sharded-compile rounding)
    as the single-device scanned epoch."""
    import jax

    cfg = ModelConfig(batch_size=8, loss_warmup=-1, n_layers=1,
                      hidden_size=32, hidden_size_s2eg=32)
    # the tiny corpus sustains 4 bs=8 steps per epoch; 4 with K=3 also
    # exercises the partial final program (3 + 1)
    t1, mean1, logs1 = _run_epoch(tiny_ds, spp=3, max_iters=4, cfg=cfg)
    tm, meanm, logsm = _run_epoch(tiny_ds, spp=3, max_iters=4, cfg=cfg,
                                  use_mesh=True)
    assert tm.mesh is not None, "mesh trainer did not build a mesh"
    assert tm._use_scanned_epoch(), "scanned epoch fell back under the mesh"
    # the dataset replica + sharded indices must actually live on the mesh
    arr = next(iter(tm._device_train.arrays.values()))
    assert len(arr.sharding.device_set) == len(jax.devices())

    it1, itm = _parse_iter_metrics(logs1), _parse_iter_metrics(logsm)
    assert sorted(it1) == sorted(itm) == list(range(4))
    for k in it1[0]:
        np.testing.assert_allclose(it1[0][k], itm[0][k], rtol=1e-3,
                                   atol=1e-4, err_msg=f"iter0 {k}")
    for i in range(1, 4):
        np.testing.assert_allclose(
            it1[i]["s2ag_l1"], itm[i]["s2ag_l1"], rtol=0.05,
            err_msg=f"iter{i}",
        )
    np.testing.assert_allclose(mean1, meanm, rtol=0.05, atol=5e-3)


def test_mesh_fallback_when_batch_not_divisible(tiny_ds):
    # bs=4 on an 8-device data mesh can't shard the batch: the trainer
    # must fall back to the per-step loop, not crash or silently reshape
    t = Trainer(_cfg(), tempfile.mkdtemp(), train_data=tiny_ds, seed=3,
                steps_per_program=4, use_mesh=True)
    assert t.steps_per_program == 1
    assert not t._use_scanned_epoch()


def test_fallback_to_per_step_when_ineligible(tiny_ds):
    # trimodal interval > 1 makes the per-step tri gate non-constant inside
    # a program: the trainer must fall back instead of silently changing
    # the metric schedule
    t = Trainer(_cfg(), tempfile.mkdtemp(), train_data=tiny_ds, seed=3,
                steps_per_program=4, trimodal_metric_interval=2)
    assert t.steps_per_program == 1
    assert not t._use_scanned_epoch()


def test_epoch_engine_surfaced(tiny_ds):
    # round-4 verdict item 6: the engine that actually runs — and any
    # fallback reason — must be inspectable (artifact emitters stamp it)
    # and stamped into the epoch log line, never a silent downgrade
    t_ok = Trainer(_cfg(), tempfile.mkdtemp(), train_data=tiny_ds, seed=3,
                   steps_per_program=2)
    assert t_ok.epoch_engine == "scanned"
    assert t_ok.epoch_engine_fallback is None

    t_fb = Trainer(_cfg(), tempfile.mkdtemp(), train_data=tiny_ds, seed=3,
                   steps_per_program=4, trimodal_metric_interval=2)
    assert t_fb.epoch_engine == "per_step"
    assert "fell back" in t_fb.epoch_engine_fallback


@pytest.mark.slow
def test_epoch_engine_in_log_line(tiny_ds):
    # the engine stamp must reach the epoch log line itself
    t = Trainer(_cfg(), tempfile.mkdtemp(), train_data=tiny_ds, seed=3,
                steps_per_program=4, trimodal_metric_interval=2)
    lines = []
    t.logger.print_log = lines.append
    t.per_train_epoch(log_interval=10**9, max_iters=2)
    assert any(re.search(r"engine per_step", ln) for ln in lines)
