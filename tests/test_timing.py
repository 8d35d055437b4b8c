"""Honest-timing utilities (train/timing.py) + bench measurement plumbing.

The round-2 verdict found `jax.block_until_ready` returns early on the axon
TPU tunnel, so all throughput numbers now rest on these primitives: a value
fetch as the only trusted barrier, and a two-window slope that cancels
constant dispatch overhead. These tests pin the estimator math and the
barrier semantics (on CPU, where sync primitives are sound — the TPU-side
validation is bench.py's mfu<=1 hard gate + the measured-peak cross-check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2affective_gestures_tpu.train import timing
from speech2affective_gestures_tpu.train.profiling import StepTimer


def test_fetch_scalar_returns_first_element_of_first_leaf():
    tree = {"a": jnp.arange(6.0).reshape(2, 3) + 5.0, "b": jnp.zeros(2)}
    assert timing.fetch_scalar(tree) == 5.0
    assert timing.fetch_scalar(jnp.asarray(3)) == 3.0


def test_marginal_step_time_cancels_constant_overhead():
    # synthetic clock: t(N) = 0.7 + 0.01 * N  (huge constant overhead)
    calls = []

    def run_window(n):
        calls.append(n)
        return 0.7 + 0.01 * n

    res = timing.marginal_step_time(run_window, windows=(20, 60), reps=3)
    assert res["sec_per_step"] == pytest.approx(0.01)
    assert res["steps_per_sec"] == pytest.approx(100.0)
    assert calls == [20, 60] * 3
    # a naive t(60)/60 estimate would be off by ~2x — the slope is not
    assert (0.7 + 0.01 * 60) / 60 > 2 * res["sec_per_step"]


def test_marginal_step_time_median_rejects_spikes():
    seq = iter([
        (0.0, 1.0),    # rep 1: slope 1/40
        (0.0, 1.0),    # rep 2: slope 1/40
        (0.0, 41.0),   # rep 3: tunnel spike -> slope 41/40
    ])
    pair = None

    def run_window(n):
        nonlocal pair
        if n == 20:
            pair = next(seq)
            return pair[0]
        return pair[1]

    res = timing.marginal_step_time(run_window, windows=(20, 60), reps=3)
    assert res["sec_per_step"] == pytest.approx(1.0 / 40)
    assert len(res["slope_samples"]) == 3


def test_time_compiled_step_counts_real_iterations():
    n_exec = 0

    @jax.jit
    def inc(x):
        return x + 1.0

    def step(x):
        nonlocal n_exec
        n_exec += 1
        return inc(x)

    res = timing.time_compiled_step(step, jnp.zeros(()), windows=(3, 7),
                                    reps=2)
    # warm (1) + reps * (3 + 7)
    assert n_exec == 1 + 2 * (3 + 7)
    # with a near-zero-cost op the slope may be noise-negative; it must at
    # least be a sane magnitude (|slope| < 10 ms on a trivial jitted add)
    assert abs(res["sec_per_step"]) < 1e-2


def test_time_compiled_step_carry_factory_called_per_window():
    n_made = 0

    def make():
        nonlocal n_made
        n_made += 1
        return jnp.zeros(())

    @jax.jit
    def step(x):
        return x + 1.0

    timing.time_compiled_step(step, make, windows=(2, 4), reps=2)
    # warm (1) + 2 reps * 2 windows
    assert n_made == 5


def test_measure_peak_flops_plausible_on_cpu():
    peak = timing.measure_peak_flops(size=256, windows=(4, 12), reps=2)
    assert 1e8 < peak < 1e15  # positive, finite, not absurd


def test_step_timer_value_fetch_sync():
    timer = StepTimer()

    @jax.jit
    def f(x):
        return x * 2.0

    x = jnp.ones((8, 8))
    for _ in range(3):
        timer.start()
        y = f(x)
        timer.stop(y)
    s = timer.summary()
    assert s["steps"] == 3
    assert s["steps_per_sec"] > 0


@pytest.mark.slow  # compiles the full train step
def test_train_step_donation_safe_chaining():
    """The donated TrainState must chain through repeated steps (the only
    supported usage pattern) without error and keep updating."""
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder

    cfg = ModelConfig(n_layers=1, hidden_size=32, hidden_size_s2eg=32)
    setup = builder.init_training(cfg, jax.random.key(0), n_words=20,
                                  n_speakers=4, with_trimodal=False)
    state, train_step = setup["state"], setup["train_step"]
    batch = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(0), 4, cfg, 20, 4))
    steps = []
    key = jax.random.key(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub, gan_on=False)
        steps.append(int(state.step))
    assert steps == [1, 2, 3]
    assert np.isfinite(float(metrics["g_total"]))


@pytest.mark.slow  # compiles two full train steps
def test_mixed_precision_train_step():
    """bf16 mixed precision: f32 master params/opt state throughout, finite
    losses tracking the f32 step closely at init, f32 eval unchanged."""
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder

    cfg = ModelConfig(n_layers=1, hidden_size=32, hidden_size_s2eg=32)
    batch = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(0), 4, cfg, 20, 4))

    outs = {}
    for mp in (False, True):
        setup = builder.init_training(
            cfg, jax.random.key(0), n_words=20, n_speakers=4,
            with_trimodal=False, mixed_precision=mp,
        )
        state, metrics = setup["train_step"](
            setup["state"], batch, jax.random.key(1), gan_on=True
        )
        # master params and optimizer state stay f32
        for leaf in jax.tree.leaves(state.gen_params) + jax.tree.leaves(
                state.gen_opt):
            assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
        outs[mp] = {k: float(v) for k, v in metrics.items()}
        # eval stays full precision and runs
        out, em = setup["eval_step"](state, batch, jax.random.key(2),
                                     gan_on=True)
        assert out.dtype == jnp.float32
        assert np.isfinite(float(em["loss"]))

    for k, v32 in outs[False].items():
        v16 = outs[True][k]
        assert np.isfinite(v16), k
        if k == "DIV_REG":
            # a ratio of two near-zero quantities at random init
            # (-pose_l1/z_l1): denominator rounding under bf16 swings it
            # arbitrarily — only finiteness/sign are meaningful here
            assert v16 <= 0.0
            continue
        # one step from identical init: bf16 losses in the same regime as
        # f32 (the Huber term carries a 500x weight, so bf16's ~0.4%
        # activation rounding legitimately moves the total by ~10%;
        # a broken cast shows up as orders of magnitude, not percent)
        assert abs(v16 - v32) <= 0.15 * max(1.0, abs(v32)), (k, v16, v32)


@pytest.mark.slow  # compiles the mixed-precision train step
def test_mixed_precision_training_converges():
    """Several pure-regression steps under bf16 reduce the Huber term —
    the mixed-precision step trains, not just runs."""
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder

    cfg = ModelConfig(n_layers=2, hidden_size=32, hidden_size_s2eg=32)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=30, n_speakers=5,
        with_trimodal=False, mixed_precision=True,
    )
    state = setup["state"]
    batch = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(1), 16, cfg, 30, 5))
    first = last = None
    for i in range(8):
        state, metrics = setup["train_step"](
            state, batch, jax.random.key(10 + i), gan_on=False
        )
        last = float(metrics["loss"])
        if first is None:
            first = last
    assert np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_canonical_flops_engine_independent():
    """canonical_train_step_flops (the bench MFU numerator): a positive
    analytic count (train/flops.py jaxpr walk of the scan-engine step),
    unaffected by the caller's engine env (the pallas engine pads gate
    columns — its program's count is NOT the useful work; round-over-round
    comparability depends on this)."""
    import os

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train.flops import (
        canonical_train_step_flops,
    )

    cfg = ModelConfig(hidden_size=64, hidden_size_s2eg=64, n_layers=2)
    prev = os.environ.get("S2AG_GRU_ENGINE")
    try:
        os.environ["S2AG_GRU_ENGINE"] = "pallas"  # must be ignored inside
        f1 = canonical_train_step_flops(cfg, 4)
        os.environ.pop("S2AG_GRU_ENGINE", None)
        f2 = canonical_train_step_flops(cfg, 4)
    finally:
        if prev is None:
            os.environ.pop("S2AG_GRU_ENGINE", None)
        else:
            os.environ["S2AG_GRU_ENGINE"] = prev
    assert f1 and f1 > 1e6
    assert f1 == f2  # caller env does not leak into the canonical count
    # bigger batch => more flops, roughly linear in the batch-linear parts
    f8 = canonical_train_step_flops(cfg, 8)
    assert f8 > f1
