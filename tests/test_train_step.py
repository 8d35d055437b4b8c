"""GAN train/eval step: runs, updates params, loss composition, and
data-parallel execution over the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.parallel import mesh as pmesh
from speech2affective_gestures_tpu.train import builder
from speech2affective_gestures_tpu.train.gan_step import build_pre_seq

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

# canonical tiny test config — width is irrelevant to what these tests pin
# (step semantics, not numerics-at-width); h32 roughly halves the compile
# time that dominates this file on a 1-core host
CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
N_WORDS, N_SPK = 40, 12


@pytest.fixture(scope="module")
def setup():
    s = builder.init_training(
        CFG, jax.random.key(0), n_words=N_WORDS, n_speakers=N_SPK
    )
    # train_step DONATES its input TrainState; keep a host-side snapshot so
    # every test gets fresh device buffers and before/after comparisons
    # read never-donated host arrays
    s["host_state"] = jax.device_get(s["state"])
    return s


@pytest.fixture()
def fresh_state(setup):
    return jax.device_put(setup["host_state"])


def _batch(seed=0, bs=8):
    return builder.synthetic_batch(
        np.random.default_rng(seed), bs, CFG, N_WORDS, N_SPK
    )


def test_pre_seq_construction():
    target = jnp.ones((2, 34, 27))
    pre = build_pre_seq(target, 4)
    assert pre.shape == (2, 34, 28)
    np.testing.assert_array_equal(np.asarray(pre[:, :4, -1]), 1.0)
    np.testing.assert_array_equal(np.asarray(pre[:, 4:]), 0.0)
    np.testing.assert_array_equal(np.asarray(pre[:, :4, :-1]), 1.0)


def test_train_step_updates_both_nets(setup, fresh_state):
    state = setup["host_state"]
    new_state, metrics = setup["train_step"](
        fresh_state, _batch(), jax.random.key(1), gan_on=True
    )
    # params changed
    g_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.gen_params, new_state.gen_params,
        ),
    )
    d_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.dis_params, new_state.dis_params,
        ),
    )
    assert g_delta > 0 and d_delta > 0
    assert int(new_state.step) == 1
    for key in ("loss", "KLD", "DIV_REG", "gen", "dis", "s2ag_l1",
                "s2ag_vs_trimodal_l1"):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key


def test_warmup_skips_discriminator(setup, fresh_state):
    state = setup["host_state"]
    new_state, metrics = setup["train_step"](
        fresh_state, _batch(), jax.random.key(1), gan_on=False
    )
    assert "dis" not in metrics and "gen" not in metrics
    d_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.dis_params, new_state.dis_params,
        ),
    )
    assert d_delta == 0.0  # D untouched during warmup


def test_eval_step_no_mutation(setup, fresh_state):
    out, metrics = setup["eval_step"](
        fresh_state, _batch(3), jax.random.key(2), gan_on=True
    )
    assert out.shape == (8, CFG.n_poses, 27)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["dis"]))


def test_loss_decreases_on_regression_objective(setup, fresh_state):
    """A few steps of pure-regression training should reduce the Huber term."""
    state = fresh_state
    batch = _batch(7, bs=16)
    first = None
    for i in range(8):
        state, metrics = setup["train_step"](
            state, batch, jax.random.key(10 + i), gan_on=False
        )
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_data_parallel_step_matches_semantics(setup, mesh8):
    """Same step under the 8-device mesh: runs, shards the batch, and yields
    finite metrics; state stays replicated."""
    state = pmesh.replicate_state(setup["host_state"], mesh8)
    batch = pmesh.shard_batch(_batch(5, bs=16), mesh8)
    step = pmesh.data_parallel_step(setup["train_step"], mesh8)
    new_state, metrics = step(state, batch, jax.random.key(3), gan_on=True)
    assert np.isfinite(float(metrics["loss"]))
    # output state is addressable on all 8 devices (replicated)
    leaf = jax.tree.leaves(new_state.gen_params)[0]
    assert len(leaf.sharding.device_set) == 8
