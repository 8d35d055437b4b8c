"""2-D (data, model) mesh: sharded embedding survives a full train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.parallel import mesh as pmesh
from speech2affective_gestures_tpu.train import builder


@pytest.fixture(scope="module")
def mesh_2d():
    devices = jax.devices()[:8]
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh_2d(4, 2, devices)


def test_shard_params_2d_places_tables(mesh_2d):
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=2048, n_speakers=10,
        with_trimodal=False,
    )
    state = pmesh.shard_params_2d(setup["state"], mesh_2d)
    emb = state.gen_params["text_encoder"]["embedding"]["embedding"]
    assert tuple(emb.sharding.spec)[:1] == ("model",)
    # small params replicated
    small = state.gen_params["out2"]["bias"]
    assert small.sharding.spec == jax.sharding.PartitionSpec()


def test_train_step_on_2d_mesh(mesh_2d):
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=2048, n_speakers=10,
        with_trimodal=False,
    )
    state = pmesh.shard_params_2d(setup["state"], mesh_2d)
    batch = pmesh.shard_batch(
        builder.synthetic_batch(np.random.default_rng(0), 8, cfg, 2048, 10),
        mesh_2d,
    )
    step = pmesh.data_parallel_step(setup["train_step"], mesh_2d)
    new_state, metrics = step(state, batch, jax.random.key(1), gan_on=True)
    assert np.isfinite(float(metrics["loss"]))
    emb = new_state.gen_params["text_encoder"]["embedding"]["embedding"]
    assert "model" in tuple(emb.sharding.spec)
    # the embedding actually changed (optimizer update flowed through the
    # sharded table)
    old = setup["state"].gen_params["text_encoder"]["embedding"]["embedding"]
    assert float(jnp.abs(emb - jax.device_put(old, emb.sharding)).sum()) > 0