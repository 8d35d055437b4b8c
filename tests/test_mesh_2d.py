"""2-D (data, model) mesh: sharded embedding survives a full train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.parallel import mesh as pmesh
from speech2affective_gestures_tpu.train import builder

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


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
    # train_step donates its input state — snapshot before the step
    host_state = jax.device_get(setup["state"])
    state = pmesh.shard_params_2d(host_state, mesh_2d)
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
    old = host_state.gen_params["text_encoder"]["embedding"]["embedding"]
    assert float(jnp.abs(emb - jax.device_put(old, emb.sharding)).sum()) > 0


def test_mesh_step_numerically_equals_single_device(mesh_2d):
    """The 8-device (4 data x 2 model) step must produce the SAME metrics
    and parameter updates as a plain single-device step on the same batch
    and key — BatchNorm included, because our BN reduces over the GLOBAL
    batch under sharding (deliberately diverging from nn.DataParallel's
    per-replica stats, reference processor_v2.py:167-172; COMPONENTS.md
    §2.7 documents this as the tested semantic)."""
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=2048, n_speakers=10,
        with_trimodal=False,
    )
    host_batch = builder.synthetic_batch(
        np.random.default_rng(3), 8, cfg, 2048, 10
    )

    # train_step donates its input state — give each step a fresh copy
    host_state = jax.device_get(setup["state"])
    state = pmesh.shard_params_2d(host_state, mesh_2d)
    step = pmesh.data_parallel_step(setup["train_step"], mesh_2d)
    multi_state, multi_metrics = step(
        state, pmesh.shard_batch(dict(host_batch), mesh_2d),
        jax.random.key(9), gan_on=True,
    )

    single_state, single_metrics = setup["train_step"](
        jax.device_put(host_state), jax.device_put(host_batch),
        jax.random.key(9), gan_on=True,
    )

    for k in single_metrics:
        np.testing.assert_allclose(
            float(multi_metrics[k]), float(single_metrics[k]),
            rtol=1e-3, atol=1e-5, err_msg=f"metric {k}",
        )
    # params: Adam's first step is ~sign(grad)*lr, so elements whose grad
    # is ~0 can flip sign under cross-device reduction-order noise — a
    # float artifact, not a semantic divergence. Allow up to 2*lr (1e-3)
    # absolute on params while keeping metrics/BN strict above/below.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=1e-4, atol=1.1e-3,
        ),
        multi_state.gen_params, single_state.gen_params,
    )
    # BN running stats agree: global-batch semantics on the mesh. Variance
    # suffers f32 cancellation under the partitioned reduction (~1e-3
    # relative observed), hence the looser bound than the metrics above.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=5e-3, atol=1e-4,
        ),
        multi_state.gen_stats, single_state.gen_stats,
    )

def test_tensor_parallel_step_numerically_equals_single_device(mesh_2d):
    """tp_min_cols column-shards the wide gate kernels over 'model'
    (tensor parallelism): the step must still match the single-device
    step bit-for-float — GSPMD inserts the collectives, semantics are
    unchanged (same invariant as the row-sharded test above)."""
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=2048, n_speakers=10,
        with_trimodal=False,
    )
    host_batch = builder.synthetic_batch(
        np.random.default_rng(3), 8, cfg, 2048, 10
    )
    host_state = jax.device_get(setup["state"])
    state = pmesh.shard_params_2d(host_state, mesh_2d,
                                  tp_min_cols=3 * cfg.hidden_size)
    # the GRU gate matrices (cin, 3H) must actually be column-sharded
    col = [x for x in jax.tree.leaves(state.gen_params)
           if getattr(x, "ndim", 0) == 2
           and tuple(x.sharding.spec) == (None, "model")]
    assert col, "no kernel picked up the (None, 'model') tp sharding"
    step = pmesh.data_parallel_step(setup["train_step"], mesh_2d)
    multi_state, multi_metrics = step(
        state, pmesh.shard_batch(dict(host_batch), mesh_2d),
        jax.random.key(9), gan_on=True,
    )
    single_state, single_metrics = setup["train_step"](
        jax.device_put(host_state), jax.device_put(host_batch),
        jax.random.key(9), gan_on=True,
    )
    for k in single_metrics:
        np.testing.assert_allclose(
            float(multi_metrics[k]), float(single_metrics[k]),
            rtol=1e-3, atol=1e-5, err_msg=f"metric {k}",
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=1e-4, atol=1.1e-3,
        ),
        multi_state.gen_params, single_state.gen_params,
    )
    # BN running stats agree too (same bound + rationale as the row-sharded
    # test above — a tp-induced BN-stat divergence must not hide)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=5e-3, atol=1e-4,
        ),
        multi_state.gen_stats, single_state.gen_stats,
    )
    # updated tp kernels keep their column sharding through the optimizer
    still_col = [x for x in jax.tree.leaves(multi_state.gen_params)
                 if getattr(x, "ndim", 0) == 2
                 and tuple(x.sharding.spec) == (None, "model")]
    assert len(still_col) == len(col)


def test_mixed_precision_step_on_mesh(mesh_2d):
    """Production mode is mixed precision + data parallelism together: the
    bf16 step must run under the 8-device mesh with finite metrics and f32
    master params intact."""
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=2048, n_speakers=10,
        with_trimodal=False, mixed_precision=True,
    )
    host_state = jax.device_get(setup["state"])
    state = pmesh.shard_params_2d(host_state, mesh_2d)
    batch = pmesh.shard_batch(
        builder.synthetic_batch(np.random.default_rng(2), 8, cfg, 2048, 10),
        mesh_2d,
    )
    step = pmesh.data_parallel_step(setup["train_step"], mesh_2d)
    new_state, metrics = step(state, batch, jax.random.key(4), gan_on=True)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree.leaves(new_state.gen_params):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
    assert len(jax.tree.leaves(new_state.gen_params)[0].sharding.device_set) == 8
