"""fused_pass (GanConfig.fused_pass): double-batch forward fusion.

The opt-in perf mode runs the G-step main + diversity-regularizer generator
forwards as ONE 2B-batch forward and the D-step real+fake discriminator
forwards as ONE 2B-batch forward (they share parameters and all non-speaker
inputs, ref processor_v2.py:899-906 / :806-815). These tests pin down:

1. the batching math itself — a concat-forward equals the concat of
   separate forwards wherever the network is deterministic (eval mode),
   i.e. no cross-sample leakage and correct split indexing;
2. the fused train step runs, produces the same metric surface, finite
   values near the unfused ones, and updates both networks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.models.discriminator import AffDiscriminator
from speech2affective_gestures_tpu.models.generator import PoseGenerator
from speech2affective_gestures_tpu.train import builder

pytestmark = pytest.mark.slow  # compile-heavy

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
N_WORDS, N_SPK = 40, 12


def _batch(seed=0, bs=8):
    return builder.synthetic_batch(
        np.random.default_rng(seed), bs, CFG, N_WORDS, N_SPK
    )


def test_dis_concat_forward_equals_separate_eval():
    """Eval-mode D is deterministic: D(concat(a, b)) == concat(D(a), D(b))
    exactly (validates the fused D-step's batching)."""
    dis = AffDiscriminator(n_poses=CFG.n_poses)
    a = jnp.asarray(_batch(1)["vec_seq"])
    b = jnp.asarray(_batch(2)["vec_seq"])
    variables = dis.init(jax.random.key(0), a)
    single = jnp.concatenate(
        [dis.apply(variables, a, train=False),
         dis.apply(variables, b, train=False)], axis=0)
    fused = dis.apply(variables, jnp.concatenate([a, b], axis=0), train=False)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(single))


def test_gen_concat_forward_equals_separate_eval():
    """Eval-mode G with z_type='none' is deterministic: the 2B concat
    forward equals the concat of two B forwards exactly through
    AffEncoder + MFCCEncoder + TextEncoderTCN + bi-GRU + head."""
    gen = PoseGenerator(
        pose_dim=27, n_words=N_WORDS, word_embed_size=32,
        time_steps=CFG.n_poses, hidden_size=64, n_layers=2,
        z_type="none",
    )
    ba, bb = _batch(3), _batch(4)
    pre = jnp.zeros((8, CFG.n_poses, 28))
    text_a = jnp.asarray(ba["extended_word_seq"])
    text_b = jnp.asarray(bb["extended_word_seq"])
    mfcc_a = jnp.asarray(ba["mfcc_features"])
    mfcc_b = jnp.asarray(bb["mfcc_features"])
    variables = gen.init({"params": jax.random.key(0)}, pre, text_a, mfcc_a)

    out_a, *_ = gen.apply(variables, pre, text_a, mfcc_a, train=False)
    out_b, *_ = gen.apply(variables, pre, text_b, mfcc_b, train=False)
    out2, *_ = gen.apply(
        variables,
        jnp.concatenate([pre, pre], axis=0),
        jnp.concatenate([text_a, text_b], axis=0),
        jnp.concatenate([mfcc_a, mfcc_b], axis=0),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out2[:8]), np.asarray(out_a),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2[8:]), np.asarray(out_b),
                               rtol=0, atol=1e-6)


@pytest.fixture(scope="module")
def pair():
    """Same init under fused and unfused steps (init is fusion-agnostic)."""
    unfused = builder.init_training(
        CFG, jax.random.key(0), n_words=N_WORDS, n_speakers=N_SPK
    )
    fused = builder.init_training(
        CFG, jax.random.key(0), n_words=N_WORDS, n_speakers=N_SPK,
        fused_pass=True,
    )
    host = jax.device_get(unfused["state"])
    return unfused, fused, host


def test_fused_step_same_metric_surface_and_finite(pair):
    unfused, fused, host = pair
    batch = _batch()
    _, m_ref = unfused["train_step"](jax.device_put(host), batch,
                                     jax.random.key(1), gan_on=True)
    _, m_fused = fused["train_step"](jax.device_put(host), batch,
                                     jax.random.key(1), gan_on=True)
    assert set(m_fused) == set(m_ref)
    for k, v in m_fused.items():
        assert np.isfinite(float(v)), k
    # same formulas on the same init: values land near the unfused ones
    # (they differ only through dropout/noise draw layout + BN batch size)
    for k in ("loss", "s2ag_l1"):
        ref, got = float(m_ref[k]), float(m_fused[k])
        assert abs(got - ref) <= 0.5 * abs(ref) + 1e-3, (k, ref, got)


def test_fused_step_updates_both_nets(pair):
    _, fused, host = pair
    new_state, _ = fused["train_step"](jax.device_put(host), _batch(),
                                       jax.random.key(2), gan_on=True)

    def delta(a, b):
        return jax.tree.reduce(
            lambda x, y: x + y,
            jax.tree.map(lambda p, q: float(jnp.abs(p - q).sum()), a, b),
        )

    assert delta(new_state.gen_params, host.gen_params) > 0.0
    assert delta(new_state.dis_params, host.dis_params) > 0.0


def test_fused_step_warmup_no_gan(pair):
    """gan_on=False path: no D update, fused div-reg forward still runs."""
    _, fused, host = pair
    _, metrics = fused["train_step"](jax.device_put(host), _batch(),
                                     jax.random.key(3), gan_on=False)
    assert "dis" not in metrics and "gen" not in metrics
    assert "DIV_REG" in metrics and np.isfinite(float(metrics["DIV_REG"]))
