"""v1 (SER + emotion-conditioned s2eg) models and paper ablations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.data import iemocap
from speech2affective_gestures_tpu.models import layers as L
from speech2affective_gestures_tpu.models.discriminator import AffDiscriminatorV1
from speech2affective_gestures_tpu.models.generator import PoseGeneratorV1
from speech2affective_gestures_tpu.models.ser import AttConvRNN, AttConvRNNv2
from speech2affective_gestures_tpu.train import builder, ser_trainer
from speech2affective_gestures_tpu.train.gan_step import create_train_state

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

HI = jax.default_matmul_precision("highest")
CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)


def test_lstm_torch_parity(rng):
    tmod = tnn.LSTM(12, 16, batch_first=True, bidirectional=True)
    x = rng.standard_normal((3, 10, 12)).astype(np.float32)
    want, _ = tmod(torch.from_numpy(x))
    state = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params = {"params": ck.gru(state, "", 1, True)}  # same layout as GRU
    mod = L.LSTM(16, bidirectional=True)
    with HI:
        got, _ = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_psf_logfbank_parity(rng):
    """numpy logfbank vs python_speech_features (if available) or shape/
    finiteness invariants."""
    sig = (rng.standard_normal(16000) * 1000).astype(np.int16)
    feats = iemocap.logfbank(sig, 16000, nfilt=40)
    assert feats.shape[1] == 40
    assert np.isfinite(feats).all()
    try:
        import python_speech_features as psf

        want = psf.logfbank(sig, 16000, nfilt=40)
        np.testing.assert_allclose(feats, want, rtol=1e-5, atol=1e-6)
    except ImportError:
        pass
    d1 = iemocap.delta(feats, 2)
    assert d1.shape == feats.shape


def test_iemocap_blocks_and_labels(rng):
    sig = (rng.standard_normal(16000 * 5) * 1000).astype(np.int16)
    blocks = iemocap.wav_to_blocks(sig, 16000)
    assert all(b[0].shape == (300, 40) for b in blocks)
    assert len(blocks) > 1  # 5s clip -> multiple stride-100 windows
    onehot = iemocap.extract_07_categorical_emotions("exc")
    assert onehot[iemocap.EMOTIONS_07.index("hap")] == 1
    onehot = iemocap.extract_07_categorical_emotions("fru")
    assert onehot[iemocap.EMOTIONS_07.index("ang")] == 1


def test_ser_forward_and_train_step(rng):
    mod = AttConvRNN(num_emotions=7)
    x = rng.standard_normal((2, 300, 40, 3)).astype(np.float32)
    labels = np.eye(7, dtype=np.float32)[rng.integers(0, 7, 2)]
    variables = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x),
    )
    logits = mod.apply(variables, jnp.asarray(x))
    assert logits.shape == (2, 7)

    opt = ser_trainer.make_ser_optimizer("sgd", lr=1e-3)
    step = ser_trainer.make_ser_train_step(mod.apply, opt)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = opt.init(params)
    # dropout_prob=1.0 (reference default) zeroes activations; use eval-prob
    mod2 = AttConvRNN(num_emotions=7, dropout_prob=0.2)
    variables2 = mod2.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x),
    )
    step2 = ser_trainer.make_ser_train_step(mod2.apply, opt)
    p2, s2 = variables2["params"], variables2["batch_stats"]
    o2 = opt.init(p2)
    p2_new, s2_new, o2_new, metrics = step2(
        p2, s2, o2, jnp.asarray(x), jnp.asarray(labels), jax.random.key(2)
    )
    assert np.isfinite(float(metrics["loss"]))
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p2, p2_new),
    )
    assert delta > 0

    eval_step = ser_trainer.make_ser_eval_step(mod2.apply)
    pred, one_hot, acc = eval_step(p2_new, s2_new, jnp.asarray(x),
                                   jnp.asarray(labels))
    assert one_hot.shape == (2, 7)
    assert np.all(one_hot.sum(axis=-1) == 1)


def test_ser_v2_forward(rng):
    mod = AttConvRNNv2(num_emotions=7)
    x = rng.standard_normal((2, 300, 40, 3)).astype(np.float32)
    variables = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x),
    )
    logits = mod.apply(variables, jnp.asarray(x))
    assert logits.shape == (2, 7)


def _v1_inputs(rng, batch=2):
    pre = rng.standard_normal((batch, 34, 28)).astype(np.float32)
    text = rng.integers(0, 30, (batch, 34)).astype(np.int32)
    audio = rng.standard_normal((batch, C.EXPECTED_AUDIO_LENGTH)).astype(np.float32)
    emo = np.eye(7, dtype=np.float32)[rng.integers(0, 7, batch)]
    vids = rng.integers(0, 5, (batch,)).astype(np.int32)
    return pre, text, audio, emo, vids


def test_v1_generator_and_discriminator(rng):
    pre, text, audio, emo, vids = _v1_inputs(rng)
    gen = PoseGeneratorV1(n_words=30, n_speakers=5, hidden_size=32, n_layers=2)
    gvars = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, text, audio, emo, vids,
    )
    out, z, mu, logvar = gen.apply(
        gvars, pre, text, audio, emo, vids, rngs={"noise": jax.random.key(2)}
    )
    assert out.shape == (2, 34, 27)
    assert z.shape == (2, 16 + 7)  # z concat emotion

    dis = AffDiscriminatorV1(num_emotions=7)
    dvars = dis.init(jax.random.key(0), jnp.asarray(out), jnp.asarray(emo))
    prob = dis.apply(dvars, jnp.asarray(out), jnp.asarray(emo))
    assert prob.shape == (2, 1)
    assert np.all((np.asarray(prob) > 0) & (np.asarray(prob) < 1))


def test_v1_s2eg_train_step(rng):
    pre, text, audio, emo, vids = _v1_inputs(rng, batch=4)
    gen = PoseGeneratorV1(n_words=30, n_speakers=5, hidden_size=32, n_layers=2)
    dis = AffDiscriminatorV1(num_emotions=7)
    gvars = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, text, audio, emo, vids,
    )
    target = rng.standard_normal((4, 34, 27)).astype(np.float32) * 0.1
    dvars = dis.init(jax.random.key(2), jnp.asarray(target), jnp.asarray(emo))

    from speech2affective_gestures_tpu.train.gan_step import GanConfig

    cfg = GanConfig()
    state = create_train_state(gvars, dvars, cfg)
    step = ser_trainer.make_s2eg_train_step(gen.apply, dis.apply, cfg)
    batch = {
        "extended_word_seq": jnp.asarray(text),
        "audio": jnp.asarray(audio),
        "emo_labels": jnp.asarray(emo),
        "vec_seq": jnp.asarray(target),
        "vid_indices": jnp.asarray(vids),
    }
    new_state, metrics = step(state, batch, jax.random.key(3), gan_on=True)
    for k in ("loss", "dis", "gen", "KLD", "DIV_REG", "s2eg_l1"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


@pytest.mark.parametrize("variant", ["abl_audio", "abl_aff"])
def test_ablation_variants_train(variant):
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=30, n_speakers=5, variant=variant,
        with_trimodal=False,
    )
    batch = builder.synthetic_batch(np.random.default_rng(0), 4, cfg, 30, 5)
    new_state, metrics = setup["train_step"](
        setup["state"], jax.device_put(batch), jax.random.key(1), gan_on=True
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["dis"]))
