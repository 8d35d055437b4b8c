"""Converted-checkpoint parity for the v1 model family against the
reference's own modules (net/multimodal_context_net_v1.py,
net/ser_att_conv_rnn_v1.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.models import generator as G
from speech2affective_gestures_tpu.models.discriminator import AffDiscriminatorV1
from speech2affective_gestures_tpu.models.ser import AttConvRNN

from _reference_oracle import load, reference_v2_nets

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

HI = jax.default_matmul_precision("highest")
torch.manual_seed(5)
N_WORDS, N_SPK, EC = 60, 5, 7


def _v1_module():
    if reference_v2_nets() is None:  # installs librosa/cuda shims
        return None
    import importlib

    try:
        return importlib.import_module("net.multimodal_context_net_v1")
    except Exception:
        return None


class _Args:
    n_pre_poses = 4
    n_poses = 34
    hidden_size = 300
    n_layers = 4
    dropout_prob = 0.3
    input_context = "both"
    freeze_wordembed = False


class _FakeVocab:
    n_words = N_SPK


_FakeVocab.__name__ = "Vocab"


def _randomize_bn(tmod):
    for m in tmod.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.data.normal_(0, 0.2)
            m.running_var.data.uniform_(0.6, 1.4)


def test_v1_generator_parity(rng, monkeypatch):
    v1 = _v1_module()
    if v1 is None:
        pytest.skip("reference v1 nets not importable")
    import net.embedding_net as ref_en

    monkeypatch.setattr(ref_en, "re_parametrize", lambda mu, lv: mu)
    monkeypatch.setattr(G, "re_parametrize", lambda mu, lv, rng: mu)

    table = rng.standard_normal((N_WORDS, 300)).astype(np.float32)
    tmod = v1.PoseGenerator(_Args, 27, N_WORDS, 300, table, labels_size=EC,
                            z_obj=_FakeVocab())
    tmod.eval()
    _randomize_bn(tmod)

    pre = np.zeros((2, 34, 28), np.float32)
    pre[:, :4, :27] = rng.standard_normal((2, 4, 27)) * 0.1
    pre[:, :4, -1] = 1
    text = rng.integers(0, N_WORDS, (2, 34))
    audio = (rng.standard_normal((2, C.EXPECTED_AUDIO_LENGTH)) * 0.1
             ).astype(np.float32)
    emo = np.eye(EC, dtype=np.float32)[rng.integers(0, EC, 2)]
    vids = rng.integers(0, N_SPK, (2,))
    with torch.no_grad():
        want, *_ = tmod(
            torch.from_numpy(pre), torch.from_numpy(text).long(),
            torch.from_numpy(audio), torch.from_numpy(emo),
            torch.from_numpy(vids).long(),
        )

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = ck.pose_generator_v1(sd)
    mod = G.PoseGeneratorV1(num_emotions=EC, n_words=N_WORDS,
                            word_embeddings=table, n_speakers=N_SPK)
    with HI:
        got, *_ = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(pre), jnp.asarray(text.astype(np.int32)),
            jnp.asarray(audio), jnp.asarray(emo),
            jnp.asarray(vids.astype(np.int32)),
            train=False, rngs={"noise": jax.random.key(0)},
        )
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_v1_discriminator_parity(rng):
    v1 = _v1_module()
    if v1 is None:
        pytest.skip("reference v1 nets not importable")
    tmod = v1.AffDiscriminator(27, EC)
    tmod.eval()
    _randomize_bn(tmod)
    poses = rng.standard_normal((2, 34, 27)).astype(np.float32) * 0.3
    emo = np.eye(EC, dtype=np.float32)[rng.integers(0, EC, 2)]
    with torch.no_grad():
        want = tmod(torch.from_numpy(poses), torch.from_numpy(emo)).numpy()

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = ck.aff_discriminator_v1(sd)
    mod = AffDiscriminatorV1(num_emotions=EC)
    with HI:
        got = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(poses), jnp.asarray(emo), train=False,
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_ser_att_conv_rnn_parity(rng):
    ser_mod = load("net/ser_att_conv_rnn_v1.py", "_ref_ser_parity")
    if ser_mod is None:
        pytest.skip("reference SER net not importable")
    tmod = ser_mod.AttConvRNN(C=3, H=300, W=40, EC=EC, dropout_prob=0.0)
    tmod.eval()
    _randomize_bn(tmod)
    x = rng.standard_normal((2, 3, 300, 40)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = ck.att_conv_rnn(sd)
    mod = AttConvRNN(num_emotions=EC, dropout_prob=0.0)
    with HI:
        got = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
            train=False,
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
