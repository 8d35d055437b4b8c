"""Converted-checkpoint parity against the reference's OWN ablation modules
(net/multimodal_context_net_v2_abl_audio.py / _abl_aff.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.models import discriminator as D
from speech2affective_gestures_tpu.models import generator as G

from _reference_oracle import reference_abl_nets

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

HI = jax.default_matmul_precision("highest")
torch.manual_seed(3)
N_WORDS, N_SPK = 80, 6


class _Args:
    n_pre_poses = 4
    n_poses = 34
    hidden_size = 300
    hidden_size_s2eg = 300
    n_layers = 4
    dropout_prob = 0.3
    input_context = "both"
    freeze_wordembed = False


class _FakeVocab:
    n_words = N_SPK


_FakeVocab.__name__ = "Vocab"


def _deterministic_z(ref_mod, monkeypatch):
    import net.embedding_net as ref_en

    monkeypatch.setattr(ref_en, "re_parametrize", lambda mu, log_var: mu)
    monkeypatch.setattr(G, "re_parametrize", lambda mu, log_var, rng: mu)


def _randomize_bn(tmod):
    for m in tmod.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.data.normal_(0, 0.2)
            m.running_var.data.uniform_(0.6, 1.4)


def _inputs(rng, batch=2):
    pre = np.zeros((batch, 34, 28), np.float32)
    pre[:, :4, :27] = rng.standard_normal((batch, 4, 27)) * 0.1
    pre[:, :4, -1] = 1
    text = rng.integers(0, N_WORDS, (batch, 34))
    audio = (rng.standard_normal((batch, C.EXPECTED_AUDIO_LENGTH)) * 0.1
             ).astype(np.float32)
    vids = rng.integers(0, N_SPK, (batch,))
    return pre, text, audio, vids


def test_abl_audio_generator_parity(rng, monkeypatch):
    ref = reference_abl_nets("abl_audio")
    if ref is None:
        pytest.skip("reference abl_audio not importable")
    _deterministic_z(ref, monkeypatch)
    table = rng.standard_normal((N_WORDS, 300)).astype(np.float32)
    tmod = ref.PoseGenerator(_Args, 27, N_WORDS, 300, table,
                             mfcc_length=71, num_mfcc=37, time_steps=34,
                             z_obj=_FakeVocab())
    tmod.eval()
    _randomize_bn(tmod)
    pre, text, audio, vids = _inputs(rng)
    with torch.no_grad():
        want, *_ = tmod(torch.from_numpy(pre), torch.from_numpy(text).long(),
                        torch.from_numpy(audio), torch.from_numpy(vids).long())

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = ck.pose_generator(sd, variant="abl_audio")
    mod = G.PoseGenerator(n_words=N_WORDS, word_embeddings=table,
                          n_speakers=N_SPK, audio_encoder_type="wav")
    with HI:
        got, *_ = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(pre), jnp.asarray(text.astype(np.int32)),
            jnp.asarray(audio), jnp.asarray(vids.astype(np.int32)),
            train=False, rngs={"noise": jax.random.key(0)},
        )
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_abl_aff_generator_and_discriminator_parity(rng, monkeypatch):
    ref = reference_abl_nets("abl_aff")
    if ref is None:
        pytest.skip("reference abl_aff not importable")
    _deterministic_z(ref, monkeypatch)
    table = rng.standard_normal((N_WORDS, 300)).astype(np.float32)
    tmod = ref.PoseGenerator(_Args, 27, N_WORDS, 300, table,
                             mfcc_length=71, num_mfcc=37, time_steps=34,
                             z_obj=_FakeVocab())
    tmod.eval()
    _randomize_bn(tmod)
    pre, text, _, vids = _inputs(rng)
    mfcc = rng.standard_normal((2, 37, 71)).astype(np.float32)
    with torch.no_grad():
        want, *_ = tmod(torch.from_numpy(pre), torch.from_numpy(text).long(),
                        torch.from_numpy(mfcc), torch.from_numpy(vids).long())

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = ck.pose_generator(sd, variant="abl_aff")
    mod = G.PoseGenerator(n_words=N_WORDS, word_embeddings=table,
                          n_speakers=N_SPK, use_aff_encoder=False)
    with HI:
        got, *_ = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(pre), jnp.asarray(text.astype(np.int32)),
            jnp.asarray(mfcc), jnp.asarray(vids.astype(np.int32)),
            train=False, rngs={"noise": jax.random.key(0)},
        )
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-3, atol=2e-4)

    # the ablation's plain ConvDiscriminator through the abl converter
    tdis = ref.ConvDiscriminator(27)
    tdis.eval()
    _randomize_bn(tdis)
    poses = rng.standard_normal((2, 34, 27)).astype(np.float32) * 0.3
    with torch.no_grad():
        want_d = tdis(torch.from_numpy(poses)).numpy()
    blob = {
        "gen_model_dict": sd,
        "dis_model_dict": {k: v.detach().numpy()
                           for k, v in tdis.state_dict().items()},
    }
    _, dis_vars = ck.convert_s2ag_checkpoint(blob, variant="abl_aff")
    with HI:
        got_d = D.ConvDiscriminator().apply(dis_vars, jnp.asarray(poses),
                                            train=False)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-3, atol=1e-4)
