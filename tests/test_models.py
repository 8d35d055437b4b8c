"""Model-stack tests.

Parity strategy:
- STGraphConv / TemporalConvNet: converted-weight parity against the
  *importable* reference modules (net/utils/tgcn.py, net/tcn.py — torch-only
  imports, used as behavioral oracles);
- MFCCEncoder / WavEncoder / ConvDiscriminatorTriModal conv stack: parity
  against torch stacks constructed per the reference architecture;
- PoseGenerator / AffDiscriminator / TriModal / EmbeddingNet: shape, finite,
  determinism and jit tests (their submodules are covered above).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.models import (
    discriminator as D,
    embedding_net as E,
    encoders as enc,
    generator as G,
    stgcn,
    tcn as tcn_mod,
)
from speech2affective_gestures_tpu.ops import graph as graph_ops

from _reference_oracle import reference_tcn, reference_tgcn

torch.manual_seed(7)
HI = jax.default_matmul_precision("highest")


def _np(t):
    return t.detach().numpy()


def _sd(mod):
    return {k: _np(v) for k, v in mod.state_dict().items()}


# --------------------------------------------------------------------------
# oracle parity: ST-GCN
# --------------------------------------------------------------------------

@pytest.mark.parametrize("cin,v,links", [
    (3, 9, list(C.DIR_EDGE_PAIRS)),
    (48, 3, list(C.BODY_PARTS_EDGE_PAIRS)),
])
def test_stgraphconv_parity(rng, cin, v, links):
    ref_tgcn = reference_tgcn()
    if ref_tgcn is None:
        pytest.skip("reference tgcn not importable")
    a_np = graph_ops.build_adjacency(v, links, "spatial", max_hop=2)
    k = a_np.shape[0]
    sk = 5 if v == 9 else 3
    tmod = ref_tgcn.STGraphConv(
        cin, 16, k, (9, sk), stride=(1, 1), padding=(4, (sk - 1) // 2)
    )
    tmod.eval()
    # randomize BN running stats so eval-mode parity is non-trivial
    for m in tmod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.3)
            m.running_var.data.uniform_(0.5, 1.5)

    x = rng.standard_normal((2, cin, 34, v)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmod(torch.from_numpy(x), torch.from_numpy(a_np).float())

    params, stats = ck.st_graph_conv(_sd(tmod), "")
    mod = stgcn.STGraphConv(16, k, (9, sk), padding=(4, (sk - 1) // 2))
    with HI:
        got = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(a_np, jnp.float32),
            train=False,
        )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), _np(want), rtol=1e-3, atol=1e-4
    )


def test_temporal_conv_net_parity(rng):
    ref_tcn = reference_tcn()
    if ref_tcn is None:
        pytest.skip("reference tcn not importable")
    tmod = ref_tcn.TemporalConvNet(300, [300] * 4, kernel_size=2, dropout=0.3)
    tmod.eval()
    x = rng.standard_normal((2, 300, 34)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x))

    params = ck.temporal_conv_net(_sd(tmod), "", 4)
    mod = tcn_mod.TemporalConvNet((300,) * 4, kernel_size=2, dropout=0.3)
    with HI:
        got = mod.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 1)),
            deterministic=True,
        )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), _np(want), rtol=1e-3, atol=1e-4
    )


# --------------------------------------------------------------------------
# torch-stack parity: conv encoders
# --------------------------------------------------------------------------

class _TorchMFCCEncoder(tnn.Module):
    """MFCCEncoder per net/multimodal_context_net_v2.py:36-58."""

    def __init__(self, mfcc_length=71, num_mfcc=37, time_steps=34):
        super().__init__()
        self.conv1 = tnn.Conv1d(mfcc_length, 64, 5, padding=2)
        self.batch_norm1 = tnn.BatchNorm1d(64)
        self.conv2 = tnn.Conv1d(64, 64, 5, padding=2)
        self.batch_norm2 = tnn.BatchNorm1d(64)
        self.conv3 = tnn.Conv1d(64, 48, 3, padding=1)
        self.batch_norm3 = tnn.BatchNorm1d(48)
        self.conv4 = tnn.Conv1d(48, time_steps, 3, padding=1)
        self.batch_norm4 = tnn.BatchNorm1d(time_steps)
        self.linear1 = tnn.Linear(num_mfcc, 32)
        self.act = tnn.LeakyReLU(0.3)

    def forward(self, x):
        x = self.act(self.batch_norm1(self.conv1(x.permute(0, 2, 1))))
        x = self.act(self.batch_norm2(self.conv2(x)))
        x = self.act(self.batch_norm3(self.conv3(x)))
        x = self.act(self.batch_norm4(self.conv4(x)))
        return self.act(self.linear1(x))


def test_mfcc_encoder_parity(rng):
    tmod = _TorchMFCCEncoder()
    tmod.eval()
    for m in tmod.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.data.normal_(0, 0.3)
            m.running_var.data.uniform_(0.5, 1.5)
    x = rng.standard_normal((2, 37, 71)).astype(np.float32)
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x)))

    sd = _sd(tmod)
    params, stats = ck.mfcc_encoder(sd, "")
    mod = enc.MFCCEncoder(time_steps=34)
    with HI:
        got = mod.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


class _TorchWavEncoder(tnn.Module):
    """WavEncoder per net/multimodal_context_net_v2.py:14-33."""

    def __init__(self):
        super().__init__()
        self.feat_extractor = tnn.Sequential(
            tnn.Conv1d(1, 16, 15, stride=5, padding=1600),
            tnn.BatchNorm1d(16),
            tnn.LeakyReLU(0.3),
            tnn.Conv1d(16, 32, 15, stride=6),
            tnn.BatchNorm1d(32),
            tnn.LeakyReLU(0.3),
            tnn.Conv1d(32, 64, 15, stride=6),
            tnn.BatchNorm1d(64),
            tnn.LeakyReLU(0.3),
            tnn.Conv1d(64, 32, 15, stride=6),
        )

    def forward(self, wav):
        return self.feat_extractor(wav.unsqueeze(1)).transpose(1, 2)


def test_wav_encoder_parity(rng):
    tmod = _TorchWavEncoder()
    tmod.eval()
    x = rng.standard_normal((2, C.EXPECTED_AUDIO_LENGTH)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x)))
    assert want.shape == (2, 34, 32)

    params, stats = ck.wav_encoder(_sd(tmod), "")
    with HI:
        got = enc.WavEncoder().apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------------
# full models: shape / determinism / jit
# --------------------------------------------------------------------------

def _gen_inputs(rng, batch=2):
    pre_seq = rng.standard_normal((batch, C.N_POSES, C.POSE_DIM + 1)).astype(np.float32)
    in_text = rng.integers(0, 50, (batch, C.N_POSES)).astype(np.int32)
    in_mfcc = rng.standard_normal((batch, 37, 71)).astype(np.float32)
    in_audio = rng.standard_normal((batch, C.EXPECTED_AUDIO_LENGTH)).astype(np.float32)
    vids = rng.integers(0, 10, (batch,)).astype(np.int32)
    return pre_seq, in_text, in_mfcc, in_audio, vids


def test_pose_generator_forward(rng):
    pre_seq, in_text, in_mfcc, _, vids = _gen_inputs(rng)
    mod = G.PoseGenerator(n_words=50, n_speakers=10)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = mod.init(rngs, jnp.asarray(pre_seq), jnp.asarray(in_text),
                         jnp.asarray(in_mfcc), jnp.asarray(vids))
    out, z, mu, logvar = mod.apply(
        variables, jnp.asarray(pre_seq), jnp.asarray(in_text),
        jnp.asarray(in_mfcc), jnp.asarray(vids),
        rngs={"noise": jax.random.key(2)},
    )
    assert out.shape == (2, C.N_POSES, C.POSE_DIM)
    assert z.shape == (2, 16) and mu.shape == (2, 16) and logvar.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pose_generator_jit_and_noise_determinism(rng):
    pre_seq, in_text, in_mfcc, _, vids = _gen_inputs(rng)
    mod = G.PoseGenerator(n_words=50, n_speakers=10)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = mod.init(rngs, jnp.asarray(pre_seq), jnp.asarray(in_text),
                         jnp.asarray(in_mfcc), jnp.asarray(vids))

    @jax.jit
    def fwd(v, a, b, c, d, key):
        return mod.apply(v, a, b, c, d, rngs={"noise": key})[0]

    o1 = fwd(variables, pre_seq, in_text, in_mfcc, vids, jax.random.key(5))
    o2 = fwd(variables, pre_seq, in_text, in_mfcc, vids, jax.random.key(5))
    o3 = fwd(variables, pre_seq, in_text, in_mfcc, vids, jax.random.key(6))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))  # z changes output


def test_trimodal_generator_forward(rng):
    pre_seq, in_text, _, in_audio, vids = _gen_inputs(rng)
    mod = G.PoseGeneratorTriModal(n_words=50, n_speakers=10)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = mod.init(rngs, jnp.asarray(pre_seq), jnp.asarray(in_text),
                         jnp.asarray(in_audio), jnp.asarray(vids))
    out, z, *_ = mod.apply(
        variables, jnp.asarray(pre_seq), jnp.asarray(in_text),
        jnp.asarray(in_audio), jnp.asarray(vids),
        rngs={"noise": jax.random.key(2)},
    )
    assert out.shape == (2, C.N_POSES, C.POSE_DIM)
    assert np.isfinite(np.asarray(out)).all()


def test_aff_discriminator_forward(rng):
    poses = rng.standard_normal((2, C.N_POSES, C.POSE_DIM)).astype(np.float32)
    mod = D.AffDiscriminator()
    variables = mod.init(jax.random.key(0), jnp.asarray(poses))
    out = mod.apply(variables, jnp.asarray(poses))
    assert out.shape == (2, 1)
    assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))


def test_conv_discriminator_trimodal_parity(rng):
    """pre_conv stack parity incl. the LeakyReLU(True)==identity quirk."""

    class _TorchCDT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.pre_conv = tnn.Sequential(
                tnn.Conv1d(27, 16, 3), tnn.BatchNorm1d(16), tnn.LeakyReLU(True),
                tnn.Conv1d(16, 8, 3), tnn.BatchNorm1d(8), tnn.LeakyReLU(True),
                tnn.Conv1d(8, 8, 3),
            )
            self.gru = tnn.GRU(8, hidden_size=64, num_layers=4,
                               bidirectional=True, dropout=0.3, batch_first=True)
            self.out = tnn.Linear(64, 1)
            self.out2 = tnn.Linear(28, 1)

        def forward(self, poses):
            feat = self.pre_conv(poses.transpose(1, 2)).transpose(1, 2)
            o, _ = self.gru(feat)
            o = o[:, :, :64] + o[:, :, 64:]
            o = self.out(o.reshape(-1, o.shape[2])).view(poses.shape[0], -1)
            return torch.sigmoid(self.out2(o))

    tmod = _TorchCDT()
    tmod.eval()
    poses = rng.standard_normal((2, C.N_POSES, C.POSE_DIM)).astype(np.float32)
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(poses)))

    params, stats = ck.conv_discriminator_trimodal(_sd(tmod))
    mod = D.ConvDiscriminatorTriModal()
    with HI:
        got = mod.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(poses),
            train=False,
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_embedding_net_pose_mode(rng):
    poses = rng.standard_normal((4, C.N_POSES, C.POSE_DIM)).astype(np.float32)
    mod = E.EmbeddingNet()
    variables = mod.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        None, None, poses[:, :4], jnp.asarray(poses),
    )
    (_, _, _, feat, mu, logvar, recon) = mod.apply(
        variables, None, None, poses[:, :4], jnp.asarray(poses),
    )
    assert feat.shape == (4, 32)
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(mu))  # z == mu
    assert recon.shape == (4, C.N_POSES, C.POSE_DIM)


def test_aff_encoder_output_shape(rng):
    poses = rng.standard_normal((2, C.N_POSES, C.POSE_DIM)).astype(np.float32)
    mod = enc.AffEncoder()
    variables = mod.init(jax.random.key(0), jnp.asarray(poses))
    out = mod.apply(variables, jnp.asarray(poses))
    assert out.shape == (2, C.N_POSES, 8)
