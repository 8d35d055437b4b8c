"""Gesture-embedding autoencoder used by the FGD evaluator.

Capability parity with reference `net/embedding_net.py`: PoseEncoderConv
(conv stack + FC -> 32-d latent with VAE heads), PoseDecoderConv /
PoseDecoderFC / PoseDecoderGRU, ContextEncoder (speech+text) and the
EmbeddingNet wrapper. The FGD path uses mode='pose' with
variational_encoding=False (z = mu), matching
`net/embedding_space_evaluator.py:45-61`.

LeakyReLU slopes follow the reference's effective values, including the
`nn.LeakyReLU(True)` => slope-1.0 (identity) call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import constants as C
from . import layers as L
from .encoders import TextEncoderTCN, WavEncoder
from .generator import re_parametrize


class ConvNormRelu(nn.Module):
    """Conv1d + (BN) + LeakyReLU(0.2); ref net/embedding_net.py:16-39."""

    features: int
    down_sample: bool = False
    padding: int = 0
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = (4, 2) if self.down_sample else (3, 1)
        x = L.Conv1d(self.features, k, stride=s, padding=self.padding, name="conv")(x)
        if self.batch_norm:
            x = L.BatchNorm(self.features, name="bn")(x, use_running_average=not train)
        return L.leaky_relu(x, 0.2)


class PoseEncoderConv(nn.Module):
    """Poses (B, T, dim) -> 32-d latent (z, mu, log_var);
    ref net/embedding_net.py:42-82 (T=34 -> flatten 384)."""

    length: int = C.N_POSES
    dim: int = C.POSE_DIM

    @nn.compact
    def __call__(self, poses, variational_encoding: bool = False,
                 train: bool = False):
        x = ConvNormRelu(32, name="net0")(poses, train=train)
        x = ConvNormRelu(64, name="net1")(x, train=train)
        x = ConvNormRelu(64, down_sample=True, name="net2")(x, train=train)
        x = L.Conv1d(32, 3, name="net3")(x)              # (B, 12, 32) for T=34
        # flatten in torch's (C, T') order so converted Linear weights apply
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)
        x = L.Linear(256, name="out_net0")(x)
        x = L.BatchNorm(256, name="out_bn0")(x, use_running_average=not train)
        x = L.leaky_relu(x, 1.0)  # nn.LeakyReLU(True)
        x = L.Linear(128, name="out_net1")(x)
        x = L.BatchNorm(128, name="out_bn1")(x, use_running_average=not train)
        x = L.leaky_relu(x, 1.0)
        x = L.Linear(32, name="out_net2")(x)

        mu = L.Linear(32, name="fc_mu")(x)
        log_var = L.Linear(32, name="fc_log_var")(x)
        if variational_encoding:
            z = re_parametrize(mu, log_var, self.make_rng("noise"))
        else:
            z = mu
        return z, mu, log_var


class PoseDecoderConv(nn.Module):
    """32-d latent -> poses (B, T, dim); ref net/embedding_net.py:165-217."""

    length: int = C.N_POSES
    dim: int = C.POSE_DIM
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, feat, pre_poses=None, train: bool = False):
        if self.use_pre_poses:
            pre = pre_poses.reshape(pre_poses.shape[0], -1)
            pre = L.Linear(32, name="pre_net0")(pre)
            pre = L.BatchNorm(32, name="pre_bn")(pre, use_running_average=not train)
            pre = nn.relu(pre)
            pre = L.Linear(32, name="pre_net1")(pre)
            feat = jnp.concatenate([pre, feat], axis=-1)

        if self.length == 64:
            sizes = (128, 256)
        elif self.length == 34:
            sizes = (64, 136)
        else:
            raise ValueError("PoseDecoderConv supports length 34 or 64")
        x = L.Linear(sizes[0], name="pre0")(feat)
        x = L.BatchNorm(sizes[0], name="pre_bn0")(x, use_running_average=not train)
        x = L.leaky_relu(x, 1.0)  # nn.LeakyReLU(True)
        x = L.Linear(sizes[1], name="pre1")(x)
        # torch view(B, 4, T') is channel-major; split the same way, then
        # swap to channel-last
        x = jnp.swapaxes(x.reshape(feat.shape[0], 4, -1), 1, 2)

        x = L.ConvTranspose1d(32, 3, name="net0")(x)
        x = L.BatchNorm(32, name="bn0")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.2)
        x = L.ConvTranspose1d(32, 3, name="net1")(x)
        x = L.BatchNorm(32, name="bn1")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.2)
        x = L.Conv1d(32, 3, name="net2")(x)
        x = L.Conv1d(self.dim, 3, name="net3")(x)
        return x


class PoseDecoderFC(nn.Module):
    """FC decoder (ref net/embedding_net.py:85-127)."""

    gen_length: int
    pose_dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, latent, pre_poses=None, train: bool = False):
        feat = latent
        if self.use_pre_poses:
            pre = pre_poses.reshape(pre_poses.shape[0], -1)
            pre = L.Linear(32, name="pre_net0")(pre)
            pre = L.BatchNorm(32, name="pre_bn")(pre, use_running_average=not train)
            pre = nn.relu(pre)
            pre = L.Linear(32, name="pre_net1")(pre)
            feat = jnp.concatenate([pre, latent], axis=-1)
        for i, width in enumerate((128, 128, 256, 512)):
            feat = L.Linear(width, name=f"net{i}")(feat)
            feat = L.BatchNorm(width, name=f"bn{i}")(feat, use_running_average=not train)
            feat = nn.relu(feat)
        feat = L.Linear(self.gen_length * self.pose_dim, name="net4")(feat)
        return feat.reshape(-1, self.gen_length, self.pose_dim)


class PoseDecoderGRU(nn.Module):
    """GRU decoder (ref net/embedding_net.py:130-162)."""

    gen_length: int = C.N_POSES
    pose_dim: int = C.POSE_DIM
    hidden_size: int = 300

    @nn.compact
    def __call__(self, latent, pre_poses, train: bool = False):
        pre = pre_poses.reshape(pre_poses.shape[0], -1)
        pre = L.Linear(32, name="pre_net0")(pre)
        pre = L.BatchNorm(32, name="pre_bn")(pre, use_running_average=not train)
        pre = nn.relu(pre)
        pre = L.Linear(32, name="pre_net1")(pre)
        feat = jnp.concatenate([pre, latent], axis=-1)
        feat = jnp.repeat(feat[:, None, :], self.gen_length, axis=1)
        out, _ = L.GRU(
            self.hidden_size, num_layers=4, bidirectional=True, dropout=0.3,
            name="gru",
        )(feat, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(self.hidden_size // 2, name="out0")(out)
        out = L.leaky_relu(out, 1.0)  # nn.LeakyReLU(True)
        return L.Linear(self.pose_dim, name="out1")(out)


class ContextEncoder(nn.Module):
    """Text + raw-audio context encoder (ref net/embedding_net.py:220-259)."""

    n_words: int
    word_embed_size: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    word_embeddings: np.ndarray | None = None

    @nn.compact
    def __call__(self, in_text, in_audio, train: bool = False):
        text_feat, _ = TextEncoderTCN(
            n_words=self.n_words,
            embed_size=self.word_embed_size,
            hidden_size=self.hidden_size,
            n_layers=self.n_layers,
            word_embeddings=self.word_embeddings,
            name="text_encoder",
        )(in_text, train=train)
        audio_feat = WavEncoder(name="audio_encoder")(in_audio, train=train)
        x = jnp.concatenate([audio_feat, text_feat], axis=-1)
        out, _ = L.GRU(256, num_layers=2, bidirectional=False, name="gru")(
            x, deterministic=not train
        )
        last = out[:, -1]
        h = L.Linear(128, name="out0")(last)
        h = L.BatchNorm(128, name="out_bn")(h, use_running_average=not train)
        h = nn.relu(h)
        h = L.Linear(32, name="out1")(h)
        mu = L.Linear(32, name="fc_mu")(h)
        log_var = L.Linear(32, name="fc_log_var")(h)
        z = re_parametrize(mu, log_var, self.make_rng("noise"))
        return z, mu, log_var


class EmbeddingNet(nn.Module):
    """Autoencoder wrapper (ref net/embedding_net.py:262-308). mode='pose'
    (the FGD configuration) wires PoseEncoderConv + PoseDecoderConv."""

    pose_dim: int = C.POSE_DIM
    n_frames: int = C.N_POSES
    mode: str = "pose"
    n_words: int = 1000
    word_embed_size: int = 300
    word_embeddings: np.ndarray | None = None

    @nn.compact
    def __call__(self, in_text, in_audio, pre_poses, poses,
                 input_mode: str | None = None,
                 variational_encoding: bool = False, train: bool = False):
        mode = input_mode or self.mode
        context_feat = context_mu = context_log_var = None
        if self.mode != "pose" and in_text is not None and in_audio is not None:
            context_feat, context_mu, context_log_var = ContextEncoder(
                n_words=self.n_words,
                word_embed_size=self.word_embed_size,
                word_embeddings=self.word_embeddings,
                name="context_encoder",
            )(in_text, in_audio, train=train)

        poses_feat = pose_mu = pose_log_var = None
        if poses is not None:
            poses_feat, pose_mu, pose_log_var = PoseEncoderConv(
                self.n_frames, self.pose_dim, name="pose_encoder"
            )(poses, variational_encoding=variational_encoding, train=train)

        if mode == "random":
            # 50/50 speech/pose latent selection per call
            # (ref net/embedding_net.py:296-297)
            pick_speech = jax.random.bernoulli(self.make_rng("noise"))
            latent = jax.lax.cond(
                pick_speech, lambda: context_feat, lambda: poses_feat
            )
        else:
            latent = context_feat if mode == "speech" else poses_feat
        if self.mode == "pose":
            out_poses = PoseDecoderConv(
                self.n_frames, self.pose_dim, name="decoder"
            )(latent, train=train)
        else:
            out_poses = PoseDecoderGRU(
                self.n_frames, self.pose_dim, name="decoder"
            )(latent, pre_poses, train=train)

        return (context_feat, context_mu, context_log_var,
                poses_feat, pose_mu, pose_log_var, out_poses)
