"""Pose generators (s2ag and the frozen TriModal baseline).

Capability parity with reference `net/multimodal_context_net_v2.py:247-546`:

- `PoseGenerator` (the paper's s2ag G): AffEncoder(pre-poses) + MFCCEncoder +
  TextEncoderTCN + speaker-z -> 4-layer bi-GRU(300) with summed directions ->
  Linear 300 -> 150 -> pose_dim;
- `PoseGeneratorTriModal` (Yoon et al. baseline, loaded frozen for
  side-by-side comparison): WavEncoder on raw audio instead of MFCC/Aff
  encoders, last-pose+bit fed raw.

Speaker z: Embedding -> Linear -> (mu, log_var) -> reparametrize, sampled
from the flax 'noise' rng stream (the reference uses global torch RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import constants as C
from . import layers as L
from .encoders import AffEncoder, MFCCEncoder, TextEncoderTCN, WavEncoder


def re_parametrize(mu, log_var, rng):
    """z = mu + eps * exp(0.5 log_var); ref net/embedding_net.py:10-13."""
    std = jnp.exp(0.5 * log_var)
    return mu + jax.random.normal(rng, mu.shape, mu.dtype) * std


class SpeakerZ(nn.Module):
    """Speaker-identity latent: Embedding -> Linear -> (mu, log_var) ->
    reparametrized z (ref net/multimodal_context_net_v2.py:465-477,509-522)."""

    n_speakers: int
    z_size: int = 16

    @nn.compact
    def __call__(self, vid_indices):
        h = L.Embed(self.n_speakers, self.z_size, name="embedding")(vid_indices)
        h = L.Linear(self.z_size, name="proj")(h)
        mu = L.Linear(self.z_size, name="mu")(h)
        log_var = L.Linear(self.z_size, name="log_var")(h)
        z = re_parametrize(mu, log_var, self.make_rng("noise"))
        return z, mu, log_var


class PoseGenerator(nn.Module):
    """s2ag generator (ref net/multimodal_context_net_v2.py:438-546).

    forward(pre_seq (B,T,pose_dim+1), in_text (B,T) ids, in_mfcc (B,37,71),
    vid_indices (B,)) -> (out_dir_vec (B,T,pose_dim), z, z_mu, z_log_var).
    """

    pose_dim: int = C.POSE_DIM
    n_words: int = 1000
    word_embed_size: int = 300
    word_embeddings: np.ndarray | None = None
    freeze_embedding: bool = False
    # mfcc_length / num_mfcc are retained for constructor parity with the
    # reference (it passes them, net/multimodal_context_net_v2.py:439-440);
    # the encoder infers both from the input tensor's static shape.
    mfcc_length: int = C.MFCC_LENGTH
    num_mfcc: int = C.NUM_MFCC_COMBINED
    time_steps: int = C.N_POSES
    hidden_size: int = 300          # hidden_size_s2eg
    n_layers: int = 4
    dropout_prob: float = 0.3
    # the text encoder's embedding dropout is a fixed 0.1 upstream
    # (net/multimodal_context_net_v2.py:64); configurable here only so
    # determinism tests can zero it
    emb_dropout: float = 0.1
    input_context: str = "both"     # both | audio | text | none
    z_type: str = "speaker"         # speaker | random | none
    n_speakers: int = 1
    z_size: int = 16
    # paper ablations (net/multimodal_context_net_v2_abl_audio.py /
    # ..._abl_aff.py): 'wav' swaps MFCCEncoder for a raw-waveform WavEncoder;
    # use_aff_encoder=False feeds the raw pre-pose sequence (pose_dim+1)
    # instead of the ST-GCN affective features.
    audio_encoder_type: str = "mfcc"   # mfcc | wav
    use_aff_encoder: bool = True

    @nn.compact
    def __call__(self, pre_seq, in_text, in_mfcc, vid_indices=None,
                 train: bool = False):
        feats = []
        if self.use_aff_encoder:
            pre_feat = AffEncoder(name="aff_encoder")(pre_seq[..., :-1], train=train)
        else:
            pre_feat = pre_seq  # abl_aff: raw seed poses + constraint bit
        feats.append(pre_feat)

        if self.input_context in ("both", "audio"):
            if self.audio_encoder_type == "mfcc":
                audio_feat = MFCCEncoder(
                    time_steps=self.time_steps, name="audio_encoder"
                )(in_mfcc, train=train)
            else:  # abl_audio: in_mfcc carries the raw waveform
                audio_feat = WavEncoder(name="audio_encoder")(in_mfcc, train=train)
            feats.append(audio_feat)
        if self.input_context in ("both", "text"):
            text_feat, _ = TextEncoderTCN(
                n_words=self.n_words,
                embed_size=self.word_embed_size,
                hidden_size=self.hidden_size,
                n_layers=self.n_layers,
                dropout=self.dropout_prob,
                word_embeddings=self.word_embeddings,
                freeze_embedding=self.freeze_embedding,
                emb_dropout=self.emb_dropout,
                name="text_encoder",
            )(in_text, train=train)
            feats.append(text_feat)

        z_context = z_mu = z_log_var = None
        if self.z_type == "speaker":
            z_context, z_mu, z_log_var = SpeakerZ(
                self.n_speakers, self.z_size, name="speaker_z"
            )(vid_indices)
        elif self.z_type == "random":
            z_context = jax.random.normal(
                self.make_rng("noise"), (in_text.shape[0], self.z_size)
            )

        in_data = jnp.concatenate(feats, axis=-1)
        if z_context is not None:
            z_rep = jnp.repeat(z_context[:, None, :], in_data.shape[1], axis=1)
            in_data = jnp.concatenate([in_data, z_rep], axis=-1)

        # time-major from the GRU through the per-frame head: only the final
        # (T, B, pose_dim) tensor is transposed back (layers.GRU docstring)
        out, _ = L.GRU(
            self.hidden_size,
            num_layers=self.n_layers,
            bidirectional=True,
            dropout=self.dropout_prob,
            name="gru",
            time_major_out=True,
        )(in_data, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(self.hidden_size // 2, name="out1")(out)
        out = L.leaky_relu(out, 0.01)  # nn.LeakyReLU(inplace=True)
        out = L.Linear(self.pose_dim, name="out2")(out)
        out = jnp.swapaxes(out, 0, 1)
        return out, z_context, z_mu, z_log_var


class PoseGeneratorTriModal(nn.Module):
    """TriModal baseline generator (ref net/multimodal_context_net_v2.py:247-343),
    kept frozen during s2ag training for side-by-side evaluation
    (processor_v2.py:1033-1034)."""

    pose_dim: int = C.POSE_DIM
    n_words: int = 1000
    word_embed_size: int = 300
    word_embeddings: np.ndarray | None = None
    freeze_embedding: bool = False
    hidden_size: int = 300
    n_layers: int = 4
    dropout_prob: float = 0.3
    input_context: str = "both"
    z_type: str = "speaker"
    n_speakers: int = 1
    z_size: int = 16

    @nn.compact
    def __call__(self, pre_seq, in_text, in_audio, vid_indices=None,
                 train: bool = False):
        feats = [pre_seq]
        if self.input_context in ("both", "audio"):
            feats.append(WavEncoder(name="audio_encoder")(in_audio, train=train))
        if self.input_context in ("both", "text"):
            text_feat, _ = TextEncoderTCN(
                n_words=self.n_words,
                embed_size=self.word_embed_size,
                hidden_size=self.hidden_size,
                n_layers=self.n_layers,
                dropout=self.dropout_prob,
                word_embeddings=self.word_embeddings,
                freeze_embedding=self.freeze_embedding,
                name="text_encoder",
            )(in_text, train=train)
            feats.append(text_feat)
        # reference concat order is (pre_seq, audio, text)
        in_data = jnp.concatenate(feats, axis=-1)

        z_context = z_mu = z_log_var = None
        if self.z_type == "speaker":
            z_context, z_mu, z_log_var = SpeakerZ(
                self.n_speakers, self.z_size, name="speaker_z"
            )(vid_indices)
        elif self.z_type == "random":
            z_context = jax.random.normal(
                self.make_rng("noise"), (in_text.shape[0], self.z_size)
            )
        if z_context is not None:
            z_rep = jnp.repeat(z_context[:, None, :], in_data.shape[1], axis=1)
            in_data = jnp.concatenate([in_data, z_rep], axis=-1)

        out, _ = L.GRU(
            self.hidden_size,
            num_layers=self.n_layers,
            bidirectional=True,
            dropout=self.dropout_prob,
            name="gru",
            time_major_out=True,
        )(in_data, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(self.hidden_size // 2, name="out1")(out)
        # reference: nn.LeakyReLU(True) => negative_slope=1.0 => identity
        out = L.leaky_relu(out, 1.0)
        out = L.Linear(self.pose_dim, name="out2")(out)
        out = jnp.swapaxes(out, 0, 1)
        return out, z_context, z_mu, z_log_var


class PoseGeneratorV1(nn.Module):
    """v1 emotion-conditioned generator (ref net/multimodal_context_net_v1.py
    :307-360): WavEncoder + text TCN + raw seed poses, with the predicted
    emotion one-hot concatenated onto the speaker z before broadcasting."""

    pose_dim: int = C.POSE_DIM
    num_emotions: int = 7
    n_words: int = 1000
    word_embed_size: int = 300
    word_embeddings: np.ndarray | None = None
    freeze_embedding: bool = False
    hidden_size: int = 300
    n_layers: int = 4
    dropout_prob: float = 0.3
    input_context: str = "both"
    z_type: str = "speaker"
    n_speakers: int = 1
    z_size: int = 16

    @nn.compact
    def __call__(self, pre_seq, in_text, in_audio, in_emo_labels,
                 vid_indices=None, train: bool = False):
        feats = [pre_seq]
        if self.input_context in ("both", "audio"):
            feats.append(WavEncoder(name="audio_encoder")(in_audio, train=train))
        if self.input_context in ("both", "text"):
            text_feat, _ = TextEncoderTCN(
                n_words=self.n_words,
                embed_size=self.word_embed_size,
                hidden_size=self.hidden_size,
                n_layers=self.n_layers,
                dropout=self.dropout_prob,
                word_embeddings=self.word_embeddings,
                freeze_embedding=self.freeze_embedding,
                name="text_encoder",
            )(in_text, train=train)
            feats.append(text_feat)
        in_data = jnp.concatenate(feats, axis=-1)

        z_context = z_mu = z_log_var = None
        if self.z_type == "speaker":
            z_context, z_mu, z_log_var = SpeakerZ(
                self.n_speakers, self.z_size, name="speaker_z"
            )(vid_indices)
        elif self.z_type == "random":
            z_context = jax.random.normal(
                self.make_rng("noise"), (in_text.shape[0], self.z_size)
            )
        # emotion conditioning (ref :337-338)
        z_context = jnp.concatenate([z_context, in_emo_labels], axis=-1)
        z_rep = jnp.repeat(z_context[:, None, :], in_data.shape[1], axis=1)
        in_data = jnp.concatenate([in_data, z_rep], axis=-1)

        out, _ = L.GRU(
            self.hidden_size, num_layers=self.n_layers, bidirectional=True,
            dropout=self.dropout_prob, name="gru", time_major_out=True,
        )(in_data, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(self.hidden_size // 2, name="out1")(out)
        # reference v1: nn.LeakyReLU(True) => slope 1.0 => identity
        # (net/multimodal_context_net_v1.py:299)
        out = L.leaky_relu(out, 1.0)
        out = L.Linear(self.pose_dim, name="out2")(out)
        out = jnp.swapaxes(out, 0, 1)
        return out, z_context, z_mu, z_log_var
