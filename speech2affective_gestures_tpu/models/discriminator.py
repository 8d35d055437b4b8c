"""Discriminators.

Capability parity with reference `net/multimodal_context_net_v2.py`:
- `AffDiscriminator` (s2ag D, :549-585): ST-GCN AffEncoder -> 4-layer
  bi-GRU(64) -> per-step Linear -> Linear(T -> 1) -> sigmoid;
- `ConvDiscriminatorTriModal` (:390-435): unpadded Conv1d stack (T -> T-6)
  -> bi-GRU -> per-step Linear -> Linear(28 -> 1) -> sigmoid;
- `DiscriminatorTriModal` (:346-387): GRU-only variant with optional text
  conditioning (unused in the v2 train path, kept for surface parity).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .. import constants as C
from . import layers as L
from .encoders import AffEncoder


class AffDiscriminator(nn.Module):
    """s2ag discriminator; poses (B, T, pose_dim) -> (B, 1) in (0, 1)."""

    n_poses: int = C.N_POSES
    hidden_size: int = 64

    @nn.compact
    def __call__(self, poses, in_text=None, train: bool = False):
        feat = AffEncoder(name="aff_encoder")(poses, train=train)  # (B,T,8)
        out, _ = L.GRU(
            self.hidden_size, num_layers=4, bidirectional=True, dropout=0.3,
            name="gru",
        )(feat, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(1, name="out")(out)[..., 0]       # (B, T)
        out = L.Linear(1, name="out2")(out)              # (B, 1)
        return nn.sigmoid(out)


class ConvDiscriminatorTriModal(nn.Module):
    """TriModal conv discriminator; poses (B, 34, pose_dim) -> (B, 1)."""

    hidden_size: int = 64

    @nn.compact
    def __call__(self, poses, in_text=None, train: bool = False):
        x = poses  # channel-last already
        x = L.Conv1d(16, 3, name="pre_conv1")(x)
        x = L.BatchNorm(16, name="pre_bn1")(x, use_running_average=not train)
        x = L.leaky_relu(x, 1.0)  # reference nn.LeakyReLU(True) => identity
        x = L.Conv1d(8, 3, name="pre_conv2")(x)
        x = L.BatchNorm(8, name="pre_bn2")(x, use_running_average=not train)
        x = L.leaky_relu(x, 1.0)
        x = L.Conv1d(8, 3, name="pre_conv3")(x)         # (B, T-6, 8)

        out, _ = L.GRU(
            self.hidden_size, num_layers=4, bidirectional=True, dropout=0.3,
            name="gru",
        )(x, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(1, name="out")(out)[..., 0]       # (B, T-6)
        out = L.Linear(1, name="out2")(out)              # (B, 1)
        return nn.sigmoid(out)


class DiscriminatorTriModal(nn.Module):
    """GRU discriminator with optional text conditioning
    (ref net/multimodal_context_net_v2.py:346-387)."""

    n_poses: int = C.N_POSES
    hidden_size: int = 300
    n_layers: int = 4
    dropout_prob: float = 0.3

    @nn.compact
    def __call__(self, poses, text_feat=None, train: bool = False):
        x = poses
        if text_feat is not None:
            x = jnp.concatenate([x, text_feat], axis=-1)
        out, _ = L.GRU(
            self.hidden_size, num_layers=self.n_layers, bidirectional=True,
            dropout=self.dropout_prob, name="gru",
        )(x, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(1, name="out")(out)[..., 0]
        out = L.Linear(1, name="out2")(out)
        return nn.sigmoid(out)
