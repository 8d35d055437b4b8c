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
    # the reference hardcodes 0.3 (net/multimodal_context_net_v2.py:560);
    # configurable here only so determinism tests can zero it
    dropout_prob: float = 0.3

    @nn.compact
    def __call__(self, poses, in_text=None, train: bool = False):
        feat = AffEncoder(name="aff_encoder")(poses, train=train)  # (B,T,8)
        # time-major head: only the (T, B) per-step logits transpose back
        out, _ = L.GRU(
            self.hidden_size, num_layers=4, bidirectional=True,
            dropout=self.dropout_prob, name="gru", time_major_out=True,
        )(feat, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(1, name="out")(out)[..., 0]       # (T, B)
        out = L.Linear(1, name="out2")(out.T)            # (B, 1)
        return nn.sigmoid(out)


class ConvDiscriminatorTriModal(nn.Module):
    """TriModal conv discriminator; poses (B, 34, pose_dim) -> (B, 1)."""

    hidden_size: int = 64
    dropout_prob: float = 0.3  # hardcoded 0.3 upstream (:407)

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
            self.hidden_size, num_layers=4, bidirectional=True,
            dropout=self.dropout_prob, name="gru", time_major_out=True,
        )(x, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(1, name="out")(out)[..., 0]       # (T-6, B)
        out = L.Linear(1, name="out2")(out.T)            # (B, 1)
        return nn.sigmoid(out)


# The abl_aff ablation's plain ConvDiscriminator is structurally identical
# to the trimodal conv discriminator (net/multimodal_context_net_v2_abl_aff.py:394-439).
ConvDiscriminator = ConvDiscriminatorTriModal


class AffDiscriminatorV1(nn.Module):
    """v1 emotion-conditioned discriminator (ref
    net/multimodal_context_net_v1.py:363-463): the ST-GCN feature path of
    AffEncoder but WITHOUT the per-(channel,node) batch norms, emotion
    one-hot concatenated per frame before the GRU."""

    num_emotions: int = 7
    n_poses: int = C.N_POSES
    hidden_size: int = 64
    coords: int = 3

    @nn.compact
    def __call__(self, poses, in_emo_labels, in_text=None, train: bool = False):
        from ..ops import graph as graph_ops
        from .encoders import _regroup_body_parts
        from .stgcn import STGraphConv

        b, t, jc = poses.shape
        a1 = jnp.asarray(graph_ops.build_adjacency(
            C.NUM_BONES, list(C.DIR_EDGE_PAIRS), "spatial", 2), jnp.float32)
        a2 = jnp.asarray(graph_ops.build_adjacency(
            len(C.BODY_PARTS_EDGE_IDX), list(C.BODY_PARTS_EDGE_PAIRS),
            "spatial", 2), jnp.float32)
        x = poses.reshape(b, t, jc // self.coords, self.coords)
        feat1 = STGraphConv(16, a1.shape[0], (9, 5), padding=(4, 2),
                            name="st_gcn1")(x, a1, train=train)
        feat2_in = _regroup_body_parts(feat1)
        feat2 = STGraphConv(16, a2.shape[0], (9, 3), padding=(4, 1),
                            name="st_gcn2")(feat2_in, a2, train=train)
        feat3 = jnp.swapaxes(feat2, -1, -2).reshape(b, t, -1)
        y = L.Conv1d(16, 5, padding=2, name="conv1")(feat3)
        y = L.BatchNorm(16, name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = L.Conv1d(8, 3, padding=1, name="conv2")(y)
        y = L.BatchNorm(8, name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        emo = jnp.repeat(in_emo_labels[:, None, :], self.n_poses, axis=1)
        y = jnp.concatenate([y, emo], axis=-1)
        out, _ = L.GRU(self.hidden_size, num_layers=4, bidirectional=True,
                       dropout=0.3, name="gru")(y, deterministic=not train)
        out = L.sum_bidirectional(out, self.hidden_size)
        out = L.Linear(1, name="out")(out)[..., 0]
        out = L.Linear(1, name="out2")(out)
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
