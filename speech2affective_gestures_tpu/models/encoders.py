"""Modality encoders of the s2ag models.

Capability parity with reference `net/multimodal_context_net_v2.py:14-244`:
WavEncoder (raw waveform), MFCCEncoder, TextEncoderTCN, AffEncoder (two-stage
ST-GCN pose encoder), AffDecoder.

Layout conventions (TPU channel-last):
- waveforms: (B, L); MFCC features: (B, 37, 71) — identical to the reference
  cache layout; as channel-last NWC this is directly (B, W=37 coefficients,
  C=71 frames), exactly the axes the reference convolves over after its
  permute (net/multimodal_context_net_v2.py:53);
- graph sequences: (B, T, V, C).

Adjacency tensors are built host-side with `ops.graph` and baked in as
constants — the reference instead allocates them with `.cuda()` at module
init (net/multimodal_context_net_v2.py:104-115).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import constants as C
from ..ops import graph as graph_ops
from . import layers as L
from .stgcn import STGraphConv, STGraphConvTranspose
from .tcn import TemporalConvNet


class WavEncoder(nn.Module):
    """Raw-waveform conv stack -> (B, 34, 32); ref net/multimodal_context_net_v2.py:14-33."""

    @nn.compact
    def __call__(self, wav, train: bool = False):
        x = wav[..., None]  # (B, L, 1)
        x = L.Conv1d(16, 15, stride=5, padding=1600, name="conv1")(x)
        x = L.BatchNorm(16, name="bn1")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        x = L.Conv1d(32, 15, stride=6, name="conv2")(x)
        x = L.BatchNorm(32, name="bn2")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        x = L.Conv1d(64, 15, stride=6, name="conv3")(x)
        x = L.BatchNorm(64, name="bn3")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        x = L.Conv1d(32, 15, stride=6, name="conv4")(x)
        return x  # already (B, T=34, 32) in channel-last


class MFCCEncoder(nn.Module):
    """MFCC conv stack -> (B, time_steps, 32).

    Input is the reference layout (B, num_mfcc=37, mfcc_length=71); the convs
    run over the 37-coefficient axis with the 71 frames as channels, then a
    per-step Linear(37 -> 32) (ref net/multimodal_context_net_v2.py:36-58).
    """

    time_steps: int = C.N_POSES

    @nn.compact
    def __call__(self, mfcc, train: bool = False):
        x = mfcc  # (B, 37, 71) == NWC with W=37, C=71
        x = L.Conv1d(64, 5, padding=2, name="conv1")(x)
        x = L.BatchNorm(64, name="bn1")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        x = L.Conv1d(64, 5, padding=2, name="conv2")(x)
        x = L.BatchNorm(64, name="bn2")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        x = L.Conv1d(48, 3, padding=1, name="conv3")(x)
        x = L.BatchNorm(48, name="bn3")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        x = L.Conv1d(self.time_steps, 3, padding=1, name="conv4")(x)
        x = L.BatchNorm(self.time_steps, name="bn4")(x, use_running_average=not train)
        x = L.leaky_relu(x, 0.3)
        # (B, 37, time_steps) channel-last -> per-frame linear over the 37 axis
        x = jnp.swapaxes(x, -1, -2)  # (B, time_steps, 37)
        x = L.Linear(32, name="linear1")(x)
        return L.leaky_relu(x, 0.3)


class TextEncoderTCN(nn.Module):
    """Word ids -> (B, T, 32) via embedding + dilated causal TCN + Linear.

    ref net/multimodal_context_net_v2.py:61-91 + net/tcn.py.
    """

    n_words: int
    embed_size: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    kernel_size: int = 2
    dropout: float = 0.3
    emb_dropout: float = 0.1
    word_embeddings: np.ndarray | None = None
    freeze_embedding: bool = False

    @nn.compact
    def __call__(self, ids, train: bool = False):
        emb = L.Embed(
            self.n_words,
            self.embed_size,
            pretrained=self.word_embeddings,
            freeze=self.freeze_embedding,
            name="embedding",
        )(ids)
        emb = nn.Dropout(self.emb_dropout)(emb, deterministic=not train)
        y = TemporalConvNet(
            num_channels=(self.hidden_size,) * self.n_layers,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            name="tcn",
        )(emb, deterministic=not train)
        # decoder bias zero-init, weight N(0, 0.01) (ref :83-85)
        y = nn.Dense(
            32,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            name="decoder",
        )(y)
        return y, 0


def _regroup_body_parts(feat_bn: jax.Array) -> jax.Array:
    """(B, T, 9 bones, C) -> (B, T, 3 parts, 3*C), channel-major flatten,
    matching the reference's regroup loop (net/multimodal_context_net_v2.py:161-167)."""
    b, t, v, c = feat_bn.shape
    parts = []
    for idx in C.BODY_PARTS_EDGE_IDX:
        sl = feat_bn[:, :, list(idx), :]           # (B, T, 3, C)
        sl = jnp.swapaxes(sl, -1, -2)              # (B, T, C, 3) channel-major
        parts.append(sl.reshape(b, t, len(idx) * c))
    return jnp.stack(parts, axis=2)                # (B, T, 3, 3C)


def _per_node_batchnorm(x: jax.Array, bn: L.BatchNorm, train: bool):
    """BatchNorm1d(C*V) over flattened (channel, node) pairs, the reference's
    idiom of normalizing each (channel, bone) combination separately
    (net/multimodal_context_net_v2.py:159-160)."""
    b, t, v, c = x.shape
    flat = jnp.swapaxes(x, -1, -2).reshape(b, t, c * v)  # index = ch*V + node
    flat = bn(flat, use_running_average=not train)
    return jnp.swapaxes(flat.reshape(b, t, c, v), -1, -2)


class AffEncoder(nn.Module):
    """Two-stage ST-GCN pose encoder -> (B, T, 8).

    Stage 1 over the 9-bone graph (spatial partitioning, max_hop=2), regroup
    into 3 body parts, stage 2 over the body-part graph, then two temporal
    convs (ref net/multimodal_context_net_v2.py:94-175).
    """

    coords: int = 3

    def setup(self):
        self.a1 = jnp.asarray(
            graph_ops.build_adjacency(
                C.NUM_BONES, list(C.DIR_EDGE_PAIRS), "spatial", max_hop=2
            ),
            jnp.float32,
        )
        self.a2 = jnp.asarray(
            graph_ops.build_adjacency(
                len(C.BODY_PARTS_EDGE_IDX),
                list(C.BODY_PARTS_EDGE_PAIRS),
                "spatial",
                max_hop=2,
            ),
            jnp.float32,
        )
        self.st_gcn1 = STGraphConv(
            16, self.a1.shape[0], (9, 5), padding=(4, 2), name="st_gcn1"
        )
        self.st_gcn2 = STGraphConv(
            16, self.a2.shape[0], (9, 3), padding=(4, 1), name="st_gcn2"
        )
        self.batch_norm1 = L.BatchNorm(16 * C.NUM_BONES, name="batch_norm1")
        self.batch_norm2 = L.BatchNorm(
            16 * len(C.BODY_PARTS_EDGE_IDX), name="batch_norm2"
        )
        self.conv3 = L.Conv1d(16, 5, padding=2, name="conv3")
        self.bn3 = L.BatchNorm(16, name="bn3")
        self.conv4 = L.Conv1d(8, 3, padding=1, name="conv4")
        self.bn4 = L.BatchNorm(8, name="bn4")

    def __call__(self, poses, train: bool = False):
        b, t, jc = poses.shape
        x = poses.reshape(b, t, jc // self.coords, self.coords)  # (B,T,9,3)

        feat1 = self.st_gcn1(x, self.a1, train=train)            # (B,T,9,16)
        feat1 = _per_node_batchnorm(feat1, self.batch_norm1, train)

        feat2_in = _regroup_body_parts(feat1)                    # (B,T,3,48)
        feat2 = self.st_gcn2(feat2_in, self.a2, train=train)     # (B,T,3,16)
        feat2 = _per_node_batchnorm(feat2, self.batch_norm2, train)

        # flatten (channel-major) -> temporal convs over T
        feat3_in = jnp.swapaxes(feat2, -1, -2).reshape(b, t, -1)  # (B,T,48)
        y = self.conv3(feat3_in)
        y = self.bn3(y, use_running_average=not train)
        y = L.leaky_relu(y, 0.01)
        y = self.conv4(y)
        y = self.bn4(y, use_running_average=not train)
        return L.leaky_relu(y, 0.01)                              # (B,T,8)


class AffDecoder(nn.Module):
    """ST-GCN-transpose pose decoder (defined-but-unused in the reference
    train path, net/multimodal_context_net_v2.py:178-244; only st_gcn2 is
    active in its forward)."""

    coords: int = 3
    num_joints: int = 9

    @nn.compact
    def __call__(self, pose_feats, train: bool = False):
        b, t, f = pose_feats.shape
        a2 = jnp.asarray(
            graph_ops.build_adjacency(
                len(C.DIR_EDGE_PAIRS) + 1, list(C.DIR_EDGE_PAIRS), "spatial", 2
            ),
            jnp.float32,
        )
        x = pose_feats.reshape(b, t, self.num_joints, -1)
        y = STGraphConvTranspose(
            self.coords, a2.shape[0], (9, 5), padding=(4, 2), name="st_gcn2"
        )(x, a2, train=train)
        return y.reshape(b, t, -1)
