"""T2GNet — text -> gesture-quaternion transformer.

Capability parity with reference `net/T2GNet.py` (defined in the repo but
not wired into any processor; kept for inventory completeness): causal
transformer encoder over word tokens, speaker/tag conditioning (emotion,
polarity, acting task, gender, age, handedness, native tongue) broadcast
onto the text latents, causal transformer decoder over quaternion frames,
two temporal-smoothing convs across time, and L2 normalization of the
output quaternion channels.

Implemented with flax attention primitives (post-LN encoder/decoder blocks,
torch TransformerEncoderLayer-style).

Deliberate divergence: the reference feeds batch-first tensors into a
sequence-first PositionalEncoding (net/T2GNet.py:183-184,208), so its "pe"
indexes the BATCH position and is constant across the sequence — a latent
bug in dead code. This implementation applies positional encoding over the
sequence axis, as intended.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import layers as L


def positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: d_model // 2])  # odd d_model safe
    return pe


def causal_mask(t: int) -> jnp.ndarray:
    return jnp.tril(jnp.ones((t, t), jnp.bool_))


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train,
        )(x, x, mask=mask)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(attn, deterministic=not train))
        ff = nn.Dense(self.d_ff)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=not train)
        ff = nn.Dense(self.d_model)(ff)
        return nn.LayerNorm()(x + nn.Dropout(self.dropout)(ff, deterministic=not train))


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, memory, tgt_mask, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train,
        )(x, x, mask=tgt_mask)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(attn, deterministic=not train))
        cross = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train,
        )(x, memory)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(cross, deterministic=not train))
        ff = nn.Dense(self.d_ff)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=not train)
        ff = nn.Dense(self.d_model)(ff)
        return nn.LayerNorm()(x + nn.Dropout(self.dropout)(ff, deterministic=not train))


class T2GNet(nn.Module):
    num_tokens: int
    max_time_steps: int
    # frozen pretrained word table (the T2GNet_glove variant,
    # net/T2GNet_glove.py:46: nn.Embedding.from_pretrained(freeze=True));
    # held as a constant, not a parameter, so it takes no gradient
    embedding_table: np.ndarray | None = None
    text_dim: int = 64
    quat_dim: int = 64
    quat_channels: int = 4
    offsets_dim: int = 20
    tag_dims: tuple[int, ...] = (7, 3, 2, 2, 4, 2, 3)
    num_heads_enc: int = 4
    num_heads_dec: int = 4
    num_hidden_units_enc: int = 256
    num_hidden_units_dec: int = 256
    num_layers_enc: int = 2
    num_layers_dec: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, text, tags, quat, offset_lengths, train: bool = False):
        """text (B, S) ids; tags: list of (B, d) one-hots matching tag_dims;
        quat (B, T, quat_dim) teacher frames; offset_lengths (B, offsets_dim).
        Returns (quat_pred normalized, pre-norm)."""
        b, s = text.shape
        if self.embedding_table is not None:
            emb = jnp.take(jnp.asarray(self.embedding_table), text, axis=0)
        else:
            emb = L.Embed(self.num_tokens, self.text_dim,
                          name="text_embedding")(text)
        emb = emb * math.sqrt(self.text_dim)
        pe = jnp.asarray(positional_encoding(s, self.text_dim))
        x = nn.Dropout(self.dropout)(emb + pe[None], deterministic=not train)
        enc_mask = causal_mask(s)[None, None]
        for i in range(self.num_layers_enc):
            x = EncoderLayer(self.text_dim, self.num_heads_enc,
                             self.num_hidden_units_enc, self.dropout,
                             name=f"enc{i}")(x, enc_mask, train=train)

        tag_feats = [jnp.repeat(t[:, None, :], s, axis=1) for t in tags]
        intermediate = (self.text_dim + self.quat_dim) // 2
        text_latent = nn.Dense(intermediate, name="text_embed")(
            jnp.concatenate([x] + tag_feats, axis=-1)
        )

        off = jnp.repeat(offset_lengths[:, None, :], s, axis=1)
        memory = nn.Dense(self.quat_dim, name="text_offsets_to_gestures")(
            jnp.concatenate([text_latent, off], axis=-1)
        )

        t = quat.shape[1]
        pe_q = jnp.asarray(positional_encoding(t, self.quat_dim))
        q = nn.Dropout(self.dropout)(quat + pe_q[None], deterministic=not train)
        dec_mask = causal_mask(t)[None, None]
        for i in range(self.num_layers_dec):
            q = DecoderLayer(self.quat_dim, self.num_heads_dec,
                             self.num_hidden_units_dec, self.dropout,
                             name=f"dec{i}")(q, memory, dec_mask, train=train)

        pre_norm = q
        if t == self.max_time_steps:
            # temporal smoothing convs mix across *time* (torch Conv1d with
            # time as the channel axis, ref net/T2GNet.py:62-67)
            for i in range(2):
                pre_norm = jnp.swapaxes(
                    L.Conv1d(self.max_time_steps, 3, padding=1,
                             name=f"smooth{i}")(jnp.swapaxes(pre_norm, 1, 2)),
                    1, 2,
                )
        flat = pre_norm.reshape(-1, self.quat_channels)
        normed = flat / jnp.maximum(
            jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12
        )
        return normed.reshape(pre_norm.shape), pre_norm


def t2g_net_glove(embedding_table: np.ndarray, max_time_steps: int,
                  quat_dim: int = 64, quat_channels: int = 4,
                  offsets_dim: int = 20,
                  tag_dims: tuple[int, ...] = (7, 3, 2, 2, 4, 2, 3),
                  num_heads: int = 4, num_hidden_units: int = 256,
                  num_layers: int = 2, dropout: float = 0.5) -> T2GNet:
    """The T2GNet_glove variant (net/T2GNet_glove.py:36-57): a frozen
    pretrained (GloVe) word table and a SINGLE heads/units/layers setting
    shared by encoder and decoder."""
    table = np.asarray(embedding_table, np.float32)
    return T2GNet(
        num_tokens=table.shape[0], max_time_steps=max_time_steps,
        embedding_table=table, text_dim=table.shape[1],
        quat_dim=quat_dim, quat_channels=quat_channels,
        offsets_dim=offsets_dim, tag_dims=tag_dims,
        num_heads_enc=num_heads, num_heads_dec=num_heads,
        num_hidden_units_enc=num_hidden_units,
        num_hidden_units_dec=num_hidden_units,
        num_layers_enc=num_layers, num_layers_dec=num_layers,
        dropout=dropout,
    )
