"""Speech emotion recognition (SER) networks of the v1 pipeline.

Capability parity with reference `net/ser_att_conv_rnn_v1.py` (AttConvRNN:
6-conv stack + maxpool + Linear/BN + bi-LSTM + additive attention + FC
emotion head, trained on IEMOCAP log-mel blocks by processor.py:616-637)
and `net/ser_att_conv_rnn_v2.py` (3-conv attention-only variant; defined but
imported nowhere in the reference — kept for surface parity).

Input layout: (B, H=block_size frames, W=n_filters, C=3) — the channel-last
arrangement of the reference's (B, 3, 300, 40) mel/delta/delta-delta blocks.

Initialization mirrors the reference's truncated-normal scheme
(ser_att_conv_rnn_v1.py:8-13): N(mean, std) with values beyond 2 std
redrawn near the mean, constant bias 0.01, and LSTM forget-gate biases 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import layers as L


def truncated_normal_init(mean: float = 0.0, std: float = 0.01, eps: float = 1e-6):
    """N(mean, std) with |w| >= mean + 2*std redrawn ~ U(mean-eps, mean+eps)
    (ref truncate_param, ser_att_conv_rnn_v1.py:8-13)."""

    def init(key, shape, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        w = mean + std * jax.random.normal(k1, shape, dtype)
        redraw = jax.random.uniform(
            k2, shape, dtype, mean - eps, mean + eps
        )
        return jnp.where(jnp.abs(w) >= mean + 2.0 * std, redraw, w)

    return init


_const_bias = nn.initializers.constant(0.01)


def apply_reference_init(variables, rng, bidirectional: bool = True):
    """Rewrite freshly-initialized AttConvRNN params with the reference's
    scheme (ser_att_conv_rnn_v1.py:50-114): truncated N(0, 0.01) weights and
    constant-0.01 biases for every conv/linear, and LSTM input/forget-gate
    bias blocks set to 1 (the reference writes the [H:2H] slice of the
    (i,f,g,o) layout — the forget gate).

    Applied as a post-init transform so the layer primitives stay generic.
    """
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze"
    ) else dict(variables["params"])
    tn = truncated_normal_init()

    def visit(tree, path=()):
        for key, val in tree.items():
            if isinstance(val, dict):
                visit(val, path + (key,))
                continue
            if "attention" in path:  # keeps its own N(0,0.1)/0.1 init
                continue
            nonlocal rng
            rng, sub = jax.random.split(rng)
            if key == "kernel":
                tree[key] = tn(sub, val.shape, val.dtype)
            elif key == "bias" and "kernel" in tree:
                # conv/linear biases only — BatchNorm (scale/bias pairs) is
                # NOT re-initialized by the reference
                tree[key] = jnp.full_like(val, 0.01)
            elif key.startswith("b_ih") or key.startswith("b_hh"):
                hsz = val.shape[0] // 4
                tree[key] = val.at[hsz : 2 * hsz].set(1.0)  # forget gate

    visit(params)
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars


class Attention(nn.Module):
    """Additive attention over time (ref ser_att_conv_rnn_v1.py:16-34)."""

    attention_size: int = 1

    @nn.compact
    def __call__(self, x):
        v = nn.sigmoid(
            nn.Dense(self.attention_size,
                     kernel_init=nn.initializers.normal(0.1),
                     bias_init=nn.initializers.constant(0.1))(x)
        )
        scores = nn.Dense(1, kernel_init=nn.initializers.normal(0.1),
                          bias_init=nn.initializers.constant(0.1))(v)
        alphas = jax.nn.softmax(scores, axis=-2)
        return jnp.sum(x * alphas, axis=1), alphas


class AttConvRNN(nn.Module):
    """v1 SER net. x: (B, H, W, C) -> (B, EC) emotion logits."""

    num_emotions: int
    width: int = 40            # n mel filters (W)
    l1: int = 128
    l2: int = 256
    l3: int = 128
    l4: int = 64
    lstm_units: int = 128
    attention_size: int = 1
    pool_h: int = 2
    pool_w: int = 4
    f1: int = 768
    f2: int = 64
    bidirectional: bool = True
    dropout_prob: float = 1.0  # reference default (!) — fully dropped in train

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(features, name):
            return L.Conv2d(features, (5, 3), padding=(2, 1), name=name)

        act = lambda y: L.leaky_relu(y, 1e-2)
        drop = lambda y: nn.Dropout(self.dropout_prob)(y, deterministic=not train)

        y = drop(act(conv(self.l1, "conv1")(x)))
        y = L.MaxPool2d((self.pool_h, self.pool_w))(y)
        y = drop(act(conv(self.l2, "conv2")(y)))
        y = drop(act(conv(self.l2, "conv3")(y)))
        y = drop(act(conv(self.l3, "conv4")(y)))
        y = drop(act(conv(self.l3, "conv5")(y)))
        y = drop(act(conv(self.l4, "conv6")(y)))
        b, h, w, c = y.shape
        # replicate the reference's NCHW .contiguous().view(-1, C*W) byte
        # order exactly (ser_att_conv_rnn_v1.py:145): since H*W is not a
        # multiple of W, rows straddle channels — but row count is B*H and
        # the regrouping below is what the reference trains on.
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b * h, c * w)
        y = L.Linear(self.f1, name="linear1")(y)
        y = L.BatchNorm(self.f1, name="bn_linear1")(y, use_running_average=not train)
        y = act(y).reshape(b, h, self.f1)
        y, _ = L.LSTM(self.lstm_units, bidirectional=self.bidirectional,
                      name="lstm")(y, deterministic=not train)
        y, _alphas = Attention(self.attention_size, name="attention")(y)
        y = drop(act(L.Linear(self.f2, name="linear2")(y)))
        return L.Linear(self.num_emotions, name="linear3")(y)


class AttConvRNNv2(nn.Module):
    """v2 conv-only SER variant (ref net/ser_att_conv_rnn_v2.py; unused by
    any reference processor, kept for inventory parity)."""

    num_emotions: int
    width: int = 40
    l1: int = 128
    l2: int = 256
    attention_size: int = 1
    pool_h: int = 2
    pool_w: int = 4
    f1: int = 768
    f2: int = 64
    dropout_prob: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda y: L.leaky_relu(y, 1e-2)
        drop = lambda y: nn.Dropout(self.dropout_prob)(y, deterministic=not train)

        y = drop(act(L.Conv2d(self.l1, (5, 3), padding=(2, 1), name="conv1")(x)))
        y = L.MaxPool2d((self.pool_h, self.pool_w))(y)
        y = drop(act(L.Conv2d(self.l2, (5, 3), padding=(2, 1), name="conv2")(y)))
        y = drop(act(L.Conv2d(self.l2, (5, 3), padding=(2, 1), name="conv3")(y)))
        b, h, w, c = y.shape
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b * h, c * w)
        y = L.Linear(self.f1, name="linear1")(y)
        y = L.BatchNorm(self.f1, name="bn_linear1")(y, use_running_average=not train)
        y = act(y).reshape(b, h, self.f1)
        y, _ = Attention(self.attention_size, name="attention")(y)
        y = drop(act(L.Linear(self.f2, name="linear2")(y)))
        return L.Linear(self.num_emotions, name="linear3")(y)
