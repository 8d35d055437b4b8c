"""Causal dilated temporal convolution network (TCN).

Capability parity with reference `net/tcn.py` (locuslab TCN): stacked
TemporalBlocks with exponentially-growing dilation, weight-normalized convs,
ReLU, dropout, and a 1x1-conv residual when channel counts differ.

TPU-first difference: the reference pads both sides then slices off the
right ("Chomp1d") — we pad **left only**, which is mathematically identical
for stride-1 causal convs and avoids materializing + slicing the overhang.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from . import layers as L


class CausalWNConv1d(nn.Module):
    """Left-padded (causal) weight-normalized conv: pad (k-1)*dilation on
    the left only — equals Conv1d(padding=p) + Chomp1d(p) in the reference
    (net/tcn.py:19-22)."""

    features: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return L.WNConv1d(
            self.features, self.kernel_size, padding=0, dilation=self.dilation
        )(x)


class TemporalBlock(nn.Module):
    """conv-relu-drop x2 with residual (ref net/tcn.py:16-46)."""

    features: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = CausalWNConv1d(self.features, self.kernel_size, self.dilation, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = CausalWNConv1d(self.features, self.kernel_size, self.dilation, name="conv2")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        if x.shape[-1] != self.features:
            res = DownsampleConv1d(self.features, name="downsample")(x)
        else:
            res = x
        return nn.relu(y + res)


class DownsampleConv1d(nn.Module):
    """1x1 residual projection. Unlike the weight-normed convs (where the
    reference's N(0,0.01) re-init is undone by the weight_norm hook), this
    plain conv's N(0,0.01) re-init IS effective (net/tcn.py:40-41)."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01), (1, cin, self.features)
        )
        y = jnp.einsum("btc,kcf->btf", x, kernel)
        bound = 1.0 / (cin ** 0.5)
        return y + self.param("bias", L.torch_uniform(bound), (self.features,))


class TemporalConvNet(nn.Module):
    """Stack of TemporalBlocks, dilation 2**i (ref net/tcn.py:49-64)."""

    num_channels: tuple[int, ...]
    kernel_size: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(
                ch, self.kernel_size, dilation=2**i, dropout=self.dropout,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return x
