"""Spatial-temporal graph convolution primitives.

Capability parity with reference `net/utils/tgcn.py` (ST-GCN,
arXiv:1801.07455): ConvTemporalGraphical (+transpose) and STGraphConv
(+transpose).

TPU-first layout: graph sequences are (B, T, V, C) (channel-last, NHWC for
the 2-D convs), and the K-partition aggregation 'nkctv,kvw->nctw' becomes
'btvkc,kvw->btwc' — a single einsum XLA lowers to an MXU contraction.

Residual-path quirk preserved: the reference tests `stride == 1` against a
*tuple* stride (net/utils/tgcn.py:195), which is always False at its call
sites, so the residual is always Conv+BN (never identity) whenever
`residual=True`. We default to the same effective behavior.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from . import layers as L


class ConvTemporalGraphical(nn.Module):
    """Temporal conv to K*C channels, then adjacency contraction.

    x: (B, T, V, Cin); A: (K, V, V) -> (B, T', V, Cout).
    ref net/utils/tgcn.py:15-71.
    """

    out_channels: int
    a_channels: int
    temporal_kernel_size: int
    temporal_stride: int = 1
    temporal_padding: int = 0

    @nn.compact
    def __call__(self, x, adjacency):
        y = L.Conv2d(
            self.out_channels * self.a_channels,
            (self.temporal_kernel_size, 1),
            stride=(self.temporal_stride, 1),
            padding=(self.temporal_padding, 0),
            name="conv",
        )(x)
        b, t, v, _ = y.shape
        y = y.reshape(b, t, v, self.a_channels, self.out_channels)
        # follow the activation dtype (the adjacency is a host-built f32
        # constant; without the cast it silently promotes bf16 runs to f32)
        return jnp.einsum("btvkc,kvw->btwc", y, adjacency.astype(y.dtype))


class ConvTransposeTemporalGraphical(nn.Module):
    """Transposed-conv variant (ref net/utils/tgcn.py:74-130)."""

    out_channels: int
    a_channels: int
    temporal_kernel_size: int
    temporal_stride: int = 1
    temporal_padding: int = 0

    @nn.compact
    def __call__(self, x, adjacency):
        y = L.ConvTranspose2d(
            self.out_channels * self.a_channels,
            (self.temporal_kernel_size, 1),
            stride=(self.temporal_stride, 1),
            padding=(self.temporal_padding, 0),
            name="conv",
        )(x)
        b, t, v, _ = y.shape
        y = y.reshape(b, t, v, self.a_channels, self.out_channels)
        # follow the activation dtype (the adjacency is a host-built f32
        # constant; without the cast it silently promotes bf16 runs to f32)
        return jnp.einsum("btvkc,kvw->btwc", y, adjacency.astype(y.dtype))


class STGraphConv(nn.Module):
    """GCN + temporal conv + residual (ref net/utils/tgcn.py:133-218).

    kernel_size = (temporal, spatial); activation slope follows the
    reference's `nn.LeakyReLU(inplace=True)` => 0.01.
    """

    out_channels: int
    a_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    dropout: float = 0.0
    activation_slope: float = 0.01
    residual: bool = True
    identity_residual: bool = False  # see module docstring

    @nn.compact
    def __call__(self, x, adjacency, train: bool = False):
        if self.residual and not self.identity_residual:
            res = L.Conv2d(
                self.out_channels, (1, 1), stride=self.stride, name="res_conv"
            )(x)
            res = L.BatchNorm(self.out_channels, name="res_bn")(
                res, use_running_average=not train
            )
        elif self.residual:
            res = x
        else:
            res = 0.0

        y = ConvTemporalGraphical(
            self.out_channels,
            self.a_channels,
            self.kernel_size[0],
            temporal_stride=self.stride[0],
            temporal_padding=self.padding[0],
            name="gcn",
        )(x, adjacency)

        y = L.BatchNorm(self.out_channels, name="tcn_bn1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = L.Conv2d(
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            name="tcn_conv",
        )(y)
        y = L.BatchNorm(self.out_channels, name="tcn_bn2")(
            y, use_running_average=not train
        )
        # reference applies Dropout(0) here; keep for structural parity
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=not train)
        return L.leaky_relu(y + res, self.activation_slope)


class STGraphConvTranspose(nn.Module):
    """Transposed variant (ref net/utils/tgcn.py:221-306)."""

    out_channels: int
    a_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    dropout: float = 0.0
    activation_slope: float = 0.01
    residual: bool = True

    @nn.compact
    def __call__(self, x, adjacency, train: bool = False):
        if self.residual:
            res = L.ConvTranspose2d(
                self.out_channels, (1, 1), stride=self.stride, name="res_conv"
            )(x)
            res = L.BatchNorm(self.out_channels, name="res_bn")(
                res, use_running_average=not train
            )
        else:
            res = 0.0

        y = ConvTransposeTemporalGraphical(
            self.out_channels,
            self.a_channels,
            self.kernel_size[0],
            temporal_stride=self.stride[0],
            temporal_padding=self.padding[0],
            name="gcn",
        )(x, adjacency)

        y = L.BatchNorm(self.out_channels, name="tcn_bn1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = L.ConvTranspose2d(
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            name="tcn_conv",
        )(y)
        y = L.BatchNorm(self.out_channels, name="tcn_bn2")(
            y, use_running_average=not train
        )
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=not train)
        return L.leaky_relu(y + res, self.activation_slope)
