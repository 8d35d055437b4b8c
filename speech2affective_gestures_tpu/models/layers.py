"""Neural building blocks with PyTorch-matching semantics, TPU-first layout.

These are the primitives under every model in the framework. They keep
*numerical* parity with the torch layers the reference uses (so converted
`.pth.tar` checkpoints reproduce bit-comparable outputs) while using
TPU-native layouts and execution:

- activations/convs run in channel-LAST layout (NWC / NHWC), the layout XLA
  tiles best on TPU;
- the GRU hoists all input projections into one big (B*T, C) @ (C, 3H)
  matmul (MXU) and scans only the small recurrent update;
- BatchNorm reproduces torch running-stat semantics (momentum 0.1 into the
  *running* average, unbiased variance in the update, biased in the
  normalization);
- initializers mirror torch defaults (kaiming-uniform a=sqrt(5) for
  linear/conv, U(-1/sqrt(H), 1/sqrt(H)) for GRU).

Checkpoint mapping from torch layouts is in `convert/torch_ckpt.py`.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# lax.scan unroll factor for the recurrent cells. The per-cell work here is
# tiny ((D, B, H) x (D, H, 3H) einsums), so the 34-step scans are bound by
# per-iteration loop overhead, not FLOPs; unrolling lets XLA fuse across
# steps and amortize the bookkeeping. Numerically identical for any value
# (it only changes loop structure). Tuned on the v5e (tools/bench_step_opt.py):
# unroll HURTS on this chip (58 -> 47/51 steps/s at 4/8), so the default
# stays 1; override with S2AG_RNN_UNROLL to re-test on other hardware.
RNN_UNROLL = int(os.environ.get("S2AG_RNN_UNROLL", "1"))


def _gru_engine() -> str:
    """'pallas' = fused single-kernel time loop (ops/gru_pallas.py), the
    default on TPU where per-scan-iteration dispatch (~10 us) dominates the
    cell math; 'scan' = lax.scan, the default elsewhere and the reference
    semantics both engines implement. Override with S2AG_GRU_ENGINE.

    NOTE: read at TRACE time — the choice is baked into each jitted program
    at its first compile; changing the env var afterwards does not retrace.
    A 'pallas' override off-TPU is rejected with a warning (the compiled
    kernel only targets TPU; tests exercise it on CPU via interpret mode
    explicitly, not through this switch)."""
    from ..ops import backend as _backend

    env = os.environ.get("S2AG_GRU_ENGINE", "")
    on_tpu = _backend.is_tpu()
    if (env == "pallas" and not on_tpu
            and os.environ.get("S2AG_GRU_PALLAS_INTERPRET", "") != "1"):
        import warnings

        warnings.warn(
            f"S2AG_GRU_ENGINE=pallas ignored on backend "
            f"'{_backend.backend_name()}' (compiled kernel is TPU-only); "
            "falling back to 'scan'.",
            stacklevel=2,
        )
        return "scan"
    if env in ("pallas", "scan"):
        return env
    return "pallas" if on_tpu else "scan"


# --------------------------------------------------------------------------
# activations & initializers
# --------------------------------------------------------------------------

def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    """LeakyReLU with an explicit slope.

    NOTE the reference frequently writes `nn.LeakyReLU(True)`, which passes
    True as *negative_slope* (== 1.0, i.e. identity) — not inplace. We
    replicate each call site's effective slope exactly; slope == 1.0 is a
    no-op kept for documentation.
    """
    if slope == 1.0:
        return x
    return jnp.where(x >= 0, x, slope * x)


def torch_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # shape (in, out); torch kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    return torch_uniform(1.0 / math.sqrt(shape[0]))(key, shape, dtype)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    # shape (*window, in, out): fan_in = in * prod(window)
    fan_in = int(np.prod(shape[:-1]))
    return torch_uniform(1.0 / math.sqrt(fan_in))(key, shape, dtype)


# --------------------------------------------------------------------------
# dense / embedding
# --------------------------------------------------------------------------

class Linear(nn.Module):
    """Dense layer with torch-default init. kernel: (in, out)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (in_features, self.features)
        )
        y = jnp.matmul(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", torch_uniform(1.0 / math.sqrt(in_features)), (self.features,)
            )
            y = y + bias
        return y


class Embed(nn.Module):
    """Embedding table; optionally initialized from pretrained vectors and
    frozen via `jax.lax.stop_gradient` (reference: fastText table,
    net/multimodal_context_net_v2.py:67-73)."""

    num_embeddings: int
    features: int
    pretrained: np.ndarray | None = None
    freeze: bool = False

    @nn.compact
    def __call__(self, ids):
        if self.pretrained is not None:
            table_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                self.pretrained, dtype
            )
        else:
            table_init = nn.initializers.normal(stddev=1.0)
        table = self.param(
            "embedding", table_init, (self.num_embeddings, self.features)
        )
        if self.freeze:
            table = jax.lax.stop_gradient(table)
        return jnp.take(table, ids, axis=0)


# --------------------------------------------------------------------------
# batch norm (torch semantics)
# --------------------------------------------------------------------------

class BatchNorm(nn.Module):
    """BatchNorm over the last axis with torch running-stat semantics.

    - normalization: biased batch variance, eps inside the sqrt;
    - running update: new = (1 - momentum) * old + momentum * batch, with
      *unbiased* batch variance (torch's exact behavior);
    - `use_running_average=True` = torch eval mode.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        # statistics ALWAYS in f32 (torch AMP keeps BN stats f32 too):
        # under bf16 activations, batch means/vars and the running-average
        # update would otherwise round at 8 mantissa bits. No-op for f32.
        xs = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xs, axis=reduce_axes)
            # two-pass variance (torch's formula): E[x^2]-E[x]^2 cancels
            # catastrophically for large-mean activations in f32
            var = jnp.mean(jnp.square(xs - mean), axis=reduce_axes)
            n = x.size // x.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        inv = jax.lax.rsqrt(var + self.eps)
        return ((xs - mean) * inv * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(x.dtype)


# --------------------------------------------------------------------------
# convolutions (channel-last)
# --------------------------------------------------------------------------

def _pair(v) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv1d(nn.Module):
    """1-D convolution on (B, T, C). kernel: (K, Cin, Cout); symmetric
    integer padding like torch."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (self.kernel_size, cin, self.features)
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bound = 1.0 / math.sqrt(cin * self.kernel_size)
            y = y + self.param("bias", torch_uniform(bound), (self.features,))
        return y


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d (torch weight_norm over dim=0: one g per
    output channel; ref net/tcn.py:19-26)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # NOTE: the reference *writes* N(0,0.01) into these convs
        # (net/tcn.py:38-41) but weight_norm's pre-forward hook immediately
        # recomputes weight from (g, v), so the re-init is a no-op and the
        # EFFECTIVE init is torch's default kaiming-uniform — matched here.
        v = self.param(
            "v", torch_conv_kernel_init, (self.kernel_size, cin, self.features)
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0
            ).reshape(shape),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = v * (g / jnp.maximum(norm, 1e-12))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        bound = 1.0 / math.sqrt(cin * self.kernel_size)
        return y + self.param("bias", torch_uniform(bound), (self.features,))


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv matching torch ConvTranspose1d.

    kernel stored in forward-conv orientation (K, Cin, Cout); the op is a
    fractionally-strided conv: dilate input by `stride`, pad (K-1-padding),
    convolve with the spatially-flipped kernel.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # torch ConvTranspose kaiming fan_in = Cout * K (weight (Cin,Cout,K))
        bound_w = 1.0 / math.sqrt(self.features * self.kernel_size)
        kernel = self.param(
            "kernel", torch_uniform(bound_w),
            (self.kernel_size, cin, self.features),
        )
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            # torch fan_in for ConvTranspose bias init: Cout * K (weight
            # shape (Cin, Cout, K) -> fan_in = Cout*K); keep torch behavior.
            bound = 1.0 / math.sqrt(self.features * self.kernel_size)
            y = y + self.param("bias", torch_uniform(bound), (self.features,))
        return y


class Conv2d(nn.Module):
    """2-D convolution on (B, H, W, C); torch-style symmetric padding."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    dilation: tuple[int, int] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = _pair(self.kernel_size)
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (kh, kw, cin, self.features)
        )
        ph, pw = _pair(self.padding)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=_pair(self.stride),
            padding=[(ph, ph), (pw, pw)],
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bound = 1.0 / math.sqrt(cin * kh * kw)
            y = y + self.param("bias", torch_uniform(bound), (self.features,))
        return y


class ConvTranspose2d(nn.Module):
    """Transposed 2-D conv matching torch ConvTranspose2d (NHWC)."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = _pair(self.kernel_size)
        # torch ConvTranspose kaiming fan_in = Cout * kh * kw
        bound_w = 1.0 / math.sqrt(self.features * kh * kw)
        kernel = self.param(
            "kernel", torch_uniform(bound_w), (kh, kw, cin, self.features)
        )
        ph, pw = _pair(self.padding)
        sh, sw = _pair(self.stride)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.features * kh * kw)
            y = y + self.param("bias", torch_uniform(bound), (self.features,))
        return y


# --------------------------------------------------------------------------
# GRU (torch cell math, scan-based)
# --------------------------------------------------------------------------

class GRU(nn.Module):
    """Multi-layer (optionally bidirectional) GRU, torch cell semantics.

    gates ordered (r, z, n); n-gate uses r * (W_hn h + b_hn). Input
    projections for the whole sequence are hoisted out of the scan into one
    MXU matmul per layer/direction; only the (B, H) x (H, 3H) recurrent
    update runs inside `lax.scan`.

    Dropout (torch GRU semantics): applied to each layer's output except the
    last, only in training.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    # return (T, B, D*H) without the exit transpose: the (B, T) <-> (T, B)
    # layout change materializes multi-MB copies on TPU, and every consumer
    # of the GRU output in this model family (sum_bidirectional + per-frame
    # Linear heads) is position-independent, so callers can stay time-major
    # until their final, much smaller, tensor
    time_major_out: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_dir = 2 if self.bidirectional else 1
        hsz = self.hidden_size
        bound = 1.0 / math.sqrt(hsz)

        def layer_pass(inputs_tm, layer):
            """One (bi)directional layer as a SINGLE scan, TIME-MAJOR.

            Both directions run in the same scan with a leading direction
            axis (the backward copy consumes time-reversed inputs), so the
            recurrent update is one batched einsum per step instead of two
            sequential scans. The whole stack stays time-major (T, B, C):
            per-layer (B,T)<->(T,B) transposes cost ~0.2-0.3 ms EACH as
            materialized layout copies on TPU (device trace, ~6/forward),
            so the stack transposes exactly once at entry and exit.
            """
            w_ih, w_hh, b_ih, b_hh = layer_params(inputs_tm.shape[-1], layer)

            # hoisted input projections: one big (T*B, C) @ (C, 3H) per dir
            xps = []
            for d in range(num_dir):
                xp = jnp.matmul(inputs_tm, w_ih[d]) + b_ih[d]  # (T, B, 3H)
                xps.append(jnp.flip(xp, axis=0) if d else xp)
            xp = jnp.stack(xps, axis=1)  # (T, D, B, 3H)

            h0 = jnp.zeros((num_dir, inputs_tm.shape[1], hsz),
                           inputs_tm.dtype)

            def cell(h, xp_t):
                hp = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None, :]
                r = jax.nn.sigmoid(xp_t[..., :hsz] + hp[..., :hsz])
                z = jax.nn.sigmoid(
                    xp_t[..., hsz : 2 * hsz] + hp[..., hsz : 2 * hsz]
                )
                n = jnp.tanh(xp_t[..., 2 * hsz :] + r * hp[..., 2 * hsz :])
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h_last, ys = jax.lax.scan(cell, h0, xp,
                                      unroll=RNN_UNROLL)  # (T, D, B, H)
            outs = [ys[:, 0]]
            if num_dir == 2:
                outs.append(jnp.flip(ys[:, 1], axis=0))
            # (T, B, D*H) — still time-major
            return jnp.concatenate(outs, axis=-1), h_last

        def layer_params(cin, layer):
            tags = [f"l{layer}"] + ([f"l{layer}_rev"] if num_dir == 2 else [])
            w_ih = [self.param(f"w_ih_{t}", torch_uniform(bound), (cin, 3 * hsz))
                    for t in tags]
            w_hh = jnp.stack([
                self.param(f"w_hh_{t}", torch_uniform(bound), (hsz, 3 * hsz))
                for t in tags
            ])  # (D, H, 3H)
            b_ih = [self.param(f"b_ih_{t}", torch_uniform(bound), (3 * hsz,))
                    for t in tags]
            b_hh = jnp.stack([
                self.param(f"b_hh_{t}", torch_uniform(bound), (3 * hsz,))
                for t in tags
            ])  # (D, 3H)
            return w_ih, w_hh, b_ih, b_hh

        def pallas_stack(inputs_tm):
            """The whole stack through the fused v2 kernel: ONE matmul per
            layer emits the kernel-ready (T, B, D, 3P) layout (gate columns
            pre-padded inside the weights), biases fuse into the kernel's
            gate math, the reverse direction is walked by the kernel's grid
            index maps (no time flips anywhere), and intermediate layers
            consume the padded (T, B, D, P) output directly (zero weight
            rows on the pad lanes) — the exact (T, B, D*H) tensor is
            materialized once at the stack exit, not per layer. Numerics
            identical to the scan path (ops/gru_pallas.py v2 section)."""
            from ..ops import gru_pallas

            P = gru_pallas._round_up(hsz, gru_pallas.LANE)
            src = inputs_tm
            fins = []
            for layer in range(self.num_layers):
                cin = inputs_tm.shape[-1] if layer == 0 else num_dir * hsz
                w_ih, w_hh, b_ih, b_hh = layer_params(cin, layer)
                w_stack = gru_pallas.stack_input_weights(
                    w_ih, hsz, padded_input=layer > 0, num_dir_in=num_dir
                )
                xp = jnp.einsum("tbc,cdk->tbdk", src, w_stack)
                ys, h_last = gru_pallas.run_layer_v2(
                    xp, w_hh, jnp.stack(b_ih), b_hh
                )  # (T, B, D*P), pad lanes zero
                fins.extend(h_last[d] for d in range(num_dir))
                if self.dropout > 0.0 and layer < self.num_layers - 1:
                    # draw the mask on the UNPADDED (T, B, D*H) tensor so
                    # the rng consumption (and thus the trajectory) is
                    # identical to the scan engine, then restore the
                    # padded layout the next layer's kernel consumes
                    # (pad lanes stay zero). Only this train-with-dropout
                    # path pays the pad/unpad glue.
                    ys_real = jnp.concatenate(
                        [ys[:, :, d * P:d * P + hsz] for d in range(num_dir)],
                        axis=-1,
                    )
                    ys_real = nn.Dropout(rate=self.dropout)(
                        ys_real, deterministic=deterministic
                    )
                    pad = jnp.zeros(ys.shape[:2] + (P - hsz,), ys.dtype)
                    ys = jnp.concatenate(
                        [p for d in range(num_dir)
                         for p in (ys_real[:, :, d * hsz:(d + 1) * hsz], pad)],
                        axis=-1,
                    )
                src = ys
            outs = [src[:, :, d * P:d * P + hsz] for d in range(num_dir)]
            out = outs[0] if num_dir == 1 else jnp.concatenate(outs, axis=-1)
            return out, fins

        out = jnp.swapaxes(x, 0, 1)  # ONE transpose in...
        finals = []
        if _gru_engine() == "pallas":
            out, finals = pallas_stack(out)
        else:
            for layer in range(self.num_layers):
                out, h_last = layer_pass(out, layer)
                finals.extend(h_last[d] for d in range(num_dir))
                if self.dropout > 0.0 and layer < self.num_layers - 1:
                    out = nn.Dropout(rate=self.dropout)(
                        out, deterministic=deterministic
                    )
        if not self.time_major_out:
            out = jnp.swapaxes(out, 0, 1)  # ...and ONE transpose out
        return out, jnp.stack(finals, axis=0)


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM, torch cell semantics:
    gates ordered (i, f, g, o); same hoisted-input-projection + scan design
    as GRU. Returns (outputs, (h_last, c_last) stacked over layer*dir)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_dir = 2 if self.bidirectional else 1
        hsz = self.hidden_size
        bound = 1.0 / math.sqrt(hsz)

        def layer_pass(inputs_tm, layer):
            # both directions in one scan, time-major (see GRU.layer_pass)
            cin = inputs_tm.shape[-1]
            tags = [f"l{layer}"] + ([f"l{layer}_rev"] if num_dir == 2 else [])
            w_ih = [self.param(f"w_ih_{t}", torch_uniform(bound), (cin, 4 * hsz))
                    for t in tags]
            w_hh = jnp.stack([
                self.param(f"w_hh_{t}", torch_uniform(bound), (hsz, 4 * hsz))
                for t in tags
            ])
            b_ih = [self.param(f"b_ih_{t}", torch_uniform(bound), (4 * hsz,))
                    for t in tags]
            b_hh = jnp.stack([
                self.param(f"b_hh_{t}", torch_uniform(bound), (4 * hsz,))
                for t in tags
            ])

            xps = []
            for d in range(num_dir):
                xp = jnp.matmul(inputs_tm, w_ih[d]) + b_ih[d]  # (T, B, 4H)
                xps.append(jnp.flip(xp, axis=0) if d else xp)
            xp = jnp.stack(xps, axis=1)  # (T, D, B, 4H)

            h0 = jnp.zeros((num_dir, inputs_tm.shape[1], hsz),
                           inputs_tm.dtype)
            c0 = jnp.zeros_like(h0)

            def cell(carry, xp_t):
                h, c = carry
                gates = xp_t + jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None, :]
                i = jax.nn.sigmoid(gates[..., :hsz])
                f = jax.nn.sigmoid(gates[..., hsz : 2 * hsz])
                g = jnp.tanh(gates[..., 2 * hsz : 3 * hsz])
                o = jax.nn.sigmoid(gates[..., 3 * hsz :])
                c_new = f * c + i * g
                h_new = o * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            (h_last, c_last), ys = jax.lax.scan(cell, (h0, c0), xp,
                                                unroll=RNN_UNROLL)
            outs = [ys[:, 0]]
            if num_dir == 2:
                outs.append(jnp.flip(ys[:, 1], axis=0))
            # (T, B, D*H) — still time-major
            return jnp.concatenate(outs, axis=-1), (h_last, c_last)

        out = jnp.swapaxes(x, 0, 1)  # ONE transpose in...
        h_finals, c_finals = [], []
        for layer in range(self.num_layers):
            out, (h_last, c_last) = layer_pass(out, layer)
            h_finals.extend(h_last[d] for d in range(num_dir))
            c_finals.extend(c_last[d] for d in range(num_dir))
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        out = jnp.swapaxes(out, 0, 1)  # ...and ONE transpose out
        return out, (jnp.stack(h_finals, 0), jnp.stack(c_finals, 0))


class MaxPool2d(nn.Module):
    """Torch-style max pool on NHWC with stride == kernel (floor mode)."""

    kernel: tuple[int, int]

    def __call__(self, x):
        kh, kw = self.kernel
        b, h, w, c = x.shape
        x = x[:, : (h // kh) * kh, : (w // kw) * kw, :]
        x = x.reshape(b, h // kh, kh, w // kw, kw, c)
        return x.max(axis=(2, 4))




def sum_bidirectional(out: jax.Array, hidden_size: int) -> jax.Array:
    """Sum forward/backward halves of a bi-GRU output, the reference's
    recurring idiom (e.g. net/multimodal_context_net_v2.py:542)."""
    return out[..., :hidden_size] + out[..., hidden_size:]
