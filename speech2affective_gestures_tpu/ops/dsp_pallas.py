"""Fused Pallas TPU kernel for the mel front-end.

Computes mel_power = ((F @ C)^2 + (F @ S)^2) @ M in one kernel, where F are
windowed audio frames, C/S the real-DFT cosine/sine matrices and M the mel
filterbank. This is the framework's performance-critical "native" component
standing in for the reference's host-side librosa front-end
(utils/common.py:340-349) per BASELINE.json.

Why a kernel: the intermediate power spectrum is (B*T, 1+n_fft/2) — for a
batch of 128 clips that is ~37 MB of f32 written+read back per step if XLA
materializes it between the DFT matmuls and the mel projection. The fused
kernel keeps each row-tile's spectrum in VMEM: the grid walks (row tiles,
bin chunks) with the mel accumulator revisited across bin chunks, so HBM
traffic is only frames-in (streamed once per bin chunk) + (rows, n_mels)
out, and all three contractions run back-to-back on the MXU.

Numerics match ops/dsp.py (tested in interpret mode on CPU and compiled on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dsp_ref

ROW_TILE = 256
BIN_TILE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _padded_constants(sr: int, n_fft: int, n_mels: int):
    """DFT + mel matrices zero-padded so the bin axis tiles by BIN_TILE."""
    n_bins = 1 + n_fft // 2
    n_bins_pad = _round_up(n_bins, BIN_TILE)
    t = np.arange(n_fft)[:, None] * np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    cos = np.zeros((n_fft, n_bins_pad), np.float32)
    sin = np.zeros((n_fft, n_bins_pad), np.float32)
    cos[:, :n_bins] = np.cos(ang)
    sin[:, :n_bins] = np.sin(ang)
    mel = np.zeros((n_bins_pad, n_mels), np.float32)
    mel[:n_bins] = dsp_ref.mel_filterbank(sr, n_fft, n_mels).T
    return cos, sin, mel


def _mel_kernel(f_ref, c_ref, s_ref, m_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    re = jnp.dot(f_ref[:], c_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f_ref[:], s_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    out_ref[:] += jnp.dot(power, m_ref[:], preferred_element_type=jnp.float32)


def fused_mel_power_frames(
    frames: jax.Array, sr: int = 16000, n_fft: int = 2048, n_mels: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Windowed frames (R, n_fft) -> mel power (R, n_mels)."""
    cos, sin, mel = _padded_constants(sr, n_fft, n_mels)
    n_bins_pad = cos.shape[1]
    r = frames.shape[0]
    r_pad = _round_up(max(r, 8), ROW_TILE)
    if r_pad != r:
        frames = jnp.pad(frames, ((0, r_pad - r), (0, 0)))

    grid = (r_pad // ROW_TILE, n_bins_pad // BIN_TILE)
    out = pl.pallas_call(
        _mel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, BIN_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, BIN_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BIN_TILE, n_mels), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, n_mels), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * n_fft * n_bins_pad * 2
            + 2 * r_pad * n_bins_pad * n_mels,
            bytes_accessed=(
                r_pad * n_fft * 4 * grid[1]
                + 2 * n_fft * n_bins_pad * 4
                + n_bins_pad * n_mels * 4
                + r_pad * n_mels * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames.astype(jnp.float32), jnp.asarray(cos), jnp.asarray(sin),
      jnp.asarray(mel))
    return out[:r]


def mel_power_spectrogram(
    y: jax.Array, sr: int = 16000, n_fft: int = 2048, hop_length: int = 512,
    n_mels: int = 128, interpret: bool = False,
) -> jax.Array:
    """(..., L) waveform -> (..., T, n_mels), fused-kernel path.

    Same contract as ops.dsp.mel_power_spectrogram.
    """
    from . import dsp

    frames = dsp.frame_signal(y.astype(jnp.float32), n_fft, hop_length)
    frames = frames * jnp.asarray(dsp_ref.hann_window(n_fft).astype(np.float32))
    lead = frames.shape[:-1]
    flat = frames.reshape(-1, n_fft)
    out = fused_mel_power_frames(flat, sr, n_fft, n_mels, interpret=interpret)
    return out.reshape(lead + (n_mels,))


def get_mfcc_features(
    audio: jax.Array, sr: int = 16000, num_mfcc: int = 14, n_mels: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused-kernel version of ops.dsp.get_mfcc_features:
    (..., L) -> (..., 3*num_mfcc-5, T)."""
    from . import dsp

    mel = mel_power_spectrogram(audio, sr=sr, n_mels=n_mels,
                                interpret=interpret)
    return dsp.mfcc_tail_from_mel(mel, num_mfcc, n_mels)
