"""On-device DSP: batched STFT -> mel -> log-mel / MFCC as MXU matmuls.

TPU-first replacement for the reference's host-side librosa front-end
(`utils/common.py:340-349`, `utils/ted_db_utils.py:38-42`): instead of a
per-clip CPU FFT, the whole batch is framed with one gather and pushed
through real-DFT *matmuls* — (B*T, n_fft) @ (n_fft, n_bins) — which map
straight onto the 128x128 systolic array; the mel projection and DCT are
two more matmuls that XLA fuses into the same pipeline.  A fused Pallas
kernel (`dsp_pallas.py`) covers the window+DFT+power+mel chain without
materializing the (B, T, 1025) power spectrogram in HBM.

Numerics match `dsp_ref.py` (and therefore librosa 0.8 defaults).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import backend
from . import dsp_ref


class _DFTConstants(NamedTuple):
    window: np.ndarray     # (n_fft,)
    cos: np.ndarray        # (n_fft, n_bins)
    sin: np.ndarray        # (n_fft, n_bins)
    mel: np.ndarray        # (n_bins, n_mels)


@functools.lru_cache(maxsize=None)
def _constants(sr: int, n_fft: int, n_mels: int) -> _DFTConstants:
    n_bins = 1 + n_fft // 2
    t = np.arange(n_fft)[:, None] * np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    return _DFTConstants(
        window=dsp_ref.hann_window(n_fft).astype(np.float32),
        cos=np.cos(ang).astype(np.float32),
        sin=np.sin(ang).astype(np.float32),
        mel=dsp_ref.mel_filterbank(sr, n_fft, n_mels).T.copy(),
    )


def frame_signal(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Centered framing with reflect padding: (..., L) -> (..., T, n_fft)."""
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    return y[..., idx]


def mel_power_spectrogram(
    y: jax.Array,
    sr: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
) -> jax.Array:
    """(..., L) waveform -> (..., T, n_mels) mel power spectrogram."""
    c = _constants(sr, n_fft, n_mels)
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length)
    frames = frames * jnp.asarray(c.window)
    re = jnp.matmul(frames, jnp.asarray(c.cos), precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(c.sin), precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    return jnp.matmul(power, jnp.asarray(c.mel), precision=jax.lax.Precision.HIGHEST)


def power_to_db(
    s: jax.Array,
    ref: jax.Array | float = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    max_axes: tuple[int, ...] | None = None,
) -> jax.Array:
    """librosa power_to_db; `max_axes` controls which axes the top_db clamp
    maxes over (per-sample for batched inputs; None = all axes)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        m = jnp.max(log_spec, axis=max_axes, keepdims=max_axes is not None)
        log_spec = jnp.maximum(log_spec, m - top_db)
    return log_spec


def extract_mel_spectrogram(y: jax.Array, sr: int = 16000) -> jax.Array:
    """Log-mel in reference layout (..., n_mels, T), ref=per-sample max
    (utils/ted_db_utils.py:38-42). Batched over leading dims."""
    mel = mel_power_spectrogram(y, sr=sr, n_fft=1024, hop_length=512)
    mel_t = jnp.swapaxes(mel, -1, -2)  # (..., n_mels, T)
    ref_max = jnp.max(mel_t, axis=(-2, -1), keepdims=True)
    return power_to_db(mel_t, ref=ref_max, max_axes=(-2, -1))


def mfcc(
    y: jax.Array, sr: int = 16000, n_mfcc: int = 14, n_mels: int = 128
) -> jax.Array:
    """(..., L) -> (..., n_mfcc, T) MFCCs (librosa defaults, top_db=80
    clamped per sample)."""
    mel = mel_power_spectrogram(y, sr=sr, n_mels=n_mels)  # (..., T, n_mels)
    s_db = power_to_db(mel, max_axes=(-2, -1))
    d = jnp.asarray(dsp_ref.dct_matrix(n_mfcc, n_mels).T)  # (n_mels, n_mfcc)
    out = jnp.matmul(s_db, d, precision=jax.lax.Precision.HIGHEST)
    return jnp.swapaxes(out, -1, -2)


def mfcc_tail_from_mel(mel: jax.Array, num_mfcc: int, n_mels: int) -> jax.Array:
    """Shared post-mel pipeline: power_to_db -> DCT -> /1000 ->
    coefficient-axis diffs (ref utils/common.py:340-349). mel: (..., T,
    n_mels) -> (..., 3*num_mfcc-5, T). Used by both the XLA and Pallas
    mel backends so the tail can never diverge between them."""
    s_db = power_to_db(mel, max_axes=(-2, -1))
    d = jnp.asarray(dsp_ref.dct_matrix(num_mfcc, n_mels).T)
    m = jnp.swapaxes(
        jnp.matmul(s_db, d, precision=jax.lax.Precision.HIGHEST), -1, -2
    ) / 1000.0
    d1 = m[..., 2:, :] - m[..., 1:-1, :]
    d2 = d1[..., 1:, :] - d1[..., :-1, :]
    return jnp.concatenate((m, d1, d2), axis=-2)


def get_mfcc_features(
    audio: jax.Array, sr: int = 16000, num_mfcc: int = 14, n_mels: int = 128
) -> jax.Array:
    """(..., L) -> (..., 3*num_mfcc-5, T) combined MFCC+diff features,
    matching reference utils/common.py:340-349."""
    mel = mel_power_spectrogram(audio, sr=sr, n_mels=n_mels)
    return mfcc_tail_from_mel(mel, num_mfcc, n_mels)


def get_mfcc_features_fast(
    audio: jax.Array, sr: int = 16000, num_mfcc: int = 14
) -> jax.Array:
    """get_mfcc_features via the fused Pallas mel kernel on TPU.

    Honest measurement (docs/PERFORMANCE.md): the two paths are a
    statistical TIE on v5e (1.41 vs 1.39 ms/batch-128) — current XLA fuses
    the window->DFT->power->mel chain on its own; the kernel remains as
    the VMEM-resident alternative. Falls back to the XLA path on non-TPU
    backends (the kernel uses pltpu memory spaces)."""
    if not backend.is_tpu():
        return get_mfcc_features(audio, sr=sr, num_mfcc=num_mfcc)
    from . import dsp_pallas

    return dsp_pallas.get_mfcc_features(audio, sr=sr, num_mfcc=num_mfcc)
