"""Host-side (numpy) DSP reference: STFT -> mel -> log -> DCT -> MFCC.

Numerically replicates the librosa calls used by the reference pipeline:

- `utils/common.py:340-349`  get_mfcc_features:
      librosa.feature.mfcc(audio, sr, n_mfcc=14) / 1000, then first/second
      coefficient-axis differences (m[2:]-m[1:-1]; d[1:]-d[:-1]) concatenated
      to a (3*n_mfcc-5, T) matrix (37 x T for n_mfcc=14).
- `utils/ted_db_utils.py:38-42`  extract_mel_spectrogram:
      librosa.feature.melspectrogram(y, sr, n_fft=1024, hop_length=512,
      power=2) -> power_to_db(ref=np.max) -> float16.

librosa-matching details (librosa 0.8.x defaults, the reference's era):
periodic Hann window, centered STFT with reflect padding, Slaney-scale
128-band mel filterbank with Slaney area normalization, power_to_db with
amin=1e-10 / top_db=80, orthonormal DCT-II over the mel axis.

This module is pure numpy (no librosa dependency); `dsp.py` provides the
jit-compiled on-device twin, tested to agree with this one.
"""

from __future__ import annotations

import functools

import numpy as np


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------

def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (scipy get_window('hann', n, fftbins=True))."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)


def hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa hz_to_mel(htk=False))."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asanyarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) Slaney-normalized triangular mel filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def stft_power(
    y: np.ndarray,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> np.ndarray:
    """Power spectrogram |STFT|^2 of shape (1 + n_fft//2, n_frames)."""
    y = np.asarray(y, dtype=np.float32)
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = y[idx] * hann_window(n_fft).astype(np.float32)[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    return (spec.real**2 + spec.imag**2).T.astype(np.float32)


def power_to_db(
    s: np.ndarray,
    ref: float | np.ndarray = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
) -> np.ndarray:
    log_spec = 10.0 * np.log10(np.maximum(amin, s))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


@functools.lru_cache(maxsize=None)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in): rows k, X = D @ x."""
    n = np.arange(n_in)
    k = np.arange(n_out)[:, None]
    d = np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * n_in))
    d *= np.sqrt(2.0 / n_in)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


# --------------------------------------------------------------------------
# public surface (mirrors the reference pipeline calls)
# --------------------------------------------------------------------------

def melspectrogram(
    y: np.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    power: float = 2.0,
) -> np.ndarray:
    """(n_mels, n_frames) mel power spectrogram (librosa defaults)."""
    s = stft_power(y, n_fft=n_fft, hop_length=hop_length)
    if power != 2.0:
        s = s ** (power / 2.0)
    return mel_filterbank(sr, n_fft, n_mels) @ s


def extract_mel_spectrogram(y: np.ndarray, sr: int = 16000) -> np.ndarray:
    """Log-mel (float16), ref utils/ted_db_utils.py:38-42 (n_fft=1024, hop=512,
    power_to_db ref=max)."""
    mel = melspectrogram(y, sr=sr, n_fft=1024, hop_length=512)
    return power_to_db(mel, ref=float(mel.max())).astype(np.float16)


def mfcc(
    y: np.ndarray, sr: int = 16000, n_mfcc: int = 14, n_mels: int = 128,
    n_fft: int = 2048, hop_length: int = 512,
) -> np.ndarray:
    """(n_mfcc, n_frames) MFCCs = DCT-II(ortho) of log-mel (librosa defaults:
    n_fft=2048, hop=512, power_to_db ref=1.0, top_db=80)."""
    s_db = power_to_db(
        melspectrogram(y, sr=sr, n_fft=n_fft, hop_length=hop_length,
                       n_mels=n_mels)
    )
    return dct_matrix(n_mfcc, n_mels) @ s_db


def get_mfcc_features(audio: np.ndarray, sr: int = 16000, num_mfcc: int = 14,
                      n_mels: int = 128, n_fft: int = 2048,
                      hop_length: int = 512) -> np.ndarray:
    """(3*num_mfcc - 5, n_frames) combined MFCC features.

    Matches reference `utils/common.py:340-349`: MFCC/1000, then
    coefficient-axis differences m[2:]-m[1:-1] and d[1:]-d[:-1], concatenated.
    """
    m = mfcc(audio, sr=sr, n_mfcc=num_mfcc, n_mels=n_mels, n_fft=n_fft,
             hop_length=hop_length) / 1000.0
    d1 = m[2:] - m[1:-1]
    d2 = d1[1:] - d1[:-1]
    return np.concatenate((m, d1, d2), axis=0)


def calc_spectrogram_length_from_motion_length(n_frames: int, fps: float) -> int:
    """ref utils/ted_db_utils.py:45-47."""
    return int(round((n_frames / fps * 16000 - 1024) / 512 + 1))
