"""ctypes bridge to the native (C++) batch mel/MFCC front-end.

The shared library (`native/mel_frontend.cpp`) implements the host-side
data-preprocessing hot path — the work the reference does clip-by-clip via
librosa (utils/common.py:340-349). Constants (window, mel filterbank, DCT)
are computed once here by `dsp_ref` and passed in, guaranteeing numerical
agreement with the numpy/JAX paths.

`available()` triggers a lazy build with the in-image toolchain (g++) the
first time; failures degrade gracefully to the numpy implementation.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

from . import dsp_ref

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmel_frontend.so"


@functools.lru_cache(maxsize=1)
def _load_library():
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mel_mfcc_batch.argtypes = [
        f32p, ctypes.c_long, ctypes.c_long,          # audio, n_clips, n_samples
        f32p, ctypes.c_long, ctypes.c_long,          # window, n_fft, hop
        f32p, ctypes.c_long, ctypes.c_long,          # mel_fb, n_mels, n_bins
        f32p, ctypes.c_long,                         # dct, n_mfcc
        f32p, ctypes.c_long,                         # out, n_frames
    ]
    lib.mel_mfcc_batch.restype = None
    lib.log_mel_batch.argtypes = [
        f32p, ctypes.c_long, ctypes.c_long,
        f32p, ctypes.c_long, ctypes.c_long,
        f32p, ctypes.c_long, ctypes.c_long,
        f32p, ctypes.c_long,
    ]
    lib.log_mel_batch.restype = None
    return lib


def available() -> bool:
    return _load_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def get_mfcc_features_batch(
    audio: np.ndarray, sr: int = 16000, num_mfcc: int = 14,
    n_mels: int = 128, n_fft: int = 2048, hop: int = 512,
) -> np.ndarray:
    """(N, L) float32 -> (N, 3*num_mfcc-5, 1 + L//hop) via the C++ kernel."""
    lib = _load_library()
    if lib is None:
        return np.stack([
            dsp_ref.get_mfcc_features(a, sr=sr, num_mfcc=num_mfcc,
                                      n_mels=n_mels, n_fft=n_fft,
                                      hop_length=hop)
            for a in audio
        ])
    audio = np.ascontiguousarray(audio, np.float32)
    n_clips, n_samples = audio.shape
    n_frames = 1 + n_samples // hop
    window = dsp_ref.hann_window(n_fft).astype(np.float32)
    mel_fb = np.ascontiguousarray(dsp_ref.mel_filterbank(sr, n_fft, n_mels))
    dct = np.ascontiguousarray(dsp_ref.dct_matrix(num_mfcc, n_mels))
    out = np.empty((n_clips, 3 * num_mfcc - 5, n_frames), np.float32)
    lib.mel_mfcc_batch(
        _ptr(audio), n_clips, n_samples,
        _ptr(window), n_fft, hop,
        _ptr(mel_fb), n_mels, 1 + n_fft // 2,
        _ptr(dct), num_mfcc,
        _ptr(out), n_frames,
    )
    return out


def extract_mel_spectrogram_batch(
    audio: np.ndarray, sr: int = 16000, n_fft: int = 1024, hop: int = 512,
    n_mels: int = 128,
) -> np.ndarray:
    """(N, L) float32 -> (N, n_mels, 1 + L//hop) log-mel (ref=max)."""
    lib = _load_library()
    if lib is None:
        def one(a):
            mel = dsp_ref.melspectrogram(a, sr=sr, n_fft=n_fft,
                                         hop_length=hop, n_mels=n_mels)
            return dsp_ref.power_to_db(mel, ref=float(mel.max()))
        return np.stack([one(a) for a in audio]).astype(np.float32)
    audio = np.ascontiguousarray(audio, np.float32)
    n_clips, n_samples = audio.shape
    n_frames = 1 + n_samples // hop
    window = dsp_ref.hann_window(n_fft).astype(np.float32)
    mel_fb = np.ascontiguousarray(dsp_ref.mel_filterbank(sr, n_fft, n_mels))
    out = np.empty((n_clips, n_mels, n_frames), np.float32)
    lib.log_mel_batch(
        _ptr(audio), n_clips, n_samples,
        _ptr(window), n_fft, hop,
        _ptr(mel_fb), n_mels, 1 + n_fft // 2,
        _ptr(out), n_frames,
    )
    return out
