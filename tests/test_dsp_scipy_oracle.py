"""DSP front-end vs scipy as an INDEPENDENT oracle (round-4 verdict item 2).

The true oracle for the reference's audio features is librosa 0.8
(`/root/reference/utils/common.py:340-349`, `utils/ted_db_utils.py:38-42`),
which is not installed here — but librosa 0.8 itself delegates its window to
`scipy.signal.get_window('hann', n, fftbins=True)` and its DCT to
`scipy.fftpack.dct(type=2, norm='ortho')`, and its Slaney mel filterbank is
the published Auditory Toolbox formula. scipy 1.x IS in this image, so every
piece of dsp_ref that previously rested on a self-derivation is checked here
against scipy (window, DCT) or an independently-coded scalar-loop Slaney
construction (filterbank), plus one end-to-end MFCC+Δ+ΔΔ (37 x 70) against a
pipeline assembled only from those oracle pieces.

Only the final librosa filterbank/STFT byte-for-byte cross-check remains
gated on the uncapturable tests/golden/librosa_mfcc.npz fixture
(test_dsp.py::test_against_librosa_golden).
"""

import math

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")
scipy_fftpack = pytest.importorskip("scipy.fftpack")

from speech2affective_gestures_tpu.ops import dsp_ref


def _chirp(n, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = (0.4 * np.sin(2 * np.pi * (200 + 40 * t) * t)
           + 0.05 * rng.standard_normal(n))
    return sig.astype(np.float32)


# ---------------------------------------------------------------- window
@pytest.mark.parametrize("n_fft", [256, 1024, 2048])
def test_hann_window_matches_scipy(n_fft):
    # librosa 0.8 get_window path: scipy periodic (fftbins=True) Hann
    theirs = scipy_signal.get_window("hann", n_fft, fftbins=True)
    np.testing.assert_allclose(dsp_ref.hann_window(n_fft), theirs,
                               rtol=0, atol=1e-12)


# ------------------------------------------------------------------ DCT
def test_dct_matrix_matches_scipy_fftpack():
    # librosa.feature.mfcc applies scipy.fftpack.dct(S, axis=0, type=2,
    # norm='ortho')[:n_mfcc] to the log-mel spectrogram
    x = np.random.default_rng(7).standard_normal((128, 9)).astype(np.float64)
    ours = dsp_ref.dct_matrix(14, 128).astype(np.float64) @ x
    theirs = scipy_fftpack.dct(x, axis=0, type=2, norm="ortho")[:14]
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_dct_matrix_full_square_matches_scipy():
    x = np.eye(64)
    ours = dsp_ref.dct_matrix(64, 64).astype(np.float64) @ x
    theirs = scipy_fftpack.dct(x, axis=0, type=2, norm="ortho")
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


# -------------------------------------------------------- mel filterbank
def _slaney_filterbank_loop(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """Slaney (Auditory Toolbox 1998) mel filterbank, coded as scalar math
    + per-filter loops — deliberately a DIFFERENT implementation shape from
    dsp_ref.mel_filterbank's vectorized ramps, so a shared systematic error
    cannot pass both."""
    if fmax is None:
        fmax = sr / 2.0
    step = math.log(6.4) / 27.0

    def to_mel(f):
        return f * 3.0 / 200.0 if f < 1000.0 else (
            15.0 + math.log(f / 1000.0) / step)

    def to_hz(m):
        return m * 200.0 / 3.0 if m < 15.0 else (
            1000.0 * math.exp(step * (m - 15.0)))

    lo, hi = to_mel(fmin), to_mel(fmax)
    pts = [to_hz(lo + (hi - lo) * i / (n_mels + 1)) for i in range(n_mels + 2)]
    n_bins = 1 + n_fft // 2
    fftfreqs = [sr / 2.0 * k / (n_bins - 1) for k in range(n_bins)]
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        f_lo, f_c, f_hi = pts[m], pts[m + 1], pts[m + 2]
        enorm = 2.0 / (f_hi - f_lo)  # Slaney area normalization
        for k, f in enumerate(fftfreqs):
            if f_lo < f < f_c:
                w = (f - f_lo) / (f_c - f_lo)
            elif f_c <= f < f_hi:
                w = (f_hi - f) / (f_hi - f_c)
            elif f == f_c:
                w = 1.0
            else:
                w = 0.0
            fb[m, k] = w * enorm
    return fb


@pytest.mark.parametrize("sr,n_fft", [(16000, 2048), (16000, 1024)])
def test_mel_filterbank_matches_slaney_loop_construction(sr, n_fft):
    ours = dsp_ref.mel_filterbank(sr, n_fft, 128).astype(np.float64)
    oracle = _slaney_filterbank_loop(sr, n_fft, 128)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-7)


# -------------------------------------------------- end-to-end MFCC 37x70
def _oracle_mfcc_features(y, sr=16000, n_mfcc=14, n_mels=128, n_fft=2048,
                          hop=512):
    """get_mfcc_features (reference utils/common.py:340-349) assembled ONLY
    from oracle pieces: scipy window, explicit frame loop + np.fft, the
    loop-built Slaney filterbank, inline power_to_db, scipy DCT."""
    y = np.pad(np.asarray(y, dtype=np.float64), n_fft // 2, mode="reflect")
    win = scipy_signal.get_window("hann", n_fft, fftbins=True)
    n_frames = 1 + (len(y) - n_fft) // hop
    power = np.empty((1 + n_fft // 2, n_frames))
    for i in range(n_frames):
        seg = y[i * hop:i * hop + n_fft] * win
        power[:, i] = np.abs(np.fft.rfft(seg, n=n_fft)) ** 2
    mel = _slaney_filterbank_loop(sr, n_fft, n_mels) @ power
    log_spec = 10.0 * np.log10(np.maximum(1e-10, mel))  # ref=1.0
    log_spec = np.maximum(log_spec, log_spec.max() - 80.0)  # top_db=80
    m = scipy_fftpack.dct(log_spec, axis=0, type=2, norm="ortho")[:n_mfcc]
    m = m / 1000.0
    d1 = m[2:] - m[1:-1]
    d2 = d1[1:] - d1[:-1]
    return np.concatenate((m, d1, d2), axis=0)


def test_end_to_end_mfcc_features_vs_scipy_pipeline():
    # 35400 samples -> 70 centered frames at hop 512: the (37, 70) feature
    # block the reference feeds MFCCEncoder (net/multimodal_context_net_v2)
    y = _chirp(35400)
    ours = dsp_ref.get_mfcc_features(y, sr=16000, num_mfcc=14)
    oracle = _oracle_mfcc_features(y)
    assert ours.shape == oracle.shape == (37, 70)
    # f32 pipeline vs f64 oracle: agreement to ~1e-4 absolute on features
    # whose magnitudes are O(1e-3..1e-1) after the /1000
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-5)


def test_extract_mel_spectrogram_vs_scipy_pipeline():
    # utils/ted_db_utils.py:38-42: n_fft=1024, hop=512, power_to_db(ref=max)
    y = _chirp(16000)
    ours = dsp_ref.extract_mel_spectrogram(y).astype(np.float64)
    ypad = np.pad(np.asarray(y, dtype=np.float64), 512, mode="reflect")
    win = scipy_signal.get_window("hann", 1024, fftbins=True)
    n_frames = 1 + (len(ypad) - 1024) // 512
    power = np.empty((513, n_frames))
    for i in range(n_frames):
        seg = ypad[i * 512:i * 512 + 1024] * win
        power[:, i] = np.abs(np.fft.rfft(seg, n=1024)) ** 2
    mel = _slaney_filterbank_loop(16000, 1024, 128) @ power
    db = 10.0 * np.log10(np.maximum(1e-10, mel))
    db -= 10.0 * np.log10(max(1e-10, mel.max()))
    db = np.maximum(db, db.max() - 80.0)
    # ours went through float16 storage (the reference stores f16 too)
    np.testing.assert_allclose(ours, db, rtol=5e-3, atol=0.05)
