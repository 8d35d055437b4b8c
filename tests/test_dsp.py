"""DSP front-end: numpy reference self-consistency + JAX twin agreement.

librosa is unavailable in this environment; dsp_ref replicates its 0.8-era
formulas (documented in the module), and the on-device JAX implementation is
gated against dsp_ref here. Golden values captured from a librosa install
can be dropped into tests/golden/librosa_mfcc.npz to tighten the loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.ops import dsp, dsp_ref


def _chirp(n, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = 0.4 * np.sin(2 * np.pi * (200 + 40 * t) * t) + 0.05 * rng.standard_normal(n)
    return sig.astype(np.float32)


def test_mel_filterbank_properties():
    fb = dsp_ref.mel_filterbank(16000, 2048)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # every filter has support; Slaney norm keeps areas roughly equal
    assert np.all(fb.sum(axis=1) > 0)


def test_dct_matrix_orthonormal():
    d = dsp_ref.dct_matrix(128, 128)
    np.testing.assert_allclose(d @ d.T, np.eye(128), atol=1e-5)


def test_stft_power_matches_npfft():
    y = _chirp(8192)
    p = dsp_ref.stft_power(y, n_fft=1024, hop_length=512)
    assert p.shape == (513, 1 + 8192 // 512)


def test_mfcc_shapes_and_frame_count():
    y = _chirp(C.EXPECTED_AUDIO_LENGTH)
    m = dsp_ref.get_mfcc_features(y, sr=16000, num_mfcc=14)
    assert m.shape == (C.NUM_MFCC_COMBINED, 71)  # 37 x 71 for 36267 samples


def test_jax_melspec_matches_ref():
    y = _chirp(C.EXPECTED_AUDIO_LENGTH)
    want = dsp_ref.melspectrogram(y)  # (128, T)
    got = np.asarray(dsp.mel_power_spectrogram(jnp.asarray(y))).T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_jax_mfcc_matches_ref():
    y = _chirp(C.EXPECTED_AUDIO_LENGTH)
    want = dsp_ref.get_mfcc_features(y)
    got = np.asarray(dsp.get_mfcc_features(jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_jax_mfcc_batched_equals_single():
    ys = np.stack([_chirp(C.EXPECTED_AUDIO_LENGTH, seed=i) for i in range(3)])
    batched = np.asarray(dsp.get_mfcc_features(jnp.asarray(ys)))
    singles = np.stack(
        [np.asarray(dsp.get_mfcc_features(jnp.asarray(y))) for y in ys]
    )
    np.testing.assert_allclose(batched, singles, rtol=1e-5, atol=1e-6)


def test_jax_logmel_matches_ref():
    y = _chirp(40960)
    want = dsp_ref.extract_mel_spectrogram(y).astype(np.float32)
    got = np.asarray(dsp.extract_mel_spectrogram(jnp.asarray(y))).astype(np.float32)
    # reference casts to f16; compare at f16 resolution
    np.testing.assert_allclose(got, want, atol=0.1)


def test_spectrogram_length_formula():
    assert dsp_ref.calc_spectrogram_length_from_motion_length(C.N_POSES, C.FPS) == 70


@pytest.mark.skipif(
    not __import__("pathlib").Path("tests/golden/librosa_mfcc.npz").exists(),
    reason="librosa golden fixture not captured in this environment",
)
def test_against_librosa_golden():
    data = np.load("tests/golden/librosa_mfcc.npz")
    got = dsp_ref.get_mfcc_features(data["audio"], sr=16000, num_mfcc=14)
    np.testing.assert_allclose(got, data["mfcc_combined"], rtol=1e-4, atol=1e-5)


def test_against_self_golden():
    """Regression lock: committed fixture of this repo's own DSP outputs
    (guards refactors of dsp_ref/dsp/dsp_native against silent drift)."""
    data = np.load("tests/golden/dsp_self_golden.npz")
    got = dsp_ref.get_mfcc_features(data["audio"])
    np.testing.assert_allclose(got, data["mfcc_combined"], rtol=1e-5, atol=1e-7)
    got_mel = dsp_ref.extract_mel_spectrogram(data["audio"]).astype(np.float32)
    np.testing.assert_allclose(got_mel, data["log_mel"], atol=1e-3)
