"""Native (C++) mel front-end: builds with the in-image toolchain and
matches the numpy reference bit-close."""

import numpy as np
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.ops import dsp_native, dsp_ref


def _clips(rng, n=3):
    return (rng.standard_normal((n, C.EXPECTED_AUDIO_LENGTH)) * 0.1
            ).astype(np.float32)


def test_native_builds():
    assert dsp_native.available(), "g++ build of native/mel_frontend.cpp failed"


def test_native_mfcc_matches_numpy(rng):
    audio = _clips(rng)
    got = dsp_native.get_mfcc_features_batch(audio)
    want = np.stack([dsp_ref.get_mfcc_features(a) for a in audio])
    assert got.shape == want.shape == (3, 37, 71)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_native_logmel_matches_numpy(rng):
    audio = _clips(rng, 2)
    got = dsp_native.extract_mel_spectrogram_batch(audio)
    want = np.stack([
        dsp_ref.extract_mel_spectrogram(a).astype(np.float32) for a in audio
    ])
    # the reference path rounds through float16; compare at f16 resolution
    np.testing.assert_allclose(got, want, atol=0.05)


def test_native_handles_short_clip(rng):
    audio = (rng.standard_normal((2, 4096)) * 0.1).astype(np.float32)
    got = dsp_native.get_mfcc_features_batch(audio)
    want = np.stack([dsp_ref.get_mfcc_features(a) for a in audio])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_preprocessor_uses_batched_mfcc(rng):
    """Pipeline output is unchanged by the batched-native refactor."""
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.data import ted_db

    cfg = ModelConfig()
    videos = ted_db.make_synthetic_videos(n_videos=1, clip_seconds=6.0)
    ds = ted_db.build_dataset_from_videos(videos, cfg)
    assert ds.n_samples > 0
    assert ds.mfcc_features.shape[1:] == (37, cfg.mfcc_length)
    assert np.isfinite(ds.mfcc_features.astype(np.float32)).all()
