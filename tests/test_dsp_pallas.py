"""Fused Pallas mel kernel vs the XLA reference path (interpret mode on CPU;
the compiled TPU path is exercised by bench/verify runs)."""

import numpy as np
import jax.numpy as jnp

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.ops import dsp, dsp_pallas


def _chirp(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    return (0.4 * np.sin(2 * np.pi * (200 + 40 * t) * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_fused_mel_matches_xla():
    y = _chirp(C.EXPECTED_AUDIO_LENGTH)
    want = np.asarray(dsp.mel_power_spectrogram(jnp.asarray(y)))
    got = np.asarray(
        dsp_pallas.mel_power_spectrogram(jnp.asarray(y), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)


def test_fused_mfcc_matches_xla_batched():
    ys = np.stack([_chirp(C.EXPECTED_AUDIO_LENGTH, s) for s in range(2)])
    want = np.asarray(dsp.get_mfcc_features(jnp.asarray(ys))) / 1.0
    got = np.asarray(
        dsp_pallas.get_mfcc_features(jnp.asarray(ys), interpret=True)
    )
    # dsp.get_mfcc_features already divides by 1000 inside
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_row_padding_edge():
    # rows not divisible by the tile: 3 frames only
    frames = np.random.default_rng(0).standard_normal((3, 2048)).astype(np.float32)
    out = np.asarray(
        dsp_pallas.fused_mel_power_frames(jnp.asarray(frames), interpret=True)
    )
    assert out.shape == (3, 128)
    assert np.isfinite(out).all()
