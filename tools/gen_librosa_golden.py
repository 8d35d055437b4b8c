"""Capture librosa golden fixtures for the DSP parity tests.

This container has no librosa (zero-egress image); run this script in any
environment WITH librosa installed and copy the produced
tests/golden/librosa_mfcc.npz into the repo — tests/test_dsp.py picks it up
automatically and tightens the DSP parity loop from "matches our
re-derivation of librosa 0.8 formulas" to "matches librosa itself".
"""

import numpy as np


def main():
    import librosa  # requires a connected environment

    rng = np.random.default_rng(0)
    sr, n = 16000, 36267
    t = np.arange(n) / sr
    audio = (0.4 * np.sin(2 * np.pi * (200 + 40 * t) * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)

    m = librosa.feature.mfcc(y=audio, sr=sr, n_mfcc=14) / 1000.0
    d1 = m[2:] - m[1:-1]
    d2 = d1[1:] - d1[:-1]
    mfcc_combined = np.concatenate((m, d1, d2), axis=0)

    mel = librosa.feature.melspectrogram(y=audio, sr=sr, n_fft=1024,
                                         hop_length=512, power=2)
    log_mel = librosa.power_to_db(mel, ref=np.max).astype(np.float16)

    np.savez_compressed(
        "tests/golden/librosa_mfcc.npz",
        audio=audio,
        mfcc_combined=mfcc_combined,
        log_mel=log_mel,
        librosa_version=np.array(librosa.__version__),
    )
    print("wrote tests/golden/librosa_mfcc.npz", mfcc_combined.shape)


if __name__ == "__main__":
    main()
