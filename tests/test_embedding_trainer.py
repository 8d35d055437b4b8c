"""train/embedding_trainer.py: the FGD autoencoder producer.

The reference consumes a pre-trained `outputs/embedding_net.pth.tar`
(net/embedding_space_evaluator.py:20-27) but ships no trainer for it;
`train_pose_embedding` closes that gap. These tests pin down:

1. the returned variables plug straight into EmbeddingSpaceEvaluator and
   produce a finite, discriminating FGD;
2. training actually reduces reconstruction loss on a learnable signal;
3. the variational branch (KLD term) runs and returns finite loss.
"""

import numpy as np
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.train.embedding_trainer import (
    train_pose_embedding,
)
from speech2affective_gestures_tpu.train.evaluator import (
    EmbeddingSpaceEvaluator,
)

pytestmark = pytest.mark.slow  # trains a small net (compile-heavy on CPU)


def _windows(n=96, seed=0):
    """Smooth low-rank pose windows (N, T, POSE_DIM): a few sinusoidal
    basis functions mixed per sample — learnable structure, not noise."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, C.N_POSES)[None, :, None]
    freqs = np.array([1.0, 2.0, 3.5])[None, None, :]
    basis = np.sin(2 * np.pi * freqs * t + rng.uniform(
        0, 2 * np.pi, (n, 1, freqs.shape[-1])))          # (N, T, K)
    mix = rng.normal(0, 0.3, (n, freqs.shape[-1], C.POSE_DIM))
    return (basis @ mix).astype(np.float32)


@pytest.fixture(scope="module")
def trained():
    return train_pose_embedding(_windows(), epochs=12, batch_size=32, seed=1)


def test_loss_decreases(trained):
    fresh = train_pose_embedding(_windows(), epochs=1, batch_size=32, seed=1)
    assert np.isfinite(trained["final_loss"])
    assert trained["final_loss"] < fresh["final_loss"]


def test_variables_feed_evaluator_and_fgd_discriminates(trained):
    ev = EmbeddingSpaceEvaluator(trained["variables"])
    real = _windows(seed=0)
    feats = np.asarray(ev._embed(real)[0])
    assert np.all(np.isfinite(feats))
    half = len(feats) // 2
    fgd_split = ev.frechet_distance(feats[:half], feats[half:2 * half])
    noise = np.asarray(
        np.random.default_rng(3).normal(0, 1, real.shape), np.float32)
    noise_feats = np.asarray(ev._embed(noise)[0])
    fgd_noise = ev.frechet_distance(noise_feats, feats)
    assert np.isfinite(fgd_split) and fgd_split > 0.0
    assert fgd_noise > fgd_split, (fgd_noise, fgd_split)


def test_variational_branch_runs():
    out = train_pose_embedding(_windows(32), epochs=1, batch_size=16,
                               variational=True)
    assert np.isfinite(out["final_loss"])


def test_too_few_windows_raises():
    with pytest.raises(ValueError):
        train_pose_embedding(_windows(1))
