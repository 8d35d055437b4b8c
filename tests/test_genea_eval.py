"""GENEA dataset path end-to-end (ref processor_v2.py:1524-1564).

Builds a synthetic GENEA-layout dataset on the fly — a 31-joint BVH
written by our OWN writer (render/bvh.save_as_bvh), a 16 kHz wav, and a
Google-STT-shaped JSON transcript — then drives
generate_gestures_by_dataset('genea_challenge_2020') through wav loading,
BVH parse + FK, decade-bound scaling, transcript flattening and windowed
synthesis, in both the per-clip and batched modes.
"""

import json
import os

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.render import bvh as bvh_mod
from speech2affective_gestures_tpu.train import clip_eval
from speech2affective_gestures_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2,
                  batch_size=8)

N_JOINTS = 31  # GENEA_JOINTS_TO_KEEP indexes up to 30
N_FRAMES = 240  # 8 s at 30 fps


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=10.0)
    ds = ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)
    return Trainer(
        CFG, str(tmp_path_factory.mktemp("work")),
        train_data=ds, val_data=ds, test_data=ds, seed=0,
    )


@pytest.fixture(scope="module")
def genea_dir(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("genea")
    for sub in ("audio", "bvh_raw", "transcripts"):
        os.makedirs(root / sub)
    rng = np.random.default_rng(5)

    # --- skeleton: a simple chain with unit offsets, gentle rotations
    parents = [-1] + list(range(N_JOINTS - 1))
    offsets = np.zeros((N_JOINTS, 3), np.float32)
    offsets[1:, 1] = 1.0
    angles = 0.15 * np.sin(
        np.linspace(0, 6 * np.pi, N_FRAMES)[:, None]
        + np.linspace(0, 2, N_JOINTS)[None, :]
    )
    quats = np.zeros((N_FRAMES, N_JOINTS, 4), np.float32)
    quats[..., 0] = np.cos(angles / 2)
    quats[..., 3] = np.sin(angles / 2)  # rotate about z
    positions = np.zeros((N_FRAMES, N_JOINTS, 3), np.float32)
    positions[:, 0, 1] = 10.0  # root height (keeps joint positions > 0)

    out = bvh_mod.save_as_bvh(
        {
            "joint_names": [f"j{k}" for k in range(N_JOINTS)],
            "joint_offsets": offsets,
            "joint_parents": parents,
            "positions": positions,
            "rotations": quats,
        },
        str(root / "tmp_bvh"),
        frame_time=1.0 / 30,
    )
    os.replace(out, root / "bvh_raw" / "clip0.bvh")

    audio = (0.2 * np.sin(
        2 * np.pi * 220 * np.arange(8 * 16000) / 16000
    )).astype(np.float32)
    wavfile.write(root / "audio" / "clip0.wav", 16000,
                  (audio * 32767).astype(np.int16))

    transcript = [{
        "alternatives": [{
            "words": [
                {"word": "hello", "start_time": "0.5s", "end_time": "0.9s"},
                {"word": "world", "start_time": "3.0s", "end_time": "3.4s"},
            ],
        }],
    }]
    with open(root / "transcripts" / "clip0.json", "w") as f:
        json.dump(transcript, f)
    return str(root)


def test_genea_per_clip_and_batched(trainer, genea_dir, tmp_path):
    kwargs = dict(
        data_params={"data_path": genea_dir},
        check_duration=True, randomized=False, fade_out=False,
        make_video=False,
    )
    want = clip_eval.generate_gestures_by_dataset(
        trainer, "genea_challenge_2020", **kwargs
    )
    assert len(want) == 1
    name, (resampled, tri_poses, out_poses) = want[0]
    assert name == "clip0"
    assert out_poses.ndim == 3 and out_poses.shape[-1] == 3
    assert np.isfinite(out_poses).all()
    assert tri_poses is not None

    got = clip_eval.generate_gestures_by_dataset(
        trainer, "genea_challenge_2020", batched=True,
        save_pkl=True, save_path=str(tmp_path), **kwargs
    )
    assert len(got) == 1 and got[0][0] == "clip0"
    for a, b in zip(got[0][1], want[0][1]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    pkls = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    assert any("_s2ag" in f for f in pkls)
