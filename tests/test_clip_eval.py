"""Clip stitching + end-to-end long-clip generation on synthetic data."""

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train import clip_eval
from speech2affective_gestures_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2,
                  batch_size=8)


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=10.0)
    ds = ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)
    return Trainer(
        CFG, str(tmp_path_factory.mktemp("work")),
        train_data=ds, val_data=ds, test_data=ds, seed=0,
    )


def test_stitch_test_clips(trainer):
    clips = list(clip_eval.stitch_test_clips(trainer.test_data))
    # contiguous windows of each synthetic video merge into one clip per vid
    vids = [c["vid"] for c in clips]
    assert len(set(vids)) == len(vids)
    for clip in clips:
        assert clip["poses"].ndim == 3
        dur = clip["time"][1] - clip["time"][0]
        assert dur > 3.0
        assert len(clip["audio"]) > 16000


def test_generate_gestures_by_dataset_ted(trainer, tmp_path):
    results = clip_eval.generate_gestures_by_dataset(
        trainer, "ted_db",
        data_params={"clip_duration_range": [1, 30]},
        check_duration=True, randomized=False, fade_out=True,
        make_video=False, save_pkl=True, save_path=str(tmp_path),
    )
    assert len(results) >= 1
    vid, (resampled, tri_poses, out_poses) = results[0]
    assert out_poses.ndim == 3 and out_poses.shape[-1] == 3
    assert tri_poses is not None
    import os

    pkls = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    assert any("_s2ag" in f for f in pkls) and any("_trimodal" in f for f in pkls)


def test_duration_filter(trainer):
    renderer = clip_eval.ClipRenderer(trainer)
    poses = np.zeros((30, 10, 3), np.float32)
    audio = np.zeros(32000, np.float32)
    res = renderer.render_clip(
        "v", poses, audio, 16000, [["a", 0.1, 0.3], ["b", 0.5, 0.9]],
        [0.0, 2.0], check_duration=True, clip_duration_range=(5, 30),
    )
    assert res == (None, None, None)


def test_generate_by_dataset_batched_matches_per_clip(trainer, tmp_path):
    """batched=True must reproduce the per-clip loop: same speaker/rng
    draw sequence, same synthesis numerics (one vmapped program instead of
    one scan per clip), same pkl artifacts."""
    kwargs = dict(
        data_params={"clip_duration_range": [1, 30]},
        check_duration=True, randomized=True, fade_out=True,
        make_video=False, seed=123,
    )
    want = clip_eval.generate_gestures_by_dataset(
        trainer, "ted_db", save_pkl=False, **kwargs
    )
    got = clip_eval.generate_gestures_by_dataset(
        trainer, "ted_db", save_pkl=True, save_path=str(tmp_path),
        batched=True, **kwargs
    )
    assert len(got) == len(want) >= 1
    for (vid_w, res_w), (vid_g, res_g) in zip(want, got):
        assert vid_w == vid_g
        np.testing.assert_allclose(res_g[0], res_w[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(res_g[1], res_w[1], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(res_g[2], res_w[2], rtol=1e-4, atol=1e-4)
    import os

    pkls = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    assert any("_s2ag" in f for f in pkls) and any("_trimodal" in f for f in pkls)


def test_generate_by_dataset_batched_rejects_video(trainer):
    with pytest.raises(ValueError, match="video"):
        clip_eval.generate_gestures_by_dataset(
            trainer, "ted_db", batched=True, make_video=True
        )
