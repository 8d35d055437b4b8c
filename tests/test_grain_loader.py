"""grain input pipeline over the packed dataset."""

import numpy as np
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db

gp = pytest.importorskip("grain.python")

from speech2affective_gestures_tpu.data import grain_loader  # noqa: E402

CFG = ModelConfig()


@pytest.fixture(scope="module")
def dataset():
    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=8.0)
    return ted_db.build_dataset_from_videos(videos, CFG)


def test_loader_yields_training_batches(dataset):
    loader = grain_loader.make_data_loader(dataset, batch_size=8, seed=0)
    batches = list(loader)
    assert len(batches) == dataset.n_samples // 8
    b = batches[0]
    assert b["extended_word_seq"].shape == (8, CFG.n_poses)
    assert b["vec_seq"].shape == (8, CFG.n_poses, C.POSE_DIM)
    assert b["audio"].shape == (8, CFG.expected_audio_length)
    assert b["mfcc_features"].dtype == np.float32
    assert "own_vid" not in b
    assert b["vid_indices"].shape == (8,)


def test_adversarial_speakers_exclude_batch(dataset):
    """The reference excludes the whole batch's own speakers (setdiff1d,
    processor_v2.py:627-630); with 2 synthetic speakers total, a batch drawn
    from one video must get the OTHER speaker."""
    from speech2affective_gestures_tpu.data import grain_loader as gl

    own = np.full(4, dataset.vid_indices[0], np.int64)
    t = gl.AdversarialSpeakers(
        np.asarray(sorted(dataset.speaker_model.word2index.values()))
    )
    batch = t.random_map({"own_vid": own}, np.random.default_rng(0))
    assert not np.isin(batch["vid_indices"], own).any()


def test_loader_shuffles_deterministically(dataset):
    a = [b["vec_seq"][0, 0, 0] for b in
         grain_loader.make_data_loader(dataset, 4, seed=1)]
    b = [x["vec_seq"][0, 0, 0] for x in
         grain_loader.make_data_loader(dataset, 4, seed=1)]
    c = [x["vec_seq"][0, 0, 0] for x in
         grain_loader.make_data_loader(dataset, 4, seed=2)]
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


@pytest.mark.slow  # compiles a full train loop/step
def test_batches_feed_train_step(dataset):
    import jax

    from speech2affective_gestures_tpu.train import builder

    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    setup = builder.init_training(
        cfg, jax.random.key(0),
        n_words=dataset.lang_model.n_words,
        n_speakers=dataset.speaker_model.n_words,
        with_trimodal=False,
    )
    loader = grain_loader.make_data_loader(dataset, batch_size=8, seed=3)
    batch = next(iter(loader))
    _, metrics = setup["train_step"](
        setup["state"], jax.device_put(batch), jax.random.key(1), gan_on=True
    )
    assert np.isfinite(float(metrics["loss"]))
