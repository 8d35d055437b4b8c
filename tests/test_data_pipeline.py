"""Data pipeline end-to-end on a synthetic corpus."""

import numpy as np
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import motion_filter, ted_db
from speech2affective_gestures_tpu.data.vocab import Vocab, make_speaker_vocab

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

CFG = ModelConfig()


@pytest.fixture(scope="module")
def dataset():
    videos = ted_db.make_synthetic_videos(n_videos=3, clip_seconds=10.0)
    return ted_db.build_dataset_from_videos(videos, CFG, keep_sidecars=True)


def test_vocab_basics():
    v = Vocab("test")
    assert v.n_words == 4  # PAD/SOS/EOS/UNK
    v.index_word("hello")
    v.index_word("hello")
    assert v.get_word_index("hello") == 4
    assert v.get_word_index("bogus") == Vocab.UNK_token
    assert v.word2count["hello"] == 2
    v.load_word_vectors(None, 16)
    assert v.word_embedding_weights.shape == (5, 16)


def test_speaker_vocab_no_default_tokens():
    sp = make_speaker_vocab(["vidA", "vidB"])
    assert sp.n_words == 3  # <UNK> + 2 vids
    assert "vidA" in sp.word2index


def test_motion_filter_rules():
    # near-mean pose is rejected
    mean_pose = C.MEAN_POSE.reshape(-1, 3)
    still = np.repeat(mean_pose[None], 40, axis=0)
    _, msg = motion_filter.filter_motion(still, mean_pose)
    assert msg == "pose"
    # bent spine rejected
    bent = still + 0.1
    bent[:, 1] = bent[:, 0] + np.array([1.0, 0.0, 0.0])  # horizontal spine
    _, msg = motion_filter.filter_motion(bent, mean_pose)
    assert msg == "spine angle"


def test_packed_dataset_schema(dataset):
    ds = dataset
    assert ds.n_samples > 10
    t = CFG.n_poses
    assert ds.extended_word_seq.shape == (ds.n_samples, t)
    assert ds.vec_seq.shape == (ds.n_samples, t, C.POSE_DIM)
    assert ds.audio.shape == (ds.n_samples, CFG.expected_audio_length)
    assert ds.audio.dtype == np.int16
    assert ds.mfcc_features.shape == (ds.n_samples, 37, CFG.mfcc_length)
    assert ds.mfcc_features.dtype == np.float16
    # dir vecs are mean-normalized unit vectors
    un = ds.vec_seq.reshape(-1, 9, 3) + CFG.mean_dir_vec_array.reshape(9, 3)
    norms = np.linalg.norm(un, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # word ids within vocab
    assert ds.extended_word_seq.max() < ds.lang_model.n_words
    # speakers mapped
    assert set(np.unique(ds.vid_indices)) <= set(ds.speaker_model.word2index.values())


def test_batch_sampler_adversarial_speakers(dataset):
    sampler = ted_db.BatchSampler(dataset, batch_size=16, seed=0)
    batch = next(iter(sampler))
    assert batch["vec_seq"].shape == (16, CFG.n_poses, C.POSE_DIM)
    assert batch["audio"].dtype == np.float32
    # audio reconstructed to original scale (|x| <= audio_max)
    assert np.abs(batch["audio"]).max() <= dataset.audio_max.max() + 1e-3
    # adversarial ids differ from every sampled row's own id set
    own = dataset.vid_indices
    assert not np.isin(batch["vid_indices"], np.unique(own[:0])).any()  # sanity


def test_npz_roundtrip(tmp_path, dataset):
    p = str(tmp_path / "train.npz")
    dataset.save_npz(p)
    back = ted_db.PackedDataset.load_npz(p)
    np.testing.assert_array_equal(back.vec_seq, dataset.vec_seq)
    np.testing.assert_array_equal(back.audio, dataset.audio)


def test_extend_word_seq_onsets():
    lang = Vocab("w")
    for w in ("alpha", "beta"):
        lang.index_word(w)
    aux = {"start_time": 0.0, "end_time": 2.0}
    words = [["alpha", 0.1, 0.4], ["beta", 1.0, 1.4]]
    seq = ted_db.extend_word_seq(20, lang, words, aux)
    # frame_duration = 0.1; onsets at frames 1 and 10
    assert seq[1] == lang.get_word_index("alpha")
    assert seq[10] == lang.get_word_index("beta")
    assert (seq != 0).sum() == 2


def test_words_to_tensor_sos_eos():
    lang = Vocab("w")
    lang.index_word("x")
    out = ted_db.words_to_tensor(lang, [["x", 0.0, 0.5]], end_time=1.0)
    assert out[0] == Vocab.SOS_token and out[-1] == Vocab.EOS_token
