"""Real-data path: legacy pyarrow-0.14 blob reading + the export archive
round-trip (tools/export_ted_cache.py -> ted_db.load_exported_data)."""

import gzip
import importlib.util
import json
import os
import pickle

import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import legacy_arrow as la
from speech2affective_gestures_tpu.data import preprocessor as prep
from speech2affective_gestures_tpu.data import ted_db

CFG = ModelConfig()


def ted_cache_record():
    """A record shaped exactly like the reference's processed cache writes
    (utils/data_preprocessor.py:175-178)."""
    rng = np.random.default_rng(0)
    return [
        [["hello", 0.1, 0.5], ["gestures", 0.6, 1.2]],
        rng.standard_normal((43, 10, 3)).astype(np.float32),   # poses
        rng.standard_normal((43, 9, 3)).astype(np.float32),    # dir vec
        rng.standard_normal((45334,)).astype(np.float32),      # audio
        rng.standard_normal((128, 89)).astype(np.float16),     # spectrogram
        rng.standard_normal((37, 88)).astype(np.float32),      # mfcc
        {"vid": "vid_001", "start_frame_no": 10, "end_frame_no": 53,
         "start_time": 0.666, "end_time": 3.533},
    ]


# ------------------------------------------------------------ legacy blobs
@pytest.mark.parametrize("header_counts", [4, 3])
def test_legacy_roundtrip_cache_record(header_counts):
    rec = ted_cache_record()
    back = la.deserialize(la.serialize_legacy(rec, header_counts))
    assert back[0] == rec[0]
    for i in range(1, 6):
        np.testing.assert_array_equal(back[i], rec[i])
        assert back[i].dtype == rec[i].dtype
    assert back[6] == rec[6]


def test_legacy_roundtrip_raw_video_dict():
    video = {
        "vid": "youtube_abc",
        "clips": [{
            "words": [["a", 0.0, 0.2], ["b", 0.3, 0.5]],
            "skeletons_3d": np.zeros((70, 10, 3), np.float32),
            "audio_feat": np.zeros((128, 10), np.float16),
            "audio_raw": np.zeros(7000, np.float32),
            "start_frame_no": 0, "end_frame_no": 70,
            "start_time": 0.0, "end_time": 4.66,
        }],
    }
    back = la.deserialize(la.serialize_legacy(video))
    assert back["vid"] == video["vid"]
    clip = back["clips"][0]
    assert clip["words"] == video["clips"][0]["words"]
    np.testing.assert_array_equal(
        clip["skeletons_3d"], video["clips"][0]["skeletons_3d"]
    )


def test_legacy_scalar_types_and_containers():
    obj = {"s": "str", "b": b"bytes", "i": -42, "f": 2.5, "t": (1, "x"),
           "set": {1, 2}, "none": None, "bool": False,
           "nested": [{"k": [1.0, 2.0]}]}
    back = la.deserialize(la.serialize_legacy(obj))
    assert back == obj


def test_ted_db_legacy_deserialize_fallback():
    """ted_db.legacy_deserialize must decode 0.14-layout blobs with modern
    pyarrow (no .deserialize attribute)."""
    rec = ted_cache_record()
    back = ted_db.legacy_deserialize(la.serialize_legacy(rec))
    np.testing.assert_array_equal(back[2], rec[2])


def test_legacy_rejects_garbage():
    with pytest.raises((la.LegacyFormatError, Exception)):
        la.deserialize(b"\x01\x00\x00\x00garbage-not-a-stream" * 4)


# --------------------------------------------------------- export archives
def write_archive(path, level, split_records):
    os.makedirs(path, exist_ok=True)
    manifest = {"level": level, "num_mfcc": CFG.num_mfcc, "splits": {}}
    for split, records in split_records.items():
        with gzip.open(os.path.join(path, f"{split}_0000.pkl.gz"), "wb") as f:
            pickle.dump(records, f, protocol=4)
        manifest["splits"][split] = {"shards": 1, "records": len(records)}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


@pytest.fixture(scope="module")
def videos():
    return ted_db.make_synthetic_videos(n_videos=3, clip_seconds=8.0)


def test_load_exported_raw_level(tmp_path, videos):
    arch = str(tmp_path / "raw")
    write_archive(arch, "raw", {"train": videos[:2], "val": videos[2:],
                                "test": videos[2:]})
    splits = ted_db.load_exported_data(arch, CFG)
    assert set(splits) == {"train", "val", "test"}
    tr = splits["train"]
    assert tr.n_samples > 0
    assert tr.vec_seq.shape[1:] == (CFG.n_poses, 27)
    # shared word vocab across splits (ref vocab_utils.py:11-35)
    assert splits["val"].lang_model.n_words == tr.lang_model.n_words
    # npz caches are written next to the archive and reloaded
    splits2 = ted_db.load_exported_data(arch, CFG)
    assert splits2["train"].n_samples == tr.n_samples
    np.testing.assert_array_equal(splits2["train"].vec_seq, tr.vec_seq)


def test_load_exported_cache_level(tmp_path, videos):
    pre = prep.DataPreprocessor(
        n_poses=int(round(CFG.n_poses * 1.25)),
        subdivision_stride=CFG.subdivision_stride,
        pose_resampling_fps=CFG.motion_resampling_framerate,
        mean_pose=CFG.mean_pose_array.reshape(-1, 3),
        mean_dir_vec=CFG.mean_dir_vec_array,
        num_mfcc=CFG.num_mfcc,
    )
    samples = list(pre.run(videos))
    assert len(samples) > 4
    arch = str(tmp_path / "cache")
    write_archive(arch, "cache", {"train": samples, "test": samples[:4]})
    splits = ted_db.load_exported_data(arch, CFG)
    tr = splits["train"]
    assert tr.n_samples == len(samples)
    assert tr.mfcc_features.shape[1:] == (CFG.num_mfcc_combined, CFG.mfcc_length)
    # the packing must equal the direct video path given the same vocab
    direct = ted_db.build_dataset_from_samples(samples, CFG,
                                               lang_model=tr.lang_model)
    np.testing.assert_array_equal(tr.vec_seq, direct.vec_seq)
    np.testing.assert_array_equal(tr.extended_word_seq,
                                  direct.extended_word_seq)


def test_export_script_end_to_end(tmp_path, videos, monkeypatch):
    """Run the actual exporter script against a fake lmdb source, then
    ingest its archive."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_ted_cache", os.path.join(here, "tools", "export_ted_cache.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    blobs = {v["vid"]: la.serialize_legacy(v) for v in videos}

    def fake_iter(lmdb_dir, decode):
        for blob in blobs.values():
            yield decode(blob)

    monkeypatch.setattr(mod, "iter_lmdb_records", fake_iter)
    base = tmp_path / "lmdb"
    for d in ("ted_dataset_train", "ted_dataset_val", "ted_dataset_test"):
        (base / d).mkdir(parents=True)
    out = str(tmp_path / "exported")
    mod.main(["--lmdb-base", str(base), "--out", out, "--shard-size", "2"])

    manifest = ted_db.read_export_manifest(out)
    assert manifest["splits"]["train"]["records"] == len(videos)
    assert manifest["splits"]["train"]["shards"] == 2
    splits = ted_db.load_exported_data(out, CFG, load_train_val=False)
    assert splits["test"].n_samples > 0


def test_vocab_consistent_across_partial_cache(tmp_path, videos):
    """Word indices must not depend on which splits were requested first:
    a test-only ingestion followed by a full one must give train/test the
    SAME vocabulary (the shared archive-wide vocab), and stale caches packed
    with a different vocab must be invalidated."""
    arch = str(tmp_path / "raw")
    write_archive(arch, "raw", {"train": videos[:2], "test": videos[2:]})
    only_test = ted_db.load_exported_data(arch, CFG, load_train_val=False)
    full = ted_db.load_exported_data(arch, CFG)
    assert (full["test"].lang_model.word2index
            == full["train"].lang_model.word2index)
    assert (only_test["test"].lang_model.word2index
            == full["test"].lang_model.word2index)

    # a stale cache from a different vocab is detected and rebuilt
    import pickle
    stale = ted_db.Vocab("words")
    stale.index_word("completely")
    stale.index_word("different")
    vocab_pkl = os.path.join(
        arch, f"train_s2ag_tpu_packed_mfcc_{CFG.num_mfcc}_vocab.pkl"
    )
    with open(vocab_pkl, "rb") as f:
        _, speaker_model = pickle.load(f)
    with open(vocab_pkl, "wb") as f:
        pickle.dump((stale, speaker_model), f)
    rebuilt = ted_db.load_exported_data(arch, CFG)
    assert (rebuilt["train"].lang_model.word2index
            == full["train"].lang_model.word2index)


@pytest.mark.parametrize("legacy_framing", [True, False])
def test_legacy_framing_autodetect(legacy_framing):
    """Exact-framing reader handles both stream framings: pre-0.15 legacy
    (4-byte EOS, unmarked tensor messages — what genuine 0.14 blobs use)
    and continuation framing (8-byte EOS, 0xFFFFFFFF-marked messages)."""
    rec = ted_cache_record()
    blob = la.serialize_legacy(rec, legacy_framing=legacy_framing)
    back = la.deserialize(blob)
    assert back[0] == rec[0]
    for i in range(1, 6):
        np.testing.assert_array_equal(back[i], rec[i])
    assert back[6] == rec[6]


def test_legacy_missing_eos_is_loud():
    """A blob whose record-batch stream lacks the EOS marker must raise a
    LegacyFormatError (deterministic framing, not silent misparse)."""
    rec = ["x", np.arange(4.0)]
    blob = bytearray(la.serialize_legacy(rec))
    # find the 4-byte EOS (int32 0 right after the batch message) by
    # corrupting every aligned 4-byte zero word until deserialize breaks
    ok = la.deserialize(bytes(blob))
    assert ok[0] == "x"
    import struct as _s
    corrupted_somewhere = False
    for pos in range(8, len(blob) - 4, 4):
        if blob[pos:pos + 4] == b"\x00\x00\x00\x00":
            trial = bytearray(blob)
            trial[pos:pos + 4] = b"\x07\x00\x00\x07"
            try:
                la.deserialize(bytes(trial))
            except (la.LegacyFormatError, Exception):
                corrupted_somewhere = True
                break
    assert corrupted_somewhere
