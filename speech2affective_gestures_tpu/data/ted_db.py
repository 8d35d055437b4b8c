"""TED Gesture DB pipeline: packed datasets, sampling, lmdb ingestion.

Capability parity with reference `loader_v2.py` (TedDBParams /
load_ted_db_data / TedDBParamsMinimal) + `processor_v2.py`'s npz RAM cache
(save_cache/load_cache :222-341) and batch samplers (yield_batch :589-638).

TPU-first design: one preprocessing pass produces **packed fixed-shape
arrays** (the exact schema of the reference's npz cache: int64 word ids,
f32 dir-vec sequences, int16 audio + per-sample max, f16 MFCC, int64
speaker ids).  Those arrays live on device; per-step batching is a jitted
gather by host-sampled indices — no per-sample Python, no H2D copies of
sample payloads in the hot loop.

lmdb+pyarrow ingestion of the original TED caches is supported when those
packages are present; everything else (including a synthetic corpus
generator for tests/benchmarks) is dependency-free.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import pickle
from typing import Iterator

import numpy as np

from .. import constants as C
from ..config import ModelConfig
from ..ops import dsp_ref
from . import preprocessor as prep
from .vocab import Vocab, build_vocab, make_speaker_vocab

try:  # optional: only needed to read the original TED lmdb caches
    import lmdb  # type: ignore
except ImportError:
    # no C binding in this environment: fall back to the pure-python
    # LMDB file-format reader (data/lmdb_lite.py) — same read API surface
    from . import lmdb_lite as lmdb  # type: ignore
try:
    import pyarrow  # type: ignore
except ImportError:
    pyarrow = None


# --------------------------------------------------------------------------
# word-sequence tensorization (ref processor_v2.py:409-441)
# --------------------------------------------------------------------------

def extend_word_seq(n_frames: int, lang: Vocab, words, aux_info: dict,
                    end_time: float | None = None,
                    remove_word_timing: bool = False) -> np.ndarray:
    """Frame-aligned word-id sequence (PAD=0 elsewhere)."""
    if end_time is None:
        end_time = aux_info["end_time"]
    frame_duration = (end_time - aux_info["start_time"]) / n_frames
    indices = np.zeros(n_frames, dtype=np.int64)
    if remove_word_timing:
        n_words = 0
        for word in words:
            idx = max(0, int(np.floor((word[1] - aux_info["start_time"]) / frame_duration)))
            if idx < n_frames:
                n_words += 1
        space = int(n_frames / (n_words + 1))
        for word_idx in range(n_words):
            idx = (word_idx + 1) * space
            indices[idx] = lang.get_word_index(words[word_idx][0])
    else:
        for word in words:
            idx = max(0, int(np.floor((word[1] - aux_info["start_time"]) / frame_duration)))
            if idx < n_frames:
                indices[idx] = lang.get_word_index(word[0])
    return indices


def words_to_tensor(lang: Vocab, words, end_time: float | None = None) -> np.ndarray:
    indexes = [lang.SOS_token]
    for word in words:
        if end_time is not None and word[1] > end_time:
            break
        indexes.append(lang.get_word_index(word[0]))
    indexes.append(lang.EOS_token)
    return np.asarray(indexes, dtype=np.int64)


def make_audio_fixed_length(audio: np.ndarray, expected_len: int) -> np.ndarray:
    n_pad = expected_len - len(audio)
    if n_pad > 0:
        return np.pad(audio, (0, n_pad), mode="symmetric")
    return audio[:expected_len]


# --------------------------------------------------------------------------
# packed dataset (the npz cache schema, processor_v2.py:278-283)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class PackedDataset:
    extended_word_seq: np.ndarray   # (N, T) int64
    vec_seq: np.ndarray             # (N, T, 27) f32
    audio: np.ndarray               # (N, L) int16 (normalized)
    audio_max: np.ndarray           # (N,) f64
    mfcc_features: np.ndarray       # (N, 37, mfcc_len) f16
    vid_indices: np.ndarray         # (N,) int64
    speaker_model: Vocab | None = None
    lang_model: Vocab | None = None
    # non-packed sidecars for the eval/rendering paths. These cover the
    # FULL extended preprocessor window (n_poses*1.25 frames and its audio
    # — the range aux_info's frame/time fields describe), unlike the packed
    # arrays which are clipped to n_poses; clip stitching depends on that.
    word_seqs: list | None = None
    aux_info: list | None = None
    pose_seqs: np.ndarray | None = None        # (N, T_ext, 10, 3)
    raw_audio: np.ndarray | None = None        # (N, L_ext) int16
    raw_audio_max: np.ndarray | None = None    # (N,)

    @property
    def n_samples(self) -> int:
        return len(self.vec_seq)

    def save_npz(self, path: str):
        extras = {}
        if self.aux_info is not None:
            extras = {
                "word_seqs": np.asarray(self.word_seqs, dtype=object),
                "aux_info": np.asarray(self.aux_info, dtype=object),
                "pose_seqs": self.pose_seqs,
                "raw_audio": self.raw_audio,
                "raw_audio_max": self.raw_audio_max,
            }
        np.savez_compressed(
            path,
            extended_word_seq=self.extended_word_seq,
            vec_seq=self.vec_seq,
            audio=self.audio,
            audio_max=self.audio_max,
            mfcc_features=self.mfcc_features,
            vid_indices=self.vid_indices,
            **extras,
        )

    @classmethod
    def load_npz(cls, path: str, speaker_model=None, lang_model=None
                 ) -> "PackedDataset":
        npz = np.load(path, allow_pickle=True)
        has_sidecars = "aux_info" in npz.files
        return cls(
            extended_word_seq=npz["extended_word_seq"],
            vec_seq=npz["vec_seq"].astype(np.float32),
            audio=npz["audio"],
            audio_max=npz["audio_max"],
            mfcc_features=npz["mfcc_features"],
            vid_indices=npz["vid_indices"],
            speaker_model=speaker_model,
            lang_model=lang_model,
            word_seqs=list(npz["word_seqs"]) if has_sidecars else None,
            aux_info=list(npz["aux_info"]) if has_sidecars else None,
            pose_seqs=npz["pose_seqs"] if has_sidecars else None,
            raw_audio=npz["raw_audio"] if has_sidecars else None,
            raw_audio_max=npz["raw_audio_max"] if has_sidecars else None,
        )


def speaker_id_pool(dataset: PackedDataset) -> np.ndarray | None:
    """All speaker ids of a split's speaker model."""
    sp = dataset.speaker_model
    return np.asarray(sorted(sp.word2index.values())) if sp is not None else None


def decode_rows(ds: PackedDataset, idx) -> dict:
    """Packed rows -> training dtypes (int16 audio rescaled by per-sample
    max, f16 MFCC promoted) — shared by every sampler/loader."""
    return {
        "extended_word_seq": ds.extended_word_seq[idx].astype(np.int32),
        "vec_seq": ds.vec_seq[idx].astype(np.float32),
        "audio": (ds.audio[idx]
                  * np.expand_dims(ds.audio_max[idx], -1) / 32767.0
                  ).astype(np.float32),
        "mfcc_features": ds.mfcc_features[idx].astype(np.float32),
    }


def sample_adversarial_speakers(all_speaker_ids: np.ndarray, own: np.ndarray,
                                rng: np.random.Generator, size: int) -> np.ndarray:
    """Random speakers excluding every id in `own` (the reference excludes
    the whole batch's ids via setdiff1d, processor_v2.py:627-630)."""
    pool = np.setdiff1d(all_speaker_ids, own)
    if len(pool) == 0:
        pool = all_speaker_ids
    return rng.choice(pool, size=size)


class BatchSampler:
    """Random-with-replacement batches + adversarial speaker ids
    (ref yield_batch, processor_v2.py:589-638: vid_indices fed to the
    generator are random speakers *different from* each sample's own)."""

    def __init__(self, dataset: PackedDataset, batch_size: int, seed: int = 1234):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.all_speaker_ids = speaker_id_pool(dataset)

    def pseudo_passes(self) -> int:
        return (self.ds.n_samples + self.batch_size - 1) // self.batch_size

    def sample_indices(self) -> np.ndarray:
        return self.rng.integers(0, self.ds.n_samples, self.batch_size)

    def adversarial_speakers(self, own: np.ndarray) -> np.ndarray:
        return sample_adversarial_speakers(
            self.all_speaker_ids, own, self.rng, self.batch_size
        )

    def __iter__(self) -> Iterator[dict]:
        for _ in range(self.pseudo_passes()):
            idx = self.sample_indices()
            batch = decode_rows(self.ds, idx)
            if self.all_speaker_ids is not None:
                batch["vid_indices"] = self.adversarial_speakers(
                    self.ds.vid_indices[idx]
                ).astype(np.int32)
            yield batch


class DeviceDataset:
    """Packed arrays resident on device with a jitted batch gather.

    The reference re-uploads every batch from host RAM
    (yield_batch, processor_v2.py:602-621). Here the whole split lives in
    HBM once (audio as int16, MFCC as f16 — the reference's own compact
    dtypes) and a compiled gather assembles each batch on device; the host
    only supplies the (B,) index vector per step.

    With `mesh`, the packed arrays are replicated across the mesh so the
    scanned-epoch program can gather under data parallelism: with the
    index vector sharded over 'data', each device gathers only its own
    batch rows from its local replica — the batch comes out sharded over
    'data' with zero collectives in the gather.
    """

    def __init__(self, dataset: PackedDataset, include_audio: bool = True,
                 mesh=None):
        import jax
        import jax.numpy as jnp

        self.ds = dataset
        self.include_audio = include_audio
        self.mesh = mesh
        arrays = {
            "extended_word_seq": dataset.extended_word_seq.astype(np.int32),
            "vec_seq": dataset.vec_seq.astype(np.float32),
            "mfcc_features": dataset.mfcc_features,  # f16 in HBM
        }
        if include_audio:
            arrays["audio"] = dataset.audio  # int16 in HBM
            arrays["audio_max"] = dataset.audio_max.astype(np.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            self.arrays = {k: jax.device_put(jnp.asarray(v), rep)
                           for k, v in arrays.items()}
        else:
            self.arrays = {k: jax.device_put(jnp.asarray(v))
                           for k, v in arrays.items()}

        def gather(arrays, idx, adv_vids):
            batch = {
                "extended_word_seq": arrays["extended_word_seq"][idx],
                "vec_seq": arrays["vec_seq"][idx],
                "mfcc_features": arrays["mfcc_features"][idx].astype(jnp.float32),
                "vid_indices": adv_vids,
            }
            if "audio" in arrays:
                batch["audio"] = (
                    arrays["audio"][idx].astype(jnp.float32)
                    * arrays["audio_max"][idx, None] / 32767.0
                )
            return batch

        # raw (unjitted) gather: the trainer's K-steps-per-program scan
        # inlines it inside the epoch program so the batch never exists as
        # a standalone device buffer between gather and step
        self.gather_fn = gather
        self._gather = jax.jit(gather)

    def batch(self, idx: np.ndarray, adv_vids: np.ndarray) -> dict:
        import jax.numpy as jnp

        return self._gather(self.arrays, jnp.asarray(idx, jnp.int32),
                            jnp.asarray(adv_vids, jnp.int32))


class DeviceBatchSampler(BatchSampler):
    """BatchSampler whose payload gather runs on device (host supplies only
    indices + adversarial speaker ids)."""

    def __init__(self, dataset: PackedDataset, batch_size: int, seed: int = 1234,
                 device_dataset: DeviceDataset | None = None,
                 include_audio: bool = True):
        super().__init__(dataset, batch_size, seed)
        self.device_ds = device_dataset or DeviceDataset(dataset, include_audio)

    def __iter__(self) -> Iterator[dict]:
        for _ in range(self.pseudo_passes()):
            idx = self.sample_indices()
            adv = self.adversarial_speakers(self.ds.vid_indices[idx])
            yield self.device_ds.batch(idx, adv)


# --------------------------------------------------------------------------
# sample records -> packed arrays (ref save_cache, processor_v2.py:273-341)
# --------------------------------------------------------------------------

def pack_samples(samples: list, cfg: ModelConfig, lang_model: Vocab,
                 speaker_model: Vocab,
                 keep_sidecars: bool = False,
                 remove_word_timing: bool = False) -> PackedDataset:
    n = len(samples)
    t = cfg.n_poses
    audio_len = cfg.expected_audio_length
    mfcc_len = cfg.mfcc_length

    # sidecars keep the FULL extended preprocessor window (the range the
    # aux_info frame/time fields describe), so clip stitching stays aligned
    t_ext = int(round(t * 1.25)) if keep_sidecars else 0
    audio_ext = int(t_ext / cfg.motion_resampling_framerate * C.AUDIO_SR)

    out = PackedDataset(
        extended_word_seq=np.zeros((n, t), np.int64),
        vec_seq=np.zeros((n, t, C.POSE_DIM), np.float32),
        audio=np.zeros((n, audio_len), np.int16),
        audio_max=np.zeros(n),
        mfcc_features=np.zeros((n, cfg.num_mfcc_combined, mfcc_len), np.float16),
        vid_indices=np.zeros(n, np.int64),
        speaker_model=speaker_model,
        lang_model=lang_model,
        word_seqs=[] if keep_sidecars else None,
        aux_info=[] if keep_sidecars else None,
        pose_seqs=np.zeros((n, t_ext, C.NUM_JOINTS, 3), np.float32)
        if keep_sidecars else None,
        raw_audio=np.zeros((n, audio_ext), np.int16) if keep_sidecars else None,
        raw_audio_max=np.zeros(n) if keep_sidecars else None,
    )
    for k, rec in enumerate(samples):
        word_seq, pose_seq, vec_seq, audio, _spec, mfcc, aux = rec
        duration = aux["end_time"] - aux["start_time"]
        amax = np.max(np.abs(audio))
        out.audio_max[k] = amax
        sample_end_time = aux["start_time"] + duration * t / len(vec_seq)
        clipped_audio = make_audio_fixed_length(audio, audio_len)
        out.extended_word_seq[k] = extend_word_seq(
            t, lang_model, word_seq, aux, sample_end_time,
            remove_word_timing=remove_word_timing,
        )
        out.vec_seq[k] = vec_seq[:t].reshape(t, -1)
        out.audio[k] = np.int16(clipped_audio / max(amax, 1e-12) * 32767)
        out.mfcc_features[k] = mfcc[:, :mfcc_len]
        out.vid_indices[k] = speaker_model.word2index[aux["vid"]]
        if keep_sidecars:
            out.word_seqs.append(word_seq)
            out.aux_info.append(aux)
            full = pose_seq.reshape(len(pose_seq), C.NUM_JOINTS, 3)
            out.pose_seqs[k, : min(len(full), t_ext)] = full[:t_ext]
            full_audio = make_audio_fixed_length(np.asarray(audio), audio_ext)
            out.raw_audio_max[k] = amax
            out.raw_audio[k] = np.int16(full_audio / max(amax, 1e-12) * 32767)
    return out


def build_dataset_from_samples(samples, cfg: ModelConfig,
                               lang_model: Vocab | None = None,
                               keep_sidecars: bool = False) -> PackedDataset:
    """Preprocessed sample records (the reference cache-lmdb schema
    [words, poses, dir_vec, audio, spectrogram, mfcc, aux],
    utils/data_preprocessor.py:175-178) -> packed arrays."""
    samples = list(samples)
    if lang_model is None:
        lang_model = build_vocab(
            "words", ([w[0] for w in rec[0]] for rec in samples),
            feat_dim=cfg.wordembed_dim, word_vec_path=cfg.wordembed_path,
        )
    speaker_model = make_speaker_vocab(sorted({rec[6]["vid"] for rec in samples}))
    return pack_samples(
        samples, cfg, lang_model, speaker_model, keep_sidecars,
        # reference: remove_word_timing = (input_context == 'text'),
        # loader_v2.py:596-606
        remove_word_timing=(cfg.input_context == "text"),
    )


def build_dataset_from_videos(videos, cfg: ModelConfig,
                              lang_model: Vocab | None = None,
                              keep_sidecars: bool = False) -> PackedDataset:
    """videos (raw schema) -> windows -> filter -> packed arrays."""
    pre = prep.DataPreprocessor(
        n_poses=int(round(cfg.n_poses * 1.25)),  # margin, ref loader_v2.py:496
        subdivision_stride=cfg.subdivision_stride,
        pose_resampling_fps=cfg.motion_resampling_framerate,
        mean_pose=cfg.mean_pose_array.reshape(-1, 3),
        mean_dir_vec=cfg.mean_dir_vec_array,
        num_mfcc=cfg.num_mfcc,
    )
    return build_dataset_from_samples(
        pre.run(videos), cfg, lang_model, keep_sidecars
    )


# --------------------------------------------------------------------------
# synthetic corpus (tests / benches; no TED download required)
# --------------------------------------------------------------------------

_WORDS = ("the quick brown fox jumps over lazy dog while speaking about "
          "gesture motion hands arms speech emotion data model train").split()


def make_synthetic_videos(n_videos: int = 3, clip_seconds: float = 12.0,
                          fps: int = 15, seed: int = 0) -> list[dict]:
    """Raw-schema videos with plausible skeleton geometry (upright spine,
    moving wrists) that *passes* the motion filter, plus sine-mix audio."""
    rng = np.random.default_rng(seed)
    videos = []
    for v in range(n_videos):
        n_frames = int(clip_seconds * fps)
        t = np.linspace(0, clip_seconds, n_frames)[:, None]
        base = C.MEAN_POSE.reshape(-1, 3)[None].repeat(n_frames, 0)
        wobble = 0.12 * np.sin(2 * np.pi * (0.3 + 0.1 * v) * t + rng.uniform(0, 6))
        skel = base.copy()
        for j in (5, 6, 8, 9):  # elbows + wrists move
            skel[:, j, 0] += wobble[:, 0] * (1 + 0.2 * j)
            skel[:, j, 1] += 0.08 * np.cos(2 * np.pi * 0.5 * t[:, 0] + j)
        skel += rng.normal(0, 0.004, skel.shape)

        n_audio = int(clip_seconds * C.AUDIO_SR)
        ta = np.arange(n_audio) / C.AUDIO_SR
        audio = (0.4 * np.sin(2 * np.pi * (160 + 15 * v) * ta)
                 + 0.1 * rng.standard_normal(n_audio)).astype(np.float32)
        spec = dsp_ref.extract_mel_spectrogram(audio)

        words, tw = [], 0.05
        while tw < clip_seconds - 0.4:
            dur = rng.uniform(0.2, 0.5)
            words.append([str(rng.choice(_WORDS)), tw, tw + dur])
            tw += dur + rng.uniform(0.02, 0.2)

        videos.append({
            "vid": f"synthetic_vid_{v}",
            "clips": [{
                "skeletons_3d": skel,
                "audio_feat": spec,
                "audio_raw": audio,
                "words": words,
                "start_frame_no": 0,
                "end_frame_no": n_frames,
                "start_time": 0.0,
                "end_time": clip_seconds,
            }],
        })
    return videos


def make_synthetic_pose_windows(n_videos: int, clip_seconds: float,
                                cfg, seed: int = 0,
                                shuffle: bool = True) -> np.ndarray:
    """Pose-ONLY synthetic windows `(N, n_poses, 27)` — normalized dir-vecs,
    windowed like the preprocessor but skipping audio/MFCC entirely, so a
    large corpus costs <1 s. Used where only the pose distribution matters
    (FGD embedding-net training, metric self-checks): the full
    `build_dataset_from_videos` pipeline pays a per-window MFCC that makes
    512+ windows prohibitively slow on a 1-core host. Shuffles across
    videos by default so contiguous slices are iid (split halves of an
    UNshuffled corpus differ systematically by source video)."""
    from .preprocessor import _pose_seq_to_dir_vec_np

    mean_dir_vec = np.asarray(cfg.mean_dir_vec_array, np.float32).reshape(1, -1, 3)
    wins = []
    for v in make_synthetic_videos(n_videos=n_videos,
                                   clip_seconds=clip_seconds, seed=seed):
        skel = np.asarray(v["clips"][0]["skeletons_3d"])  # already 15 fps
        dv = (_pose_seq_to_dir_vec_np(skel) - mean_dir_vec).reshape(len(skel), -1)
        for s in range(0, len(skel) - cfg.n_poses + 1, cfg.subdivision_stride):
            wins.append(dv[s:s + cfg.n_poses])
    out = np.asarray(wins, np.float32)
    if shuffle:
        out = out[np.random.default_rng(seed).permutation(len(out))]
    return out


# --------------------------------------------------------------------------
# original TED lmdb ingestion (gated on lmdb + pyarrow)
# --------------------------------------------------------------------------

def legacy_deserialize(value: bytes):
    """Decode one pyarrow-0.14 ``serialize`` blob with whatever this
    environment offers: pyarrow.deserialize when pyarrow<2 is installed,
    otherwise the pure-python legacy reader (data/legacy_arrow.py) — which
    also covers environments with no pyarrow at all."""
    if pyarrow is not None and hasattr(pyarrow, "deserialize"):
        return pyarrow.deserialize(value)
    from . import legacy_arrow

    return legacy_arrow.deserialize(value)


def iter_lmdb_videos(lmdb_dir: str) -> Iterator[dict]:
    """Stream raw-schema videos from the original TED lmdb.

    The TED caches were written with pyarrow 0.14's legacy serialize API
    (reference utils/data_preprocessor.py:175-178); decoded by
    legacy_deserialize, which works with ANY modern pyarrow or none at
    all (legacy_arrow), just as the lmdb import falls back to the
    pure-python lmdb_lite reader — no native dependency required."""
    env = lmdb.open(lmdb_dir, readonly=True, lock=False)
    with env.begin(write=False) as txn:
        for _key, value in txn.cursor():
            yield legacy_deserialize(value)
    env.close()


def load_ted_db_data(base_path: str, cfg: ModelConfig,
                     load_train_val: bool = True,
                     cache_dir: str | None = None):
    """Three packed splits (+ shared word vocab), mirroring
    loader_v2.load_ted_db_data(:585-639). Packed caches are stored as
    <split>.npz next to the lmdb dirs."""
    splits = {}
    paths = {
        "train": cfg.train_data_path,
        "val": cfg.val_data_path,
        "test": cfg.test_data_path,
    }
    wanted = ["train", "val", "test"] if load_train_val else ["test"]

    def cache_path(split):
        lmdb_dir = os.path.join(base_path, paths[split])
        return lmdb_dir, os.path.join(
            cache_dir or os.path.dirname(lmdb_dir),
            f"{split}_s2ag_tpu_packed_mfcc_{cfg.num_mfcc}.npz",
        )

    # the word vocabulary spans ALL splits (reference build_vocab over
    # train+val+test, loader_v2.py:619-625 / vocab_utils.py:11-35) —
    # index every split's raw words before packing any of them
    lang_model = None
    if any(not os.path.exists(cache_path(s)[1]) for s in wanted):
        def all_words():
            for split in wanted:
                lmdb_dir, _ = cache_path(split)
                for video in iter_lmdb_videos(lmdb_dir):
                    for clip in video["clips"]:
                        yield [w[0] for w in clip["words"]]

        lang_model = build_vocab(
            "words", all_words(), feat_dim=cfg.wordembed_dim,
            word_vec_path=cfg.wordembed_path,
        )

    for split in wanted:
        lmdb_dir, cache = cache_path(split)
        vocab_cache = cache.replace(".npz", "_vocab.pkl")
        if os.path.exists(cache):
            with open(vocab_cache, "rb") as f:
                cached_lang, speaker_model = pickle.load(f)
            lang_model = lang_model or cached_lang
            splits[split] = PackedDataset.load_npz(
                cache, speaker_model=speaker_model, lang_model=cached_lang
            )
        else:
            ds = build_dataset_from_videos(
                iter_lmdb_videos(lmdb_dir), cfg, lang_model=lang_model,
                keep_sidecars=(split == "test"),
            )
            ds.save_npz(cache)
            with open(vocab_cache, "wb") as f:
                pickle.dump((ds.lang_model, ds.speaker_model), f)
            splits[split] = ds
    return splits


# --------------------------------------------------------------------------
# exported-archive ingestion (tools/export_ted_cache.py output): lmdb-free
# --------------------------------------------------------------------------

EXPORT_MANIFEST = "manifest.json"


def read_export_manifest(exported_dir: str) -> dict:
    import json

    with open(os.path.join(exported_dir, EXPORT_MANIFEST)) as f:
        return json.load(f)


def iter_exported_records(exported_dir: str, split: str) -> Iterator:
    """Stream records (raw video dicts or preprocessed sample lists) from a
    tools/export_ted_cache.py archive: gzip'd pickle shards + manifest."""
    import gzip

    manifest = read_export_manifest(exported_dir)
    info = manifest["splits"][split]
    for shard in range(info["shards"]):
        path = os.path.join(exported_dir, f"{split}_{shard:04d}.pkl.gz")
        with gzip.open(path, "rb") as f:
            yield from pickle.load(f)


def load_exported_data(exported_dir: str, cfg: ModelConfig,
                       load_train_val: bool = True,
                       cache_dir: str | None = None):
    """Three packed splits from an exported archive — the modern-environment
    replacement for the reference's lmdb ingestion (two-command recipe:
    tools/export_ted_cache.py in any env with lmdb, then this). Handles both
    export levels: 'raw' (video dicts -> full preprocessing) and 'cache'
    (the reference's already-windowed sample records -> packing only)."""
    manifest = read_export_manifest(exported_dir)
    level = manifest.get("level", "raw")
    wanted = [s for s in
              (["train", "val", "test"] if load_train_val else ["test"])
              if s in manifest["splits"]]
    out_dir = cache_dir or exported_dir
    os.makedirs(out_dir, exist_ok=True)

    def cache_path(split):
        return os.path.join(
            out_dir, f"{split}_s2ag_tpu_packed_mfcc_{cfg.num_mfcc}.npz"
        )

    def split_words(split):
        if level == "raw":
            for video in iter_exported_records(exported_dir, split):
                for clip in video["clips"]:
                    yield [w[0] for w in clip["words"]]
        else:
            for rec in iter_exported_records(exported_dir, split):
                yield [w[0] for w in rec[0]]

    # ONE shared word vocab for the whole archive, built over ALL manifest
    # splits (not just the wanted subset) so word indices never depend on
    # which splits a given invocation asked for, and persisted next to the
    # packed caches (ref vocab_utils.py:11-35 also shares one vocab across
    # the three lmdb splits). Split caches packed with a different vocab
    # are invalidated and rebuilt.
    all_splits = sorted(manifest["splits"])
    lang_model = None
    # the cache key must cover the EMBEDDING config too: build_vocab's
    # pickle cache returns whatever was stored, so a file keyed only on
    # num_mfcc would silently serve stale word vectors after the user
    # changes wordembed_dim / wordembed_path
    import hashlib

    embed_tag = hashlib.sha1(
        f"{cfg.wordembed_dim}|{cfg.wordembed_path or ''}".encode()
    ).hexdigest()[:8]
    shared_vocab_cache = os.path.join(
        out_dir,
        f"s2ag_tpu_shared_vocab_mfcc_{cfg.num_mfcc}_e{embed_tag}.pkl",
    )

    def get_lang_model():
        nonlocal lang_model
        if lang_model is None:
            lang_model = build_vocab(
                "words", (ws for s in all_splits for ws in split_words(s)),
                cache_path=shared_vocab_cache,
                feat_dim=cfg.wordembed_dim, word_vec_path=cfg.wordembed_path,
            )
        return lang_model

    get_lang_model()

    splits = {}
    for split in wanted:
        cache = cache_path(split)
        vocab_cache = cache.replace(".npz", "_vocab.pkl")
        if os.path.exists(cache):
            with open(vocab_cache, "rb") as f:
                cached_lang, speaker_model = pickle.load(f)
            if cached_lang.word2index != lang_model.word2index:
                logging.warning(
                    "packed cache %s was built with a different word vocab "
                    "(%d words vs shared %d) — rebuilding split %r",
                    cache, cached_lang.n_words, lang_model.n_words, split,
                )
                os.remove(cache)
            else:
                splits[split] = PackedDataset.load_npz(
                    cache, speaker_model=speaker_model, lang_model=cached_lang
                )
                continue
        records = iter_exported_records(exported_dir, split)
        build = (build_dataset_from_videos if level == "raw"
                 else build_dataset_from_samples)
        ds = build(records, cfg, lang_model=lang_model,
                   keep_sidecars=(split == "test"))
        ds.save_npz(cache)
        with open(vocab_cache, "wb") as f:
            pickle.dump((ds.lang_model, ds.speaker_model), f)
        splits[split] = ds
    return splits
