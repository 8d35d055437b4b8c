"""Long-clip evaluation: stitch test windows into clips, synthesize with both
generators, render videos / dump pickles.

Capability parity with reference `generate_gestures_by_dataset` +
`render_clip` (processor_v2.py:1144-1567):

- ted_db path: walk the test split in storage order and merge contiguous
  windows of the same video (frame ranges touching) into full clips
  (:1458-1522);
- genea_challenge_2020 path: wav + BVH (render/bvh.load_bvh) + JSON
  transcript triples (:1524-1564);
- render_clip: resample poses -> target dir-vecs, windowed autoregressive
  synthesis for the s2ag generator (MFCC) and the frozen trimodal baseline
  (raw wav), crossfade/fade-out, 3-panel video, *_trimodal.pkl/_s2ag.pkl.

The per-window loops run as compiled scans (train/synthesis.py).
"""

from __future__ import annotations

import json
import os
import time
from os.path import join as jn

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import ModelConfig
from ..data.preprocessor import resample_pose_seq
from ..data.ted_db import PackedDataset
from ..ops import pose as pose_ops
from ..render import bvh as bvh_mod
from ..render import video as video_mod
from . import synthesis

GENEA_JOINTS_TO_KEEP = [0, 4, 6, 7, 9, 10, 11, 28, 29, 30]


def stitch_test_clips(ds: PackedDataset):
    """Merge contiguous same-video windows into full clips
    (ref processor_v2.py:1495-1522). Requires sidecars (keep_sidecars=True).
    Yields dicts {vid, poses (F,J,3), audio (L,), words, time (t0, t1)}.
    """
    assert ds.aux_info is not None and ds.pose_seqs is not None, (
        "stitching requires a dataset built with keep_sidecars=True"
    )
    current = None
    for k in range(ds.n_samples):
        aux = ds.aux_info[k]
        # sidecars cover the FULL extended window that aux's frame/time
        # ranges describe (the packed arrays are clipped to n_poses)
        poses = ds.pose_seqs[k]
        audio = (ds.raw_audio[k].astype(np.float32)
                 * ds.raw_audio_max[k] / 32767.0)
        words = [list(w) for w in ds.word_seqs[k]]
        frames = [aux["start_frame_no"], aux["end_frame_no"]]
        times = [aux["start_time"], aux["end_time"]]

        if (current is None or aux["vid"] != current["vid"]
                or frames[0] - 1 > current["frames"][1]):
            if current is not None:
                yield current
            current = {
                "vid": aux["vid"], "poses": poses, "audio": audio,
                "words": words, "frames": frames, "time": times,
            }
        else:
            frame_idx_last = frames[0] - current["frames"][0]
            current["poses"] = np.concatenate(
                [current["poses"][:frame_idx_last], poses], axis=0
            )
            cut = int((times[0] - current["time"][0]) * C.AUDIO_SR)
            current["audio"] = np.concatenate([current["audio"][:cut], audio])
            for word in words:
                if word not in current["words"]:
                    current["words"].append(word)
            current["frames"][1] = frames[1]
            current["time"][1] = times[1]
    if current is not None:
        yield current


class ClipRenderer:
    """Holds the compiled window scans for both generators."""

    def __init__(self, trainer, cfg: ModelConfig | None = None):
        self.trainer = trainer
        self.cfg = cfg or trainer.cfg
        # abl_audio's generator consumes raw waveform windows, not MFCC
        self._use_mfcc = getattr(trainer, "variant", "s2ag") != "abl_audio"
        self._s2ag_scan = synthesis.make_window_scan(
            trainer.gen.apply, self.cfg, use_mfcc=self._use_mfcc
        )
        self._tri_scan = (
            synthesis.make_window_scan(trainer.tri.apply, self.cfg, use_mfcc=False)
            if trainer.state.tri_params is not None else None
        )
        # batched multi-clip programs, compiled lazily on first use
        self._s2ag_batched = None
        self._tri_batched = None

    def _gen_vars(self):
        s = self.trainer.state
        return {"params": s.gen_params, "batch_stats": s.gen_stats}

    def _tri_vars(self):
        s = self.trainer.state
        return {"params": s.tri_params, "batch_stats": s.tri_stats}

    def render_clip(self, vid_name: str, clip_poses: np.ndarray,
                    clip_audio: np.ndarray, sample_rate: int, clip_words,
                    clip_time, speaker_vid_idx: int = 0,
                    clip_duration_range=(5, 30), check_duration: bool = True,
                    fade_out: bool = False, make_video: bool = False,
                    save_pkl: bool = False, save_path: str = "render",
                    rng=None):
        """ref render_clip (processor_v2.py:1144-1439)."""
        cfg = self.cfg
        mean_dir_vec = cfg.mean_dir_vec_array
        duration = clip_time[1] - clip_time[0]
        if check_duration and not (
            clip_duration_range[0] <= duration <= clip_duration_range[1]
        ):
            return None, None, None

        clip_poses_resampled = resample_pose_seq(
            clip_poses, duration, cfg.motion_resampling_framerate
        )
        target_dir_vec = np.asarray(pose_ops.convert_pose_seq_to_dir_vec(
            jnp.asarray(clip_poses_resampled)
        )).reshape(len(clip_poses_resampled), -1) - mean_dir_vec

        # make word timings clip-relative (ref :1169-1171)
        words = [[w[0], w[1] - clip_time[0], w[2] - clip_time[0]]
                 for w in clip_words]
        seed = target_dir_vec[: cfg.n_pre_poses]
        rng = rng if rng is not None else jax.random.key(0)
        r1, r2 = jax.random.split(rng)

        lang = (self.trainer.test_data.lang_model
                if self.trainer.test_data is not None else None)
        out_dir_vec = synthesis.synthesize_clip(
            self.trainer.gen.apply, self._gen_vars(), clip_audio, words, lang,
            cfg, vid_idx=speaker_vid_idx, seed_dir_vec=seed, rng=r1,
            sample_rate=sample_rate, fade_out=fade_out,
            use_mfcc=self._use_mfcc, scan_fn=self._s2ag_scan,
        )
        out_dir_vec_trimodal = None
        if self._tri_scan is not None:
            out_dir_vec_trimodal = synthesis.synthesize_clip(
                self.trainer.tri.apply, self._tri_vars(), clip_audio, words,
                lang, cfg, vid_idx=speaker_vid_idx, seed_dir_vec=seed, rng=r2,
                sample_rate=sample_rate, fade_out=fade_out, use_mfcc=False,
                scan_fn=self._tri_scan,
            )

        if fade_out:
            # the reference also polyfit-smooths the TARGET stream over the
            # fade region (processor_v2.py:1359-1389)
            _, _, end_padding = synthesis.prepare_window_inputs(
                clip_audio, words, lang, cfg, sample_rate
            )
            start_f, end_f = synthesis.fade_frame_range(
                len(out_dir_vec), end_padding, cfg, sample_rate
            )
            if 0 <= start_f and end_f <= len(target_dir_vec):
                target_dir_vec = synthesis.polyfit_smooth(
                    target_dir_vec.copy(), start_f, end_f
                )

        prefix = f"{vid_name}_s{speaker_vid_idx}_{clip_time[0]:.2f}_{clip_time[1]:.2f}"
        sentence = " ".join(w[0] for w in clip_words)

        if make_video:
            video_mod.create_video_and_save(
                save_path, 0, prefix, 0, target_dir_vec,
                out_dir_vec_trimodal if out_dir_vec_trimodal is not None
                else np.zeros_like(out_dir_vec),
                out_dir_vec, mean_dir_vec, sentence,
                audio=clip_audio, clipping_to_shortest_stream=True,
                delete_audio_file=False,
            )

        out_poses = np.asarray(pose_ops.convert_dir_vec_to_pose(
            jnp.asarray(out_dir_vec + mean_dir_vec)
        ))
        out_poses_trimodal = None
        if out_dir_vec_trimodal is not None:
            out_poses_trimodal = np.asarray(pose_ops.convert_dir_vec_to_pose(
                jnp.asarray(out_dir_vec_trimodal + mean_dir_vec)
            ))

        if save_pkl:
            if out_dir_vec_trimodal is not None:
                video_mod.save_generation_pkl(
                    save_path, prefix, "trimodal", sentence, clip_audio,
                    out_dir_vec_trimodal + mean_dir_vec, out_poses_trimodal,
                    target_dir_vec + mean_dir_vec,
                    f"{vid_name}_{speaker_vid_idx}_0",
                )
            video_mod.save_generation_pkl(
                save_path, prefix, "s2ag", sentence, clip_audio,
                out_dir_vec + mean_dir_vec, out_poses,
                target_dir_vec + mean_dir_vec,
                f"{vid_name}_{speaker_vid_idx}_0",
            )
        return clip_poses_resampled, out_poses_trimodal, out_poses

    def render_clips_batched(self, clip_specs, fade_out: bool = False,
                             save_pkl: bool = False,
                             save_path: str = "render"):
        """Synthesize MANY clips in one device program per generator.

        The reference's generate_gestures_by_dataset loop (and render_clip
        above) runs each clip's window scan at generator batch 1; here the
        whole clip set runs through synthesis.make_batched_clip_fn — S
        sequential scan steps of ONE batch-B generator forward each — so
        dataset-wide evaluation scales with the chip, not the clip count.

        clip_specs: list of dicts with keys vid_name, clip_poses,
        clip_audio (at C.AUDIO_SR), clip_words, clip_time,
        speaker_vid_idx, rng. Returns a list of (clip_poses_resampled,
        out_poses_trimodal, out_poses) in input order — the same tuple
        render_clip returns (video rendering stays on the per-clip path).
        """
        cfg = self.cfg
        mean_dir_vec = cfg.mean_dir_vec_array
        lang = (self.trainer.test_data.lang_model
                if self.trainer.test_data is not None else None)
        if not clip_specs:
            return []

        prepped = []
        for spec in clip_specs:
            duration = spec["clip_time"][1] - spec["clip_time"][0]
            resampled = resample_pose_seq(
                spec["clip_poses"], duration, cfg.motion_resampling_framerate
            )
            target_dir_vec = np.asarray(pose_ops.convert_pose_seq_to_dir_vec(
                jnp.asarray(resampled)
            )).reshape(len(resampled), -1) - mean_dir_vec
            words = [[w[0], w[1] - spec["clip_time"][0],
                      w[2] - spec["clip_time"][0]] for w in spec["clip_words"]]
            r1, r2 = jax.random.split(
                spec["rng"] if spec.get("rng") is not None else jax.random.key(0)
            )
            prepped.append({
                "resampled": resampled, "target": target_dir_vec,
                "words": words, "seed": target_dir_vec[: cfg.n_pre_poses],
                "r1": r1, "r2": r2,
            })

        if self._s2ag_batched is None:
            self._s2ag_batched = synthesis.make_batched_clip_fn(
                self.trainer.gen.apply, cfg, use_mfcc=self._use_mfcc
            )
        triples = [
            (spec["clip_audio"], p["words"], spec["speaker_vid_idx"])
            for spec, p in zip(clip_specs, prepped)
        ]
        seeds = [p["seed"] for p in prepped]
        s2ag_out = synthesis.synthesize_clips_batched(
            self._s2ag_batched, self._gen_vars(), triples, lang, cfg,
            fade_out=fade_out, seeds=seeds,
            keys=jnp.stack([p["r1"] for p in prepped]),
        )

        tri_out = [None] * len(clip_specs)
        if self.trainer.state.tri_params is not None:
            if self._tri_batched is None:
                self._tri_batched = synthesis.make_batched_clip_fn(
                    self.trainer.tri.apply, cfg, use_mfcc=False
                )
            tri_out = synthesis.synthesize_clips_batched(
                self._tri_batched, self._tri_vars(), triples, lang, cfg,
                fade_out=fade_out, seeds=seeds,
                keys=jnp.stack([p["r2"] for p in prepped]),
            )

        results = []
        for spec, p, s2ag, tri in zip(clip_specs, prepped, s2ag_out, tri_out):
            out_dir_vec, out_poses = s2ag
            target_dir_vec = p["target"]
            if fade_out:
                _, _, end_padding = synthesis.prepare_window_inputs(
                    spec["clip_audio"], p["words"], lang, cfg
                )
                start_f, end_f = synthesis.fade_frame_range(
                    len(out_dir_vec), end_padding, cfg
                )
                if 0 <= start_f and end_f <= len(target_dir_vec):
                    target_dir_vec = synthesis.polyfit_smooth(
                        target_dir_vec.copy(), start_f, end_f
                    )
            out_poses_trimodal = None if tri is None else tri[1]
            if save_pkl:
                prefix = (f"{spec['vid_name']}_s{spec['speaker_vid_idx']}_"
                          f"{spec['clip_time'][0]:.2f}_{spec['clip_time'][1]:.2f}")
                sentence = " ".join(w[0] for w in spec["clip_words"])
                if tri is not None:
                    video_mod.save_generation_pkl(
                        save_path, prefix, "trimodal", sentence,
                        spec["clip_audio"], tri[0] + mean_dir_vec, tri[1],
                        target_dir_vec + mean_dir_vec,
                        f"{spec['vid_name']}_{spec['speaker_vid_idx']}_0",
                    )
                video_mod.save_generation_pkl(
                    save_path, prefix, "s2ag", sentence, spec["clip_audio"],
                    out_dir_vec + mean_dir_vec, out_poses,
                    target_dir_vec + mean_dir_vec,
                    f"{spec['vid_name']}_{spec['speaker_vid_idx']}_0",
                )
            results.append((p["resampled"], out_poses_trimodal, out_poses))
        return results


def generate_gestures_by_dataset(
    trainer, dataset: str = "ted_db", data_params: dict | None = None,
    check_duration: bool = True, samples=None, randomized: bool = True,
    fade_out: bool = False, make_video: bool = False, save_pkl: bool = False,
    save_path: str = "render", seed: int = 0, batched: bool = False,
):
    """ref processor_v2.py:1441-1567.

    batched=True (ted_db, no video): synthesize ALL clips in one device
    program per generator via ClipRenderer.render_clips_batched — same
    speaker/rng draw sequence as the per-clip loop, so results line up.
    """
    data_params = dict(data_params or {})
    renderer = ClipRenderer(trainer)
    rng = np.random.default_rng(seed)
    results = []
    start = time.time()

    if dataset.lower() == "ted_db":
        data_params.setdefault("clip_duration_range", [5, 12])
        if batched and make_video:
            raise ValueError(
                "batched dataset generation does not render videos; use "
                "batched=False for the video path"
            )
        n_speakers = (
            trainer.test_data.speaker_model.n_words
            if trainer.test_data.speaker_model else 1
        )
        batch_specs = []
        for clip in stitch_test_clips(trainer.test_data):
            # reference filter semantics: keep clips whose vid appears as a
            # substring of any requested sample prefix (processor_v2.py:1486)
            if samples is not None and not any(
                clip["vid"] in s for s in samples
            ):
                continue
            vid_idx = int(rng.integers(0, n_speakers)) if randomized else 0
            clip_rng = jax.random.key(int(rng.integers(1 << 31)))
            if batched:
                duration = clip["time"][1] - clip["time"][0]
                lo, hi = data_params["clip_duration_range"]
                if check_duration and not (lo <= duration <= hi):
                    continue
                batch_specs.append({
                    "vid_name": clip["vid"], "clip_poses": clip["poses"],
                    "clip_audio": clip["audio"],
                    "clip_words": clip["words"], "clip_time": clip["time"],
                    "speaker_vid_idx": vid_idx, "rng": clip_rng,
                })
                continue
            res = renderer.render_clip(
                clip["vid"], clip["poses"], clip["audio"], C.AUDIO_SR,
                clip["words"], clip["time"], speaker_vid_idx=vid_idx,
                clip_duration_range=data_params["clip_duration_range"],
                check_duration=check_duration, fade_out=fade_out,
                make_video=make_video, save_pkl=save_pkl,
                save_path=save_path,
                rng=clip_rng,
            )
            if res[0] is not None:
                results.append((clip["vid"], res))
        if batched and batch_specs:
            batch_results = renderer.render_clips_batched(
                batch_specs, fade_out=fade_out, save_pkl=save_pkl,
                save_path=save_path,
            )
            results.extend(
                (spec["vid_name"], res)
                for spec, res in zip(batch_specs, batch_results)
            )
    elif dataset.lower() == "genea_challenge_2020":
        if batched and make_video:
            raise ValueError(
                "batched dataset generation does not render videos; use "
                "batched=False for the video path"
            )
        data_path = data_params["data_path"]
        file_names = sorted(
            ".wav".join(f.split(".wav")[:-1])
            for f in os.listdir(jn(data_path, "audio"))
        )
        batch_specs = []
        for f in file_names:
            audio = _load_wav_16k(jn(data_path, "audio", f + ".wav"))
            _, _, _, joint_positions, _, frame_rate = bvh_mod.load_bvh(
                jn(data_path, "bvh_raw", f + ".bvh")
            )
            # scale to [-1, 1] by decade bounds (ref :1536-1543)
            jmax = np.power(10.0, np.ceil(np.log10(np.max(joint_positions))))
            jmin = np.min(joint_positions)
            jmin = 0.0 if jmin >= 0 else -np.power(
                10.0, np.ceil(np.log10(np.abs(jmin)))
            )
            scaled = 2.0 * (joint_positions - jmin) / (jmax - jmin) - 1.0
            with open(jn(data_path, "transcripts", f + ".json")) as jf:
                transcript = []
                for jd in json.load(jf):
                    for w in jd["alternatives"][0]["words"]:
                        transcript.append([
                            w["word"], float(w["start_time"][:-1]),
                            float(w["end_time"][:-1]),
                        ])
            clip_time = [0.0, len(joint_positions) / np.round(frame_rate)]
            vid_idx = int(rng.integers(0, 100)) if randomized else 0
            if batched:
                duration = clip_time[1] - clip_time[0]
                lo, hi = data_params.get("clip_duration_range", (5, 30))
                if check_duration and not (lo <= duration <= hi):
                    continue
                batch_specs.append({
                    "vid_name": f,
                    "clip_poses": scaled[:, GENEA_JOINTS_TO_KEEP],
                    "clip_audio": audio, "clip_words": transcript,
                    "clip_time": clip_time, "speaker_vid_idx": vid_idx,
                    "rng": jax.random.key(0),
                })
                continue
            res = renderer.render_clip(
                f, scaled[:, GENEA_JOINTS_TO_KEEP], audio, C.AUDIO_SR,
                transcript, clip_time, speaker_vid_idx=vid_idx,
                check_duration=check_duration, fade_out=fade_out,
                make_video=make_video, save_pkl=save_pkl, save_path=save_path,
            )
            results.append((f, res))
        if batched and batch_specs:
            batch_results = renderer.render_clips_batched(
                batch_specs, fade_out=fade_out, save_pkl=save_pkl,
                save_path=save_path,
            )
            results.extend(
                (spec["vid_name"], res)
                for spec, res in zip(batch_specs, batch_results)
            )
    else:
        raise ValueError(f"unknown dataset {dataset!r}")

    trainer.logger.print_log(
        f"generate_gestures_by_dataset: {len(results)} clips in "
        f"{time.time() - start:.2f}s"
    )
    return results


def _load_wav_16k(path: str) -> np.ndarray:
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    data = data.mean(axis=1) if data.ndim > 1 else data.astype(np.float32)
    if sr != C.AUDIO_SR:
        data = resample_poly(data, C.AUDIO_SR, sr).astype(np.float32)
    return data
