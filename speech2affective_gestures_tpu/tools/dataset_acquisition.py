"""Offline dataset-acquisition tooling (not in the training loop).

Capability parity with reference `utils/s2g_dataset_download_from_youtube.py`
and `utils/s2g_dataset_crop_frontal_intervals.py`: download Speech2Gesture
speaker videos via yt-dlp/youtube-dl and crop the annotated frontal
intervals with ffmpeg. All external binaries are probed at runtime; the
functions raise informative errors when they're unavailable (this image is
zero-egress, so these run only in a connected environment).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from os.path import join as jn


def _require(binary: str) -> str:
    path = shutil.which(binary)
    if path is None:
        raise RuntimeError(
            f"{binary} is required for dataset acquisition but was not found"
        )
    return path


def download_video(video_id: str, out_dir: str, fmt: str = "mp4") -> str:
    """Download one YouTube video (ref s2g_dataset_download_from_youtube.py)."""
    ydl = shutil.which("yt-dlp") or _require("youtube-dl")
    os.makedirs(out_dir, exist_ok=True)
    out_path = jn(out_dir, f"{video_id}.{fmt}")
    subprocess.check_call([
        ydl, "-f", f"bestvideo[ext={fmt}]+bestaudio/best",
        "--merge-output-format", fmt,
        "-o", out_path, f"https://www.youtube.com/watch?v={video_id}",
    ])
    return out_path


def download_speaker_videos(intervals, out_dir: str, pool_size: int = 4):
    """Download every unique video id in an intervals table
    ([{video_id, ...}]); sequential fallback when multiprocessing is
    unwanted."""
    from multiprocessing.pool import ThreadPool

    ids = sorted({row["video_id"] for row in intervals})
    with ThreadPool(pool_size) as pool:
        return pool.map(lambda vid: download_video(vid, out_dir), ids)


def crop_interval(video_path: str, start: float, end: float, out_path: str):
    """Crop one [start, end] interval with ffmpeg
    (ref s2g_dataset_crop_frontal_intervals.py)."""
    ffmpeg = _require("ffmpeg")
    subprocess.check_call([
        ffmpeg, "-loglevel", "panic", "-y", "-i", video_path,
        "-ss", f"{start:.3f}", "-to", f"{end:.3f}", "-c", "copy", out_path,
    ])
    return out_path


def crop_frontal_intervals(intervals, video_dir: str, out_dir: str):
    """Crop all annotated frontal intervals; rows need
    {video_id, interval_id, start_time, end_time}."""
    os.makedirs(out_dir, exist_ok=True)
    outputs = []
    for row in intervals:
        src = jn(video_dir, f"{row['video_id']}.mp4")
        dst = jn(out_dir, f"{row['video_id']}_{row['interval_id']}.mp4")
        outputs.append(
            crop_interval(src, row["start_time"], row["end_time"], dst)
        )
    return outputs


def extract_wav(video_path: str, out_path: str, sr: int = 16000):
    """Per-clip wav extraction (ref loader_v2.py:542-567)."""
    ffmpeg = _require("ffmpeg")
    subprocess.check_call([
        ffmpeg, "-loglevel", "panic", "-y", "-i", video_path,
        "-ac", "1", "-ar", str(sr), out_path,
    ])
    return out_path
