"""Offline dataset-acquisition tooling: command construction + error paths.

The external binaries (yt-dlp/youtube-dl, ffmpeg) are absent in this
zero-egress image, so these tests pin the COMMAND LINES the module would
execute (monkeypatched `shutil.which` + `subprocess.check_call`) and the
informative failure when a binary is missing. Reference behavior being
reproduced: utils/s2g_dataset_download_from_youtube.py,
utils/s2g_dataset_crop_frontal_intervals.py, loader_v2.py:542-567 (wav
extraction).
"""

import os

import pytest

from speech2affective_gestures_tpu.tools import dataset_acquisition as da


@pytest.fixture()
def recorded(monkeypatch):
    calls = []
    monkeypatch.setattr(da.shutil, "which", lambda b: f"/usr/bin/{b}")
    monkeypatch.setattr(
        da.subprocess, "check_call", lambda cmd, **kw: calls.append(cmd)
    )
    return calls


def test_download_video_command(recorded, tmp_path):
    out = da.download_video("abc123", str(tmp_path))
    assert out == os.path.join(str(tmp_path), "abc123.mp4")
    (cmd,) = recorded
    assert cmd[0].endswith("yt-dlp")
    assert "https://www.youtube.com/watch?v=abc123" in cmd
    assert "mp4" in " ".join(cmd)


def test_download_speaker_videos_dedups_ids(recorded, tmp_path):
    intervals = [{"video_id": "v1"}, {"video_id": "v2"}, {"video_id": "v1"}]
    outs = da.download_speaker_videos(intervals, str(tmp_path), pool_size=2)
    assert len(outs) == 2  # unique ids only
    urls = {c[-1] for c in recorded}
    assert urls == {
        "https://www.youtube.com/watch?v=v1",
        "https://www.youtube.com/watch?v=v2",
    }


def test_crop_frontal_intervals_commands(recorded, tmp_path):
    intervals = [
        {"video_id": "v1", "interval_id": 7,
         "start_time": 1.25, "end_time": 3.5},
    ]
    outs = da.crop_frontal_intervals(intervals, "vids", str(tmp_path))
    assert outs == [os.path.join(str(tmp_path), "v1_7.mp4")]
    (cmd,) = recorded
    i = cmd.index("-ss")
    assert cmd[i + 1] == "1.250"
    j = cmd.index("-to")
    assert cmd[j + 1] == "3.500"
    assert os.path.join("vids", "v1.mp4") in cmd
    assert "copy" in cmd  # stream copy, no re-encode


def test_extract_wav_is_mono_16k(recorded, tmp_path):
    out = da.extract_wav("clip.mp4", str(tmp_path / "a.wav"))
    (cmd,) = recorded
    assert cmd[cmd.index("-ac") + 1] == "1"
    assert cmd[cmd.index("-ar") + 1] == "16000"
    assert out.endswith("a.wav")


def test_missing_binary_raises_informative(monkeypatch):
    monkeypatch.setattr(da.shutil, "which", lambda b: None)
    with pytest.raises(RuntimeError, match="youtube-dl is required"):
        da.download_video("x", "/tmp/nowhere")
    with pytest.raises(RuntimeError, match="ffmpeg is required"):
        da.crop_interval("a.mp4", 0.0, 1.0, "b.mp4")
