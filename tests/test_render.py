"""Rendering layer: BVH roundtrip + video writer smoke test."""

import os

import numpy as np
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.render import bvh, video


def _toy_animation(n_frames=6):
    names = ["Hips", "Spine", "Head", "LeftArm"]
    parents = [-1, 0, 1, 1]
    offsets = np.array([
        [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.5, 0.0], [0.5, 0.0, 0.0],
    ])
    rng = np.random.default_rng(0)
    angles = rng.uniform(-0.4, 0.4, (n_frames, len(names), 3))
    quats = bvh.from_euler(angles, "xyz")
    trajectory = np.cumsum(rng.normal(0, 0.01, (n_frames, 3)), axis=0)
    positions = np.zeros((n_frames, len(names), 3))
    positions[:, 0] = trajectory
    return {
        "joint_names": names,
        "joint_parents": parents,
        "joint_offsets": offsets,
        "positions": positions,
        "rotations": quats,
    }


def test_bvh_write_then_load_roundtrip(tmp_path):
    anim = _toy_animation()
    out = bvh.save_as_bvh(anim, str(tmp_path), include_default_pose=False)
    assert os.path.exists(out)
    names, parents, offsets, world_pos, quats, fps = bvh.load_bvh(out)
    assert names == anim["joint_names"]
    np.testing.assert_array_equal(parents, anim["joint_parents"])
    np.testing.assert_allclose(offsets, anim["joint_offsets"], atol=1e-5)
    # world positions agree with FK of the original animation
    want = bvh.forward_kinematics(
        anim["rotations"][None].astype(np.float32),
        anim["positions"][None, :, 0].astype(np.float32),
        anim["joint_parents"],
        anim["joint_offsets"].astype(np.float32),
    )[0]
    np.testing.assert_allclose(world_pos, want, atol=1e-3)


def test_fk_chain():
    # identity rotations: child = parent + offset
    parents = [-1, 0, 1]
    offsets = np.array([[0, 0, 0], [0, 1, 0], [0, 1, 0]], np.float32)
    quats = np.zeros((1, 2, 3, 4), np.float32)
    quats[..., 0] = 1.0
    roots = np.zeros((1, 2, 3), np.float32)
    pos = bvh.forward_kinematics(quats, roots, parents, offsets)
    np.testing.assert_allclose(pos[0, 0, 2], [0, 2, 0], atol=1e-6)


def test_create_video_and_save(tmp_path, rng):
    frames = 8
    out = rng.standard_normal((frames, C.POSE_DIM)).astype(np.float32) * 0.05
    tri = rng.standard_normal((frames, C.POSE_DIM)).astype(np.float32) * 0.05
    target = rng.standard_normal((frames, C.POSE_DIM)).astype(np.float32) * 0.05
    audio = (0.2 * np.sin(np.arange(8000) / 20)).astype(np.float32)
    result = video.create_video_and_save(
        str(tmp_path), 0, "testclip", 0, target, tri, out,
        C.MEAN_DIR_VEC, "hello world test", audio=audio,
        delete_audio_file=False,
    )
    assert os.path.exists(result["video_path"])
    assert result["audio_path"] and os.path.exists(result["audio_path"])
    assert result["output_poses"].shape == (frames, C.NUM_JOINTS, 3)


def test_save_generation_pkl(tmp_path, rng):
    out_vec = rng.standard_normal((10, C.POSE_DIM)).astype(np.float32)
    path = video.save_generation_pkl(
        str(tmp_path), "clip", "s2ag", "hi", np.zeros(100, np.float32),
        out_vec, out_vec, out_vec, "aux",
    )
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    assert blob["sentence"] == "hi"
    np.testing.assert_array_equal(blob["out_dir_vec"], out_vec)
