"""Procedural Blender render scene (blender/pose_render.py).

Blender itself isn't in this image; the scene's *math* — data->world
mapping, bone cylinder placement, clip loading from the generation pkl
schema — is bpy-free by design and tested here. Reference artifact being
replaced: the binary blender/poseRender.blend (inventory row 43).
"""

import importlib.util
import os
import pickle

import numpy as np
import pytest

_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "blender", "pose_render.py")
spec = importlib.util.spec_from_file_location("pose_render", _path)
pose_render = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pose_render)

from speech2affective_gestures_tpu import constants as C


def _quat_rotate(q, v):
    """Rotate v by quaternion q (wxyz)."""
    w, x, y, z = q
    u = np.array([x, y, z])
    return (2 * np.dot(u, v) * u
            + (w * w - np.dot(u, u)) * np.asarray(v, float)
            + 2 * w * np.cross(u, v))


def test_topology_matches_constants():
    assert pose_render.DIR_VEC_PAIRS == C.DIR_VEC_PAIRS
    assert pose_render.NUM_JOINTS == C.NUM_JOINTS


def test_bone_transform_aligns_z_to_bone():
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        center, length, q = pose_render.bone_transform(a, b)
        np.testing.assert_allclose(center, (a + b) / 2)
        np.testing.assert_allclose(length, np.linalg.norm(b - a))
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-12)
        # the cylinder's +Z axis lands on the bone direction
        d = (b - a) / np.linalg.norm(b - a)
        np.testing.assert_allclose(_quat_rotate(q, [0, 0, 1]), d, atol=1e-9)


def test_bone_transform_degenerate_axes():
    # +Z: identity; -Z: half-turn; zero-length: identity + length 0
    _, _, q_up = pose_render.bone_transform([0, 0, 0], [0, 0, 2.0])
    np.testing.assert_allclose(q_up, [1, 0, 0, 0])
    _, _, q_down = pose_render.bone_transform([0, 0, 0], [0, 0, -2.0])
    np.testing.assert_allclose(_quat_rotate(q_down, [0, 0, 1]), [0, 0, -1],
                               atol=1e-12)
    c, l, q0 = pose_render.bone_transform([1, 1, 1], [1, 1, 1])
    assert l == 0.0
    np.testing.assert_allclose(q0, [1, 0, 0, 0])


def test_data_to_world_is_rigid_and_upright():
    p = np.array([[1.0, 2.0, 3.0]])
    w = pose_render.data_to_world(p)
    np.testing.assert_allclose(w, [[1.0, -3.0, 2.0]])
    # rigid: pairwise distances preserved
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(8, 3))
    wpts = pose_render.data_to_world(pts)
    d0 = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    d1 = np.linalg.norm(wpts[:, None] - wpts[None], axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_frame_transforms_shapes():
    rng = np.random.default_rng(2)
    joints = rng.normal(size=(C.NUM_JOINTS, 3))
    locs, centers, lengths, quats = pose_render.frame_transforms(joints)
    assert locs.shape == (10, 3)
    assert centers.shape == (9, 3)
    assert lengths.shape == (9,)
    assert quats.shape == (9, 4)
    # each bone's center is the midpoint of its joints
    for i, (pa, ch, _l) in enumerate(C.DIR_VEC_PAIRS):
        np.testing.assert_allclose(centers[i], (joints[pa] + joints[ch]) / 2)


def test_load_clip_pkl_roundtrip(tmp_path):
    from speech2affective_gestures_tpu.render.video import save_generation_pkl

    rng = np.random.default_rng(3)
    frames = 12
    out_dir_vec = rng.normal(size=(frames, 27)).astype(np.float32)
    out_poses = rng.normal(size=(frames, 10, 3)).astype(np.float32)
    human_dir_vec = rng.normal(size=(frames, 27)).astype(np.float32)
    audio = rng.normal(size=(1600,)).astype(np.float32)
    path = save_generation_pkl(str(tmp_path), "clip", "s2ag", "hello world",
                               audio, out_dir_vec, out_poses, human_dir_vec,
                               "aux")
    clip = pose_render.load_clip(path)
    assert clip["poses"].shape == (frames, 10, 3)
    np.testing.assert_allclose(
        clip["poses"], pose_render.data_to_world(out_poses))
    np.testing.assert_allclose(clip["audio"], audio)

    # which=human: FK from the dir vectors (cumulative bone sums rooted at 0)
    human = pose_render.load_clip(path, which="human")
    vec = human_dir_vec.reshape(frames, 9, 3)
    expect = np.zeros((frames, 10, 3), np.float32)
    for i, (pa, ch, _l) in enumerate(C.DIR_VEC_PAIRS):
        expect[:, ch] = expect[:, pa] + vec[:, i]
    np.testing.assert_allclose(human["poses"],
                               pose_render.data_to_world(expect), atol=1e-6)

    with pytest.raises(ValueError):
        pose_render.load_clip(path, which="nope")


def test_wav_writer(tmp_path):
    import wave

    audio = np.sin(np.linspace(0, 40, 3200)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    pose_render._write_wav(path, audio, 16000)
    with wave.open(path) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getnframes() == 3200
        pcm = np.frombuffer(w.readframes(3200), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, np.clip(audio, -1, 1),
                               atol=1e-4)
