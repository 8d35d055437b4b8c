"""Pose math vs straightforward per-bone loops (reference semantics of
utils/ted_db_utils.py:50-124)."""

import numpy as np
import jax.numpy as jnp

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.ops import pose


def _loop_fk(vec):
    """Sequential FK exactly as the reference writes it."""
    vec = vec.reshape(vec.shape[:-1] + (-1, 3)) if vec.shape[-1] != 3 else vec
    out = np.zeros(vec.shape[:-2] + (10, 3))
    for j, (parent, child, length) in enumerate(C.DIR_VEC_PAIRS):
        out[..., child, :] = out[..., parent, :] + length * vec[..., j, :]
    return out


def test_fk_matches_sequential_loop(rng):
    vec = rng.standard_normal((4, 34, 9, 3)).astype(np.float32)
    got = np.asarray(pose.convert_dir_vec_to_pose(jnp.asarray(vec)))
    np.testing.assert_allclose(got, _loop_fk(vec), rtol=1e-5, atol=1e-5)


def test_fk_accepts_flat_27(rng):
    vec = rng.standard_normal((2, 34, 27)).astype(np.float32)
    got = np.asarray(pose.convert_dir_vec_to_pose(jnp.asarray(vec)))
    assert got.shape == (2, 34, 10, 3)
    np.testing.assert_allclose(got, _loop_fk(vec), rtol=1e-5, atol=1e-5)


def test_pose_to_dir_vec_unit_norm(rng):
    p = rng.standard_normal((3, 34, 10, 3)).astype(np.float32)
    v = np.asarray(pose.convert_pose_seq_to_dir_vec(jnp.asarray(p)))
    assert v.shape == (3, 34, 9, 3)
    norms = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_pose_dirvec_roundtrip(rng):
    vec = rng.standard_normal((5, 9, 3)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    p = pose.convert_dir_vec_to_pose(jnp.asarray(vec))
    back = np.asarray(pose.convert_pose_seq_to_dir_vec(p))
    np.testing.assert_allclose(back, vec, rtol=1e-4, atol=1e-5)


def test_zero_bone_stays_zero():
    p = np.zeros((1, 10, 3), np.float32)  # degenerate pose
    v = np.asarray(pose.convert_pose_seq_to_dir_vec(jnp.asarray(p)))
    assert np.all(v == 0.0)


def test_resample_matches_scipy_interp1d(rng):
    from scipy.interpolate import interp1d

    poses = rng.standard_normal((50, 27)).astype(np.float32)
    duration, fps = 50 / 20.0, 15
    got = np.asarray(pose.resample_pose_seq(jnp.asarray(poses), duration, fps))

    n = len(poses)
    f = interp1d(np.arange(n), poses, axis=0, kind="linear", fill_value="extrapolate")
    expected_n = duration * fps
    x_new = np.arange(0, n, n / expected_n)
    want = f(x_new).astype(np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_make_audio_fixed_length():
    a = np.arange(10.0, dtype=np.float32)
    short = np.asarray(pose.make_audio_fixed_length(jnp.asarray(a), 14))
    want = np.pad(a, (0, 4), mode="symmetric")
    np.testing.assert_array_equal(short, want)
    long = np.asarray(pose.make_audio_fixed_length(jnp.asarray(a), 6))
    np.testing.assert_array_equal(long, a[:6])
