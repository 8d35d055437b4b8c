"""Pose <-> direction-vector math, TPU-first.

Capability parity with reference `utils/ted_db_utils.py:50-124`
(`convert_dir_vec_to_pose`, `convert_pose_seq_to_dir_vec`,
`resample_pose_seq`, `make_audio_fixed_length`), redesigned for XLA:

- the reference's sequential per-bone FK loop becomes a single einsum with a
  precomputed (joints x bones) accumulation matrix -> one MXU matmul over
  arbitrarily batched inputs, instead of 9 dependent scatter steps;
- unit-normalization handles zero vectors like sklearn's `normalize`
  (zero rows stay zero);
- linear resampling uses gather + lerp with static output length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


@functools.lru_cache(maxsize=None)
def _fk_matrix() -> np.ndarray:
    """(NUM_JOINTS, NUM_BONES) matrix M with M[j, b] = bone_length[b] if bone
    b lies on the kinematic path from the root to joint j, else 0.

    joint_pos = dir_vec @ M^T reproduces the reference's cumulative FK
    (utils/ted_db_utils.py:81-102) exactly because pairs are topologically
    ordered (parents always precede children).
    """
    m = np.zeros((C.NUM_JOINTS, C.NUM_BONES), dtype=np.float32)
    for b, (parent, child, length) in enumerate(C.DIR_VEC_PAIRS):
        m[child] = m[parent]
        m[child, b] = length
    return m


def convert_dir_vec_to_pose(vec: jax.Array) -> jax.Array:
    """Direction vectors -> joint positions (forward kinematics).

    vec: (..., 9, 3) or (..., 27). Returns (..., 10, 3).
    """
    if vec.shape[-1] != C.COORDS:
        vec = vec.reshape(vec.shape[:-1] + (C.NUM_BONES, C.COORDS))
    m = jnp.asarray(_fk_matrix(), dtype=vec.dtype)
    # (..., 9, 3) x (10, 9) -> (..., 10, 3); a single batched matmul.
    return jnp.einsum(
        "...bc,jb->...jc", vec, m, precision=jax.lax.Precision.HIGHEST
    )


def convert_pose_seq_to_dir_vec(pose: jax.Array, eps: float = 0.0) -> jax.Array:
    """Joint positions -> unit bone direction vectors.

    pose: (..., 10, 3) or (..., 30). Returns (..., 9, 3).
    Zero-length bones map to zero vectors (sklearn `normalize` semantics,
    ref utils/ted_db_utils.py:105-124).
    """
    if pose.shape[-1] != C.COORDS:
        pose = pose.reshape(pose.shape[:-1] + (C.NUM_JOINTS, C.COORDS))
    parents = np.array([p for p, _, _ in C.DIR_VEC_PAIRS])
    children = np.array([c for _, c, _ in C.DIR_VEC_PAIRS])
    diff = pose[..., children, :] - pose[..., parents, :]
    norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    safe = jnp.where(norm > eps, norm, 1.0)
    return diff / safe


def resample_pose_seq(
    poses: jax.Array, duration_in_sec: float, fps: int
) -> jax.Array:
    """Linear-interp resampling of a pose sequence to `duration * fps` frames.

    Matches reference `utils/ted_db_utils.py:50-60`: sample positions are
    arange(0, n, n / expected_n) with linear interpolation and extrapolation
    clamped by the input's endpoints (scipy interp1d fill_value='extrapolate'
    on a linear spline extends the last segment; positions never exceed n-1
    by more than one step so we extrapolate the final segment explicitly).

    poses: (n, ...). Returns (expected_n, ...) with expected_n static.
    """
    n = poses.shape[0]
    expected_n = duration_in_sec * fps  # float, as in the reference
    x_new = np.arange(0, n, n / expected_n)
    lo = np.floor(x_new).astype(np.int32)
    hi = lo + 1
    w = (x_new - lo).astype(np.float32)
    # linear extrapolation past the last sample: use the final segment slope.
    lo_c = np.clip(lo, 0, n - 1)
    hi_c = np.clip(hi, 0, n - 1)
    seg_lo = np.where(hi > n - 1, n - 2 if n > 1 else 0, lo_c)
    seg_hi = np.where(hi > n - 1, n - 1, hi_c)
    w = np.where(hi > n - 1, x_new - seg_lo, w).astype(np.float32)
    p_lo = poses[seg_lo]
    p_hi = poses[seg_hi]
    wb = w.reshape((-1,) + (1,) * (poses.ndim - 1))
    return (p_lo * (1.0 - wb) + p_hi * wb).astype(poses.dtype)


def make_audio_fixed_length(audio: jax.Array, expected_len: int) -> jax.Array:
    """Pad (symmetric) or crop audio to a fixed length.

    Matches reference `utils/ted_db_utils.py:72-78`.
    """
    n = audio.shape[0]
    if n >= expected_len:
        return audio[:expected_len]
    return jnp.pad(audio, (0, expected_len - n), mode="symmetric")


def normalize_dir_vec(vec: jax.Array, mean_dir_vec: jax.Array) -> jax.Array:
    """Subtract the dataset mean direction vector (flattened 27-d)."""
    flat = vec.reshape(vec.shape[:-2] + (-1,)) if vec.shape[-1] == C.COORDS else vec
    return flat - mean_dir_vec.reshape(-1)


def unnormalize_dir_vec(vec: jax.Array, mean_dir_vec: jax.Array) -> jax.Array:
    flat = vec.reshape(vec.shape[:-2] + (-1,)) if vec.shape[-1] == C.COORDS else vec
    return flat + mean_dir_vec.reshape(-1)
