"""Mocap processing toolkit — the used subset of the vendored PyMO package.

Capability parity with the reference's `utils/pymo/` (vendored BVH toolkit,
imported by utils/common.py:13-16; not in the v2 train loop): a MocapData
container, BVH parse/write built on `render.bvh`, and the common
transformations of `pymo.preprocessing` — parameterization to
euler/quaternion/expmap/world-position, joint selection, mirroring,
root-relative transforms, temporal downsampling and array conversion
(Numpyfier). Implemented functionally on numpy/jnp rather than as sklearn
transformers; each function maps 1:1 onto a PyMO class.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import quaternions as Q
from . import bvh as bvh_mod


@dataclasses.dataclass
class MocapData:
    """Skeleton + per-frame channel data (pymo.data.MocapData)."""

    joint_names: list[str]
    parents: np.ndarray          # (J,)
    offsets: np.ndarray          # (J, 3)
    rotations: np.ndarray        # (L, J, 4) quaternions (w, x, y, z)
    root_positions: np.ndarray   # (L, 3)
    framerate: float

    @property
    def n_frames(self) -> int:
        return len(self.rotations)

    def clone(self) -> "MocapData":
        return MocapData(
            list(self.joint_names), self.parents.copy(), self.offsets.copy(),
            self.rotations.copy(), self.root_positions.copy(), self.framerate,
        )


def parse_bvh(path: str) -> MocapData:
    """pymo.parsers.BVHParser equivalent."""
    names, parents, offsets, world_pos, quats, fps = bvh_mod.load_bvh(path)
    return MocapData(
        joint_names=names, parents=np.asarray(parents),
        offsets=np.asarray(offsets), rotations=np.asarray(quats),
        root_positions=np.asarray(world_pos[:, 0]), framerate=fps,
    )


def write_bvh(data: MocapData, out_dir: str, frame_time: float | None = None):
    """pymo.writers.BVHWriter equivalent."""
    positions = np.zeros((data.n_frames, len(data.joint_names), 3))
    positions[:, 0] = data.root_positions
    return bvh_mod.save_as_bvh(
        {
            "joint_names": data.joint_names,
            "joint_parents": list(data.parents),
            "joint_offsets": data.offsets,
            "positions": positions,
            "rotations": data.rotations,
        },
        out_dir,
        include_default_pose=False,
        frame_time=frame_time or 1.0 / data.framerate,
    )


# --- parameterizations (pymo.preprocessing.MocapParameterizer) -------------

def to_euler(data: MocapData, order: str = "zyx") -> np.ndarray:
    """(L, J, 3) Euler angles in radians."""
    return np.asarray(Q.qeuler(jnp.asarray(data.rotations), order=order))


def to_expmap(data: MocapData) -> np.ndarray:
    """(L, J, 3) exponential-map rotations."""
    q = data.rotations
    w = np.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * np.arccos(w)
    sin_half = np.sqrt(np.maximum(1.0 - w * w, 1e-12))
    axis = q[..., 1:] / sin_half[..., None]
    return axis * angle[..., None]


def from_expmap(expmap: np.ndarray) -> np.ndarray:
    return np.asarray(Q.expmap_to_quaternion(jnp.asarray(expmap)))


def to_positions(data: MocapData) -> np.ndarray:
    """(L, J, 3) world joint positions via batched FK."""
    return bvh_mod.forward_kinematics(
        data.rotations[None].astype(np.float32),
        data.root_positions[None].astype(np.float32),
        list(data.parents), data.offsets.astype(np.float32),
    )[0]


# --- structural transforms -------------------------------------------------

def select_joints(data: MocapData, keep: list[str]) -> MocapData:
    """pymo JointSelector: keep the named joints (plus any ancestors needed
    to keep the hierarchy connected)."""
    keep_idx = set()
    name_to_idx = {n: i for i, n in enumerate(data.joint_names)}
    for name in keep:
        j = name_to_idx[name]
        while j != -1 and j not in keep_idx:
            keep_idx.add(j)
            j = data.parents[j]
    old_order = sorted(keep_idx)
    remap = {old: new for new, old in enumerate(old_order)}
    new_parents = np.array([
        remap[data.parents[j]] if data.parents[j] in remap else -1
        for j in old_order
    ])
    return MocapData(
        joint_names=[data.joint_names[j] for j in old_order],
        parents=new_parents,
        offsets=data.offsets[old_order],
        rotations=data.rotations[:, old_order],
        root_positions=data.root_positions,
        framerate=data.framerate,
    )


def mirror(data: MocapData, axis: str = "X",
           left_prefix: str = "Left", right_prefix: str = "Right") -> MocapData:
    """pymo Mirror: flip across an axis and swap left/right joints."""
    ai = {"X": 0, "Y": 1, "Z": 2}[axis]
    out = data.clone()
    swap = list(range(len(data.joint_names)))
    for i, name in enumerate(data.joint_names):
        if name.startswith(left_prefix):
            twin = right_prefix + name[len(left_prefix):]
        elif name.startswith(right_prefix):
            twin = left_prefix + name[len(right_prefix):]
        else:
            continue
        if twin in data.joint_names:
            swap[i] = data.joint_names.index(twin)
    out.rotations = out.rotations[:, swap].copy()
    out.offsets = out.offsets[swap].copy()
    out.offsets[:, ai] *= -1
    # negate the mirrored rotation components: w and the mirror axis stay
    comp = [1 + k for k in range(3) if k != ai]
    out.rotations[..., comp] *= -1
    out.root_positions = out.root_positions.copy()
    out.root_positions[:, ai] *= -1
    return out


def root_relative(data: MocapData) -> MocapData:
    """pymo RootTransformer('pos_rot_deltas' light variant): zero the root
    trajectory, keeping motion root-relative."""
    out = data.clone()
    out.root_positions = out.root_positions - out.root_positions[0:1]
    return out


def downsample(data: MocapData, factor: int) -> MocapData:
    """pymo DownSampler: keep every `factor`-th frame."""
    out = data.clone()
    out.rotations = out.rotations[::factor]
    out.root_positions = out.root_positions[::factor]
    out.framerate = data.framerate / factor
    return out


def numpyfy(data: MocapData) -> np.ndarray:
    """pymo Numpyfier: flat (L, 3 + J*4) array [root_pos | quats]."""
    l, j, _ = data.rotations.shape
    return np.concatenate(
        [data.root_positions, data.rotations.reshape(l, j * 4)], axis=1
    )


# --------------------------------------------------------------------------
# foot-contact features (pymo.features, utils/pymo/features.py:12-33)
# --------------------------------------------------------------------------

def peak_indexes(y: np.ndarray, thres: float = 0.3,
                 min_dist: int = 1) -> np.ndarray:
    """Local-maxima indices with a normalized threshold and minimum
    separation — the peakutils.indexes semantics the reference's
    features.py relies on (peakutils is not vendored; reimplemented):
    peaks are strict local maxima above thres*(max-min)+min, and when two
    peaks fall within min_dist of each other only the higher survives."""
    y = np.asarray(y, float)
    if len(y) < 3:
        return np.array([], int)
    floor = thres * (y.max() - y.min()) + y.min()
    rising = y[1:-1] > y[:-2]
    falling = y[1:-1] > y[2:]
    candidates = np.where(rising & falling & (y[1:-1] > floor))[0] + 1
    if min_dist > 1 and len(candidates) > 1:
        keep = np.ones(len(candidates), bool)
        order = np.argsort(-y[candidates])  # highest first
        for rank in order:
            if not keep[rank]:
                continue
            too_close = np.abs(candidates - candidates[rank]) < min_dist
            too_close[rank] = False
            keep &= ~too_close
        candidates = np.sort(candidates[keep])
    return candidates


def foot_contact_idxs(signal: np.ndarray, t: float = 0.02,
                      min_dist: int = 120):
    """[up_idxs, down_idxs] of a foot-height signal
    (features.get_foot_contact_idxs, :12-16)."""
    signal = np.asarray(signal, float)
    up = peak_indexes(signal, thres=t / signal.max(), min_dist=min_dist)
    down = peak_indexes(-signal, thres=t / signal.min(), min_dist=min_dist)
    return [up, down]


def foot_contact_signal(signal: np.ndarray, start: int = 1, t: float = 0.02,
                        min_dist: int = 120) -> list:
    """Binary contact track: 0 after a down-peak, 1 after an up-peak
    (features.create_foot_contact_signal, :19-33). Accepts a plain 1-D
    height signal (the reference pulls it from a pandas track)."""
    signal = np.asarray(signal, float)
    up, down = foot_contact_idxs(signal, t, min_dist)
    up_set, down_set = set(up.tolist()), set(down.tolist())
    out, c = [], start
    for f in range(len(signal)):
        if f in down_set:
            c = 0
        elif f in up_set:
            c = 1
        out.append(c)
    return out


def plot_foot_up_down(signal: np.ndarray, t: float = 0.02,
                      min_dist: int = 120, ax=None):
    """features.plot_foot_up_down (:35-42) on a matplotlib axis."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    signal = np.asarray(signal, float)
    up, down = foot_contact_idxs(signal, t, min_dist)
    ax = ax or plt.gca()
    frames = np.arange(len(signal))
    ax.plot(frames, signal)
    ax.plot(frames[up], signal[up], "ro")
    ax.plot(frames[down], signal[down], "go")
    return ax
