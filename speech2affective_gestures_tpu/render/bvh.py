"""BVH motion-capture I/O and forward kinematics.

Capability parity with reference `utils/mocap_dataset.py` (MoCapDataset):
- `load_bvh`: regex BVH parser -> (names, parents, offsets, world positions,
  sign-continuous quaternions, fps), used by the GENEA test path
  (processor_v2.py:1534-1535);
- `forward_kinematics`: batched quaternion FK — jnp instead of the
  reference's `.cuda()` torch loop (utils/mocap_dataset.py:36-68);
- `save_as_bvh`: hierarchy writer with 6-channel root.

Quaternion conventions follow utils/Quaternions.py (w,x,y,z; euler formulas
identical to ops.quaternions.qeuler).
"""

from __future__ import annotations

import os
import re

import jax.numpy as jnp
import numpy as np

from ..ops import quaternions as Q


def from_euler(es: np.ndarray, order: str, world: bool = False) -> np.ndarray:
    """Euler angles (radians), columns in `order`'s axis order -> quaternion.
    Matches Quaternions.from_euler (utils/Quaternions.py:499-511)."""
    axes = {"x": 0, "y": 1, "z": 2}

    def axis_quat(angle, axis_name):
        q = np.zeros(angle.shape + (4,))
        q[..., 0] = np.cos(angle / 2)
        q[..., 1 + axes[axis_name]] = np.sin(angle / 2)
        return q

    q0 = axis_quat(es[..., 0], order[0])
    q1 = axis_quat(es[..., 1], order[1])
    q2 = axis_quat(es[..., 2], order[2])
    qmul = lambda a, b: np.asarray(Q.qmul(jnp.asarray(a), jnp.asarray(b)))
    return qmul(q2, qmul(q1, q0)) if world else qmul(q0, qmul(q1, q2))


def forward_kinematics(rotations, root_positions, parents, offsets) -> np.ndarray:
    """Batched FK: rotations (N, L, J, 4), root_positions (N, L, 3),
    offsets (J, 3) -> world joint positions (N, L, J, 3)."""
    rotations = jnp.asarray(rotations)
    root_positions = jnp.asarray(root_positions)
    offsets = jnp.asarray(offsets, rotations.dtype)
    n, l, j, _ = rotations.shape

    positions = [None] * j
    world_rots = [None] * j
    for i in range(j):
        if parents[i] == -1:
            positions[i] = root_positions
            world_rots[i] = rotations[:, :, 0]
        else:
            off = jnp.broadcast_to(offsets[i], (n, l, 3))
            positions[i] = Q.qrot(world_rots[parents[i]], off) + positions[parents[i]]
            world_rots[i] = Q.qmul(world_rots[parents[i]], rotations[:, :, i])
    return np.asarray(jnp.stack(positions, axis=2))


def load_bvh(file_name: str, channel_map=None, start=None, end=None,
             order=None, world=False):
    """Parse a BVH file (ref utils/mocap_dataset.py:70-227)."""
    if channel_map is None:
        channel_map = {"Xrotation": "x", "Yrotation": "y", "Zrotation": "z"}

    names: list[str] = []
    offsets = np.zeros((0, 3))
    parents = np.array([], dtype=int)
    active = -1
    end_site = False
    i = 0
    positions = rotations = None
    frame_time = 1.0 / 30
    channels = 3

    with open(file_name) as f:
        for line in f:
            if "HIERARCHY" in line or "MOTION" in line or "{" in line:
                continue
            if "}" in line:
                if end_site:
                    end_site = False
                else:
                    active = parents[active]
                continue
            m = re.match(r"ROOT (\w+)", line) or re.match(r"\s*JOINT\s+(\w+)", line)
            if m:
                names.append(m.group(1))
                offsets = np.append(offsets, np.zeros((1, 3)), axis=0)
                parents = np.append(parents, active)
                active = len(parents) - 1
                continue
            m = re.match(
                r"\s*OFFSET\s+([\-\d\.e]+)\s+([\-\d\.e]+)\s+([\-\d\.e]+)", line
            )
            if m:
                if not end_site:
                    offsets[active] = np.array(list(map(float, m.groups())))
                continue
            m = re.match(r"\s*CHANNELS\s+(\d+)", line)
            if m:
                channels = int(m.group(1))
                if order is None:
                    ci = 0 if channels == 3 else 3
                    parts = line.split()[2 + ci : 2 + ci + 3]
                    if all(p in channel_map for p in parts):
                        order = "".join(channel_map[p] for p in parts)
                continue
            if "end site" in line.lower():
                end_site = True
                continue
            m = re.match(r"\s*Frames:\s+(\d+)", line)
            if m:
                frame_num = (end - start) - 1 if (start and end) else int(m.group(1))
                positions = offsets[None].repeat(frame_num, axis=0)
                rotations = np.zeros((frame_num, len(parents), 3))
                continue
            m = re.match(r"\s*Frame Time:\s+([\d\.]+)", line)
            if m:
                frame_time = float(m.group(1))
                continue
            if (start and end) and (i < start or i >= end - 1):
                i += 1
                continue
            data = line.strip().split(" ")
            if data and data[0]:
                block = np.array(list(map(float, data)))
                fi = i - start if start else i
                if fi >= len(rotations):
                    break
                n_joints = len(parents)
                if channels == 3:
                    positions[fi, 0:1] = block[0:3]
                    rotations[fi, :] = block[3:].reshape(n_joints, 3)
                elif channels == 6:
                    block = block.reshape(n_joints, 6)
                    positions[fi, :] = block[:, 0:3]
                    rotations[fi, :] = block[:, 3:6]
                else:
                    raise ValueError(f"unsupported channel count {channels}")
                i += 1

    quats = from_euler(np.radians(rotations), order=order, world=world)
    quats = np.asarray(Q.qfix(jnp.asarray(quats)))
    world_pos = forward_kinematics(
        quats[None].astype(np.float32),
        positions[None, :, 0].astype(np.float32),
        parents,
        offsets.astype(np.float32),
    )[0]
    return names, parents, offsets, world_pos, quats, 1.0 / frame_time


def _write_hierarchy(f, names, offsets, parents, children, joint, tabs,
                     rot_string):
    for child in children[joint]:
        f.write(f"{tabs}JOINT {names[child]}\n{tabs}{{\n")
        f.write(f"{tabs}\tOFFSET {offsets[child][0]:.6f} "
                f"{offsets[child][1]:.6f} {offsets[child][2]:.6f}\n")
        f.write(f"{tabs}\tCHANNELS 3 {rot_string}\n")
        if children[child]:
            _write_hierarchy(f, names, offsets, parents, children, child,
                             tabs + "\t", rot_string)
        else:
            f.write(f"{tabs}\tEnd Site\n{tabs}\t{{\n"
                    f"{tabs}\t\tOFFSET 0.000000 0.000000 0.000000\n"
                    f"{tabs}\t}}\n")
        f.write(f"{tabs}}}\n")


def save_as_bvh(animation: dict, save_path: str,
                include_default_pose: bool = True,
                frame_time: float = 0.032) -> str:
    """Write one animation dict {'joint_names', 'joint_offsets' (J-1,3) or
    (J,3), 'joint_parents', 'positions' (L,J,3), 'rotations' (L,J,4)} to
    save_path/root.bvh (ref utils/mocap_dataset.py:257-357)."""
    names = animation["joint_names"]
    parents = list(animation["joint_parents"])
    offsets = np.asarray(animation["joint_offsets"])
    if len(offsets) == len(parents) - 1:  # reference prepends a zero root
        offsets = np.concatenate([np.zeros((1, 3)), offsets], axis=0)
    rotations = np.asarray(animation["rotations"])  # (L, J, 4)
    trajectory = np.asarray(animation["positions"])[:, 0]  # (L, 3)
    num_frames, num_joints = rotations.shape[:2]

    children = [[] for _ in parents]
    for j, p in enumerate(parents):
        if p != -1:
            children[p].append(j)

    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, "root.bvh")
    rot_string = "Xrotation Yrotation Zrotation"
    eulers = np.degrees(
        np.asarray(Q.qeuler(jnp.asarray(rotations), order="xyz"))
    )  # (L, J, 3)
    with open(out, "w") as f:
        f.write("HIERARCHY\n")
        f.write(f"ROOT {names[0]}\n{{\n")
        f.write(f"\tOFFSET {offsets[0][0]:.6f} {offsets[0][1]:.6f} "
                f"{offsets[0][2]:.6f}\n")
        f.write(f"\tCHANNELS 6 Xposition Yposition Zposition {rot_string}\n")
        _write_hierarchy(f, names, offsets, parents, children, 0, "\t", rot_string)
        f.write("}\n")
        f.write(f"MOTION\nFrames: {num_frames + int(include_default_pose)}\n"
                f"Frame Time: {frame_time}\n")
        if include_default_pose:
            f.write(" ".join(map(str, trajectory[0]))
                    + " 0.000000" * (num_joints * 3) + "\n")
        for t in range(num_frames):
            vals = [str(trajectory[t, 0]), str(trajectory[t, 1]),
                    str(trajectory[t, 2])]
            vals += [f"{e:.6f}" for e in eulers[t].reshape(-1)]
            f.write(" ".join(vals) + "\n")
    return out
