"""Mocap toolkit (PyMO-equivalent subset)."""

import numpy as np
import pytest

from speech2affective_gestures_tpu.render import bvh, mocap_tools as mt


@pytest.fixture()
def data(rng):
    names = ["Hips", "Spine", "LeftArm", "RightArm"]
    parents = np.array([-1, 0, 1, 1])
    offsets = np.array([[0, 0, 0], [0, 1, 0], [0.5, 0, 0], [-0.5, 0, 0]], float)
    angles = rng.uniform(-0.3, 0.3, (5, 4, 3))
    quats = bvh.from_euler(angles, "xyz")
    roots = np.cumsum(rng.normal(0, 0.01, (5, 3)), axis=0)
    return mt.MocapData(names, parents, offsets, quats, roots, 30.0)


def test_roundtrip_bvh(tmp_path, data):
    path = mt.write_bvh(data, str(tmp_path))
    back = mt.parse_bvh(path)
    assert back.joint_names == data.joint_names
    np.testing.assert_allclose(back.offsets, data.offsets, atol=1e-5)
    # rotation roundtrip up to quaternion sign
    dot = np.abs(np.sum(back.rotations * data.rotations, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_expmap_roundtrip(data):
    e = mt.to_expmap(data)
    q = mt.from_expmap(e)
    dot = np.abs(np.sum(q * data.rotations, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_positions_identity_rotations(data):
    data.rotations = np.zeros_like(data.rotations)
    data.rotations[..., 0] = 1.0
    pos = mt.to_positions(data)
    np.testing.assert_allclose(
        pos[:, 1] - pos[:, 0], np.tile([0, 1, 0], (5, 1)), atol=1e-6
    )


def test_select_joints_keeps_hierarchy(data):
    sub = mt.select_joints(data, ["LeftArm"])
    assert sub.joint_names == ["Hips", "Spine", "LeftArm"]
    np.testing.assert_array_equal(sub.parents, [-1, 0, 1])


def test_mirror_swaps_left_right(data):
    m = mt.mirror(data)
    li = data.joint_names.index("LeftArm")
    ri = data.joint_names.index("RightArm")
    np.testing.assert_allclose(m.offsets[li, 0], -data.offsets[ri, 0])


def test_downsample_and_numpyfy(data):
    d = mt.downsample(data, 2)
    assert d.n_frames == 3 and d.framerate == 15.0
    arr = mt.numpyfy(data)
    assert arr.shape == (5, 3 + 4 * 4)
