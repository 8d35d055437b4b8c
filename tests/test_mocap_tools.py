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


# --- viz_tools port (ref utils/pymo/viz_tools.py) ---------------------------

@pytest.fixture()
def agg(monkeypatch):
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt
    yield plt
    plt.close("all")


def test_draw_stickfigure_2d_draws_all_bones(data, agg):
    ax = mt.draw_stickfigure(data, frame=2, draw_names=True)
    # 4 joints scattered, 3 bones (Spine, LeftArm, RightArm) as lines
    assert len(ax.collections) == 4
    assert len(ax.lines) == 3
    assert len(ax.texts) == 4


def test_draw_stickfigure_joint_subset(data, agg):
    ax = mt.draw_stickfigure(data, frame=0, joints=["Hips", "Spine"])
    assert len(ax.collections) == 2
    assert len(ax.lines) == 1  # only Hips->Spine survives the subset


def test_draw_stickfigure3d_y_up_swap(data, agg):
    pos = mt.to_positions(data)
    ax = mt.draw_stickfigure3d(data, frame=1, positions=pos)
    assert ax.name == "3d"
    assert len(ax.collections) == 4
    # reference plots mocap (X, Z, Y): check one scatter's coordinates
    xs, ys, zs = ax.collections[0]._offsets3d
    np.testing.assert_allclose(
        [float(np.asarray(v)[0]) for v in (xs, ys, zs)],
        [pos[1, 0, 0], pos[1, 0, 2], pos[1, 0, 1]], atol=1e-6,
    )


def test_sketch_move_alpha_ramp(data, agg):
    fig = agg.figure()
    ax = fig.add_subplot(111)
    mt.sketch_move(data, ax=ax)
    # 5 frames, stride 4 -> frames 0 and 4; 3 bones each
    assert len(ax.lines) == 6
    alphas = sorted({ln.get_alpha() for ln in ax.lines})
    assert alphas == [0.0, 0.8]  # frame/n_frames for frames 0 and 4


def test_viz_cnn_filter_smoke(data, agg):
    feat = np.linspace(-1e-4, 1e-4, 3 * 4).reshape(3, 4)
    fig = mt.viz_cnn_filter(feat, data, gap=10)
    assert len(fig.axes) == 2


def test_print_skel_tree(data, capsys):
    text = mt.print_skel(data)
    out = capsys.readouterr().out
    assert text in out
    lines = text.splitlines()
    assert lines[0] == "- Hips (None)"
    # indent = stack depth AFTER the pop — the reference's exact quirk
    # (viz_tools.py:158-161), so Spine prints at depth 0
    assert "- Spine (Hips)" in lines
    assert sum("Arm (Spine)" in l for l in lines) == 2


def test_save_fig_writes_png(tmp_path, data, agg, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mt.draw_stickfigure(data, frame=0)
    mt.save_fig("stick")
    assert (tmp_path / "stick.png").stat().st_size > 0
