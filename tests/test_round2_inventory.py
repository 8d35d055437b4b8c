"""Round-2 inventory fills: PyMO foot-contact features, T2GNet_glove,
embedding-space visualization."""

import os

import jax
import numpy as np

from speech2affective_gestures_tpu.render import mocap_tools as mt
from speech2affective_gestures_tpu.train.evaluator import EmbeddingSpaceEvaluator


# ----------------------------------------------------------- foot contact
def test_peak_indexes_basic():
    y = np.zeros(50)
    y[10] = 1.0
    y[30] = 0.8
    idx = mt.peak_indexes(y, thres=0.3, min_dist=5)
    assert idx.tolist() == [10, 30]
    # min_dist keeps only the higher of two close peaks
    y[13] = 0.9
    idx = mt.peak_indexes(y, thres=0.3, min_dist=5)
    assert idx.tolist() == [10, 30]
    idx = mt.peak_indexes(y, thres=0.3, min_dist=2)
    assert idx.tolist() == [10, 13, 30]


def test_foot_contact_signal_updown():
    """A sinusoid foot-height track: contact flips 0 at down-peaks and 1 at
    up-peaks (features.create_foot_contact_signal, utils/pymo/features.py:19-33)."""
    t = np.linspace(0, 4 * np.pi, 400)
    signal = np.sin(t) + 1.5  # strictly positive like a height channel
    up, down = mt.foot_contact_idxs(signal, t=0.02, min_dist=50)
    assert len(up) >= 2 and len(down) >= 2
    track = mt.foot_contact_signal(signal, start=1, t=0.02, min_dist=50)
    assert len(track) == len(signal)
    assert set(track) == {0, 1}
    # after the first down-peak the signal is 0 until the next up-peak
    first_down, next_up = down[0], up[up > down[0]][0]
    assert track[first_down] == 0
    assert track[next_up] == 1


def test_plot_foot_up_down(tmp_path):
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    signal = np.sin(np.linspace(0, 6 * np.pi, 300)) + 2.0
    ax = mt.plot_foot_up_down(signal, min_dist=30)
    fig = ax.figure
    out = str(tmp_path / "feet.png")
    fig.savefig(out)
    plt.close(fig)
    assert os.path.getsize(out) > 0


# -------------------------------------------------------------- t2g glove
def test_t2g_glove_frozen_embedding():
    from speech2affective_gestures_tpu.models import t2g

    rng = np.random.default_rng(0)
    table = rng.standard_normal((40, 64)).astype(np.float32)
    net = t2g.t2g_net_glove(table, max_time_steps=8)
    text = rng.integers(0, 40, (2, 8)).astype(np.int32)
    tags = [np.eye(d, dtype=np.float32)[rng.integers(0, d, 2)]
            for d in net.tag_dims]
    quat = rng.standard_normal((2, 8, 64)).astype(np.float32)
    offs = rng.standard_normal((2, 20)).astype(np.float32)
    variables = net.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        text, tags, quat, offs,
    )
    # frozen GloVe table is a CONSTANT, not a parameter (freeze=True in
    # nn.Embedding.from_pretrained, net/T2GNet_glove.py:46)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("text_embedding" in n for n in names)
    out, pre = net.apply(variables, text, tags, quat, offs)
    assert out.shape == (2, 8, 64)
    # unit quaternion blocks
    norms = np.linalg.norm(np.asarray(out).reshape(-1, 4), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # enc/dec share the hyperparameters
    assert net.num_heads_enc == net.num_heads_dec
    assert net.num_layers_enc == net.num_layers_dec


# ----------------------------------------------------- embedding-space viz
def test_embedding_viz_projection_and_plot(tmp_path, rng):
    ev = EmbeddingSpaceEvaluator.random_init()
    real = rng.standard_normal((24, 34, 27)).astype(np.float32) * 0.2
    ev.push_samples(real + 0.1, real)
    real2d, gen2d = ev.get_features_for_viz()
    assert real2d.shape == (24, 2) and gen2d.shape == (24, 2)
    out = ev.draw_embedding_space(str(tmp_path / "space.png"))
    assert os.path.getsize(out) > 0
