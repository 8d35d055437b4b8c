"""T2GNet training path (train/t2g_trainer.py) — the loop the reference
cannot run (its T2GNet is imported by no processor and its data loader is
dead; see data/mpi_glove.py). Uses the same synthetic MPI fixture as
test_mpi_glove."""

import numpy as np
import pytest

from speech2affective_gestures_tpu.data import mpi_glove
from speech2affective_gestures_tpu.train import t2g_trainer

from test_mpi_glove import CLIPS, mpi_dir  # noqa: F401  (fixtures)

SMALL_NET = {"num_heads": 2, "num_hidden_units": 32, "num_layers": 1,
             "dropout": 0.0}


@pytest.fixture()
def corpus(mpi_dir):  # noqa: F811
    # 4-d table (the shared 3-d glove fixture breaks attention-head
    # divisibility: text_dim must be divisible by num_heads; real GloVe
    # is 300-d)
    glove4 = mpi_dir / "glove4.txt"
    words = ("the happy angry actor waves".split())
    rng = np.random.default_rng(3)
    glove4.write_text("".join(
        w + " " + " ".join(f"{x:.3f}" for x in rng.normal(size=4)) + "\n"
        for w in words
    ))
    return mpi_glove.load_data_with_glove(str(mpi_dir), "mpi", str(glove4))


def test_prepare_arrays(corpus):
    data_dict, word2idx, _table, tag_categories, max_t = corpus
    arrays = t2g_trainer.prepare_t2g_arrays(
        data_dict, word2idx, tag_categories, max_t
    )
    b = len(data_dict)
    assert arrays["quat"].shape == (b, max_t, arrays["n_joints"] * 4)
    # frame mask counts each clip's true (downsampled) length
    lengths = sorted(
        int(m) for m in arrays["frame_mask"].sum(axis=1)
    )
    want = sorted(len(data_dict[c]["positions"]) for c in arrays["clip_ids"])
    assert lengths == [min(w, max_t) for w in want]
    # padded frames are identity quaternions
    i = int(np.argmin(arrays["frame_mask"].sum(axis=1)))
    pad_frame = arrays["quat"][i, -1].reshape(-1, 4)
    np.testing.assert_allclose(pad_frame, [[1, 0, 0, 0]] * len(pad_frame))
    # tokenization: BOS ... EOS, non-alnum dropped, UNK for OOV impossible
    # here (vocab built from the same corpus)
    row = arrays["text"][arrays["clip_ids"].index("clip_a")]
    toks = [t for t in row if t != mpi_glove.PAD]
    assert toks[0] == mpi_glove.BOS and toks[-1] == mpi_glove.EOS
    n_words = len([w for w in CLIPS["clip_a"]["Text"].split() if w.isalnum()])
    assert len(toks) == n_words + 2
    # tag features: 8 one-hot columns + scalar age
    assert len(arrays["tags"]) == 9
    age_idx = [t for t in mpi_glove.RELEVANT_TAGS if t != "Text"].index("Age")
    assert arrays["tags"][age_idx].shape == (b, 1)
    a = arrays["clip_ids"].index("clip_a")
    assert arrays["tags"][age_idx][a, 0] == pytest.approx(0.31)
    for k, t in enumerate(arrays["tags"]):
        if k != age_idx:
            np.testing.assert_allclose(t.sum(axis=1), 1.0)


def test_training_loss_decreases(corpus):
    data_dict, word2idx, table, tag_categories, max_t = corpus
    out = t2g_trainer.train_t2g(
        data_dict, word2idx, table, tag_categories, max_t,
        epochs=25, batch_size=2, learning_rate=3e-3,
        net_overrides=SMALL_NET,
    )
    hist = out["history"]
    assert len(hist) == 25 and all(np.isfinite(hist))
    assert hist[-1] < 0.7 * hist[0], hist


def test_generate_unit_quaternions(corpus):
    data_dict, word2idx, table, tag_categories, max_t = corpus
    out = t2g_trainer.train_t2g(
        data_dict, word2idx, table, tag_categories, max_t,
        epochs=2, batch_size=2, net_overrides=SMALL_NET,
    )
    arrays = out["arrays"]
    gen = t2g_trainer.generate_quat_sequence(
        out["net"], out["params"], arrays["text"], arrays["tags"],
        arrays["offset_lengths"],
    )
    b = arrays["text"].shape[0]
    assert gen.shape == (b, max_t, arrays["n_joints"] * 4)
    norms = np.linalg.norm(gen.reshape(b, max_t, -1, 4), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # deterministic (eval mode, no dropout)
    gen2 = t2g_trainer.generate_quat_sequence(
        out["net"], out["params"], arrays["text"], arrays["tags"],
        arrays["offset_lengths"],
    )
    np.testing.assert_array_equal(gen, gen2)
