"""Streaming synthesis: incremental feed/flush equals the offline path.

The contract (streaming.py): feeding a clip in arbitrary chunks and
flushing produces exactly the frames synthesize_clip produces on the whole
waveform — same window seeding, rng chain, crossfade and final-window
padding — so live serving and offline rendering share numerics.
"""

import numpy as np
import jax
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu import streaming
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data.vocab import Vocab
from speech2affective_gestures_tpu.models.generator import PoseGenerator
from speech2affective_gestures_tpu.train import synthesis

pytestmark = pytest.mark.slow  # compile-heavy

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)


@pytest.fixture(scope="module")
def gen_and_vars():
    import jax.numpy as jnp

    gen = PoseGenerator(
        n_words=30, n_speakers=5, hidden_size=32, n_layers=2,
        mfcc_length=CFG.mfcc_length, num_mfcc=CFG.num_mfcc_combined,
    )
    pre = jnp.zeros((1, CFG.n_poses, C.POSE_DIM + 1))
    text = jnp.zeros((1, CFG.n_poses), jnp.int32)
    mfcc = jnp.zeros((1, CFG.num_mfcc_combined, CFG.mfcc_length))
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, text, mfcc, jnp.asarray([0]),
    )
    return gen, variables


@pytest.fixture(scope="module")
def lang():
    v = Vocab("w")
    for w in ("hello", "world"):
        v.index_word(w)
    return v


def _clip(seconds):
    n = int(seconds * C.AUDIO_SR)
    return (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / C.AUDIO_SR)
            ).astype(np.float32)


WORDS = [["hello", 0.5, 1.0], ["world", 3.0, 3.5]]


@pytest.mark.parametrize("seconds,chunk", [
    (8.0, 4096),     # partial final window, smallish chunks
    (4.0, 100000),   # one feed covers several windows at once
    (2.0, 1024),     # shorter than one window: all work happens in flush
])
def test_stream_equals_offline(gen_and_vars, lang, seconds, chunk):
    gen, variables = gen_and_vars
    audio = _clip(seconds)
    want = synthesis.synthesize_clip(
        gen.apply, variables, audio, WORDS, lang, CFG, vid_idx=1,
        rng=jax.random.key(3),
    )

    stream = streaming.StreamingSynthesizer(
        gen.apply, variables, lang, CFG, vid_idx=1, rng=jax.random.key(3),
    )
    got = [stream.feed(audio[i : i + chunk],
                       WORDS if i == 0 else ())
           for i in range(0, len(audio), chunk)]
    got.append(stream.flush())
    got = np.concatenate(got, axis=0)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stream_emits_incrementally(gen_and_vars, lang):
    """Frames must come out DURING the stream, not all at flush: after
    feeding enough audio for window i, exactly (i+1)*stride frames are
    out (each non-final window withholds its n_pre-frame seam)."""
    gen, variables = gen_and_vars
    stream = streaming.StreamingSynthesizer(
        gen.apply, variables, lang, CFG, rng=jax.random.key(0),
    )
    stride = CFG.n_poses - CFG.n_pre_poses
    audio = _clip(8.0)
    unit_samples = stream.audio_len
    stride_samples = int(stream.stride_time * C.AUDIO_SR)

    out = stream.feed(audio[:unit_samples], WORDS)
    assert len(out) == stride  # window 0 minus its seam tail
    out2 = stream.feed(audio[unit_samples : unit_samples + stride_samples])
    assert len(out2) == stride  # window 1
    rest = stream.feed(audio[unit_samples + stride_samples :])
    tail = stream.flush()
    total = len(out) + len(out2) + len(rest) + len(tail)
    windows, _, _ = synthesis.plan_subdivisions(8.0, CFG)
    assert total == (len(windows) - 1) * stride + CFG.n_poses


def test_stream_word_late_arrival(gen_and_vars, lang):
    """Words may arrive after their audio as long as the covering window
    has not been synthesized yet: feeding words at flush time for the
    final window equals feeding them up front."""
    gen, variables = gen_and_vars
    audio = _clip(4.0)
    late_word = [["world", 3.0, 3.5]]

    s1 = streaming.StreamingSynthesizer(
        gen.apply, variables, lang, CFG, rng=jax.random.key(5))
    a = np.concatenate([s1.feed(audio, late_word), s1.flush()])

    s2 = streaming.StreamingSynthesizer(
        gen.apply, variables, lang, CFG, rng=jax.random.key(5))
    b = np.concatenate([s2.feed(audio), s2.flush(late_word)])

    # the late word lands in the final window, which flush synthesizes —
    # identical either way
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


def test_stream_flush_twice_raises(gen_and_vars, lang):
    gen, variables = gen_and_vars
    stream = streaming.StreamingSynthesizer(
        gen.apply, variables, lang, CFG)
    stream.feed(_clip(1.0))
    stream.flush()
    with pytest.raises(RuntimeError):
        stream.flush()
    with pytest.raises(RuntimeError):
        stream.feed(_clip(0.5))
