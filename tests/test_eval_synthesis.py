"""FGD evaluator + streaming synthesis tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data.vocab import Vocab
from speech2affective_gestures_tpu.models.generator import PoseGenerator
from speech2affective_gestures_tpu.train import synthesis
from speech2affective_gestures_tpu.train.evaluator import (
    EmbeddingSpaceEvaluator, push_sample_metrics,
)
from speech2affective_gestures_tpu.train.losses import AverageMeter

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)


def test_fgd_identical_distributions_near_zero(rng):
    ev = EmbeddingSpaceEvaluator.random_init()
    poses = rng.standard_normal((64, C.N_POSES, C.POSE_DIM)).astype(np.float32) * 0.1
    ev.push_samples(poses, poses)  # generated == real
    fgd, feat_dist = ev.get_scores()
    assert fgd < 1e-4
    assert feat_dist < 1e-4


def test_fgd_separates_distributions(rng):
    ev = EmbeddingSpaceEvaluator.random_init()
    real = rng.standard_normal((64, C.N_POSES, C.POSE_DIM)).astype(np.float32) * 0.1
    fake = real + 0.5
    ev.push_samples(fake, real)
    fgd_diff, _ = ev.get_scores()
    ev.reset()
    ev.push_samples(real, real)
    fgd_same, _ = ev.get_scores()
    # random-init embedding gives small absolute scores; separation must
    # still be orders of magnitude
    assert fgd_diff > max(fgd_same * 100, 1e-6)


def test_push_sample_metrics(rng):
    la, mae, acc = AverageMeter("l"), AverageMeter("m"), AverageMeter("a")
    target = rng.standard_normal((8, C.N_POSES, C.POSE_DIM)).astype(np.float32) * 0.1
    out = target + 0.01
    push_sample_metrics(target, out, C.MEAN_DIR_VEC, la, mae, acc)
    assert 0 < la.avg < 0.02
    assert mae.avg > 0 and acc.avg >= 0


# ---------------------------------------------------------------------------

def _tiny_generator():
    gen = PoseGenerator(
        n_words=30, n_speakers=5, hidden_size=32, n_layers=2,
        mfcc_length=CFG.mfcc_length, num_mfcc=CFG.num_mfcc_combined,
    )
    pre = jnp.zeros((1, CFG.n_poses, C.POSE_DIM + 1))
    text = jnp.zeros((1, CFG.n_poses), jnp.int32)
    mfcc = jnp.zeros((1, CFG.num_mfcc_combined, CFG.mfcc_length))
    vids = jnp.zeros((1,), jnp.int32)
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, text, mfcc, vids,
    )
    return gen, variables


def test_plan_subdivisions():
    windows, unit, stride = synthesis.plan_subdivisions(10.0, CFG)
    assert abs(unit - 34 / 15) < 1e-9
    assert abs(stride - 2.0) < 1e-9
    assert len(windows) == 5
    assert windows[0] == (0.0, unit)
    # short clip -> single window
    windows, *_ = synthesis.plan_subdivisions(1.0, CFG)
    assert len(windows) == 1


def test_crossfade_assembly(rng):
    outs = rng.standard_normal((3, 34, 27)).astype(np.float32)
    merged = synthesis.crossfade_windows(outs.copy(), 4)
    assert merged.shape == (30 + 30 + 34, 27)
    # frame 0 of window 1 blends prev[-4] with weight 4/5
    want = outs[0, -4] * 4 / 5 + outs[1, 0] * 1 / 5
    np.testing.assert_allclose(merged[30], want, rtol=1e-5)
    # untouched interior frames pass through
    np.testing.assert_allclose(merged[10], outs[0, 10])


def test_synthesize_clip_end_to_end(rng):
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    for w in ("hello", "world"):
        lang.index_word(w)
    clip_seconds = 8.0
    n_audio = int(clip_seconds * C.AUDIO_SR)
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n_audio) / C.AUDIO_SR)
             ).astype(np.float32)
    words = [["hello", 0.5, 1.0], ["world", 3.0, 3.5], ["hello", 6.0, 6.4]]
    out = synthesis.synthesize_clip(
        gen.apply, variables, audio, words, lang, CFG, vid_idx=2,
        rng=jax.random.key(0),
    )
    windows, *_ = synthesis.plan_subdivisions(clip_seconds, CFG)
    expected_frames = (len(windows) - 1) * (34 - 4) + 34
    assert out.shape == (expected_frames, C.POSE_DIM)
    assert np.isfinite(out).all()


def test_synthesize_clip_fade_out(rng):
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    lang.index_word("x")
    audio = rng.standard_normal(int(5.0 * C.AUDIO_SR)).astype(np.float32) * 0.1
    words = [["x", 0.2, 0.6], ["x", 2.0, 2.2]]
    out = synthesis.synthesize_clip(
        gen.apply, variables, audio, words, lang, CFG, fade_out=True,
        rng=jax.random.key(1),
    )
    # fades to the mean pose (zeros in normalized space) at the tail
    assert np.abs(out[-1]).max() < 1e-6


def test_fused_clip_fn_matches_unfused_path(rng):
    """The one-dispatch serving program (make_fused_clip_fn: MFCC -> scan
    -> masked crossfade -> FK) must reproduce the staged synthesize_clip
    path bit-for-bit-close on the same inputs/rng, including when window
    bucketing pads the window count (the validity mask keeps padded
    windows from blending into the last real frames)."""
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    for w in ("hello", "world"):
        lang.index_word(w)
    clip_fn = synthesis.make_fused_clip_fn(gen.apply, CFG)
    for clip_seconds in (8.0, 13.0):  # 4-window bucket exact + padded
        n_audio = int(clip_seconds * C.AUDIO_SR)
        audio = (0.3 * np.sin(
            2 * np.pi * 220 * np.arange(n_audio) / C.AUDIO_SR
        )).astype(np.float32)
        words = [["hello", 0.5, 1.0], ["world", 3.0, 3.5]]
        want = synthesis.synthesize_clip(
            gen.apply, variables, audio, words, lang, CFG, vid_idx=1,
            rng=jax.random.key(3),
        )
        dir_vec, poses = synthesis.synthesize_clip_fused(
            clip_fn, variables, audio, words, lang, CFG, vid_idx=1,
            rng=jax.random.key(3),
        )
        assert dir_vec.shape == want.shape, clip_seconds
        np.testing.assert_allclose(dir_vec, want, rtol=1e-5, atol=1e-5)
        from speech2affective_gestures_tpu.ops import pose as pose_ops
        import jax.numpy as jnp

        want_poses = np.asarray(pose_ops.convert_dir_vec_to_pose(
            jnp.asarray(want + CFG.mean_dir_vec_array.reshape(-1))
        ))
        np.testing.assert_allclose(poses, want_poses, rtol=1e-5, atol=1e-5)


def test_fused_clip_fn_fade_out(rng):
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    lang.index_word("x")
    audio = rng.standard_normal(int(5.0 * C.AUDIO_SR)).astype(np.float32) * 0.1
    clip_fn = synthesis.make_fused_clip_fn(gen.apply, CFG)
    dir_vec, poses = synthesis.synthesize_clip_fused(
        clip_fn, variables, audio, [["x", 0.2, 0.6]], lang, CFG,
        rng=jax.random.key(1), fade_out=True,
    )
    assert np.abs(dir_vec[-1]).max() < 1e-6
    assert poses.shape == (len(dir_vec), C.NUM_JOINTS, 3)


def test_batched_clip_fn_matches_per_clip_path(rng):
    """make_batched_clip_fn (the fused program vmapped over clips) must
    reproduce the per-clip fused path lane by lane — including mixed clip
    lengths sharing one window bucket, per-clip speakers, and per-clip
    rng keys (fold_in(rng, i), the documented contract)."""
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    for w in ("hello", "world"):
        lang.index_word(w)
    words = [["hello", 0.5, 1.0], ["world", 3.0, 3.5]]
    clips = []
    for clip_seconds, vid in ((4.0, 1), (8.0, 3), (13.0, 0)):
        n_audio = int(clip_seconds * C.AUDIO_SR)
        audio = (0.3 * np.sin(
            2 * np.pi * 220 * np.arange(n_audio) / C.AUDIO_SR
        )).astype(np.float32)
        clips.append((audio, words, vid))

    key = jax.random.key(7)
    batched_fn = synthesis.make_batched_clip_fn(gen.apply, CFG)
    got = synthesis.synthesize_clips_batched(
        batched_fn, variables, clips, lang, CFG, rng=key
    )
    assert len(got) == len(clips)

    clip_fn = synthesis.make_fused_clip_fn(gen.apply, CFG)
    for i, (audio, cwords, vid) in enumerate(clips):
        want_dv, want_ps = synthesis.synthesize_clip_fused(
            clip_fn, variables, audio, cwords, lang, CFG, vid_idx=vid,
            rng=jax.random.fold_in(key, i),
        )
        dv, ps = got[i]
        assert dv.shape == want_dv.shape, i
        np.testing.assert_allclose(dv, want_dv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ps, want_ps, rtol=1e-5, atol=1e-5)


def test_batched_clip_fn_fade_out_and_empty(rng):
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    lang.index_word("x")
    batched_fn = synthesis.make_batched_clip_fn(gen.apply, CFG)
    assert synthesis.synthesize_clips_batched(
        batched_fn, variables, [], lang, CFG) == []
    audio = rng.standard_normal(int(5.0 * C.AUDIO_SR)).astype(np.float32) * 0.1
    (dv, ps), = synthesis.synthesize_clips_batched(
        batched_fn, variables, [(audio, [["x", 0.2, 0.6]], 0)], lang, CFG,
        rng=jax.random.key(1), fade_out=True,
    )
    assert np.abs(dv[-1]).max() < 1e-6
    assert ps.shape == (len(dv), C.NUM_JOINTS, 3)


def test_batched_clip_fn_sharded_over_mesh(rng, mesh8):
    """make_batched_clip_fn(mesh=...) shards the clip axis over the data
    mesh axis (variables replicated) and must match the unsharded program
    lane for lane, with pad_to filling the batch to the axis size."""
    gen, variables = _tiny_generator()
    lang = Vocab("w")
    lang.index_word("hello")
    words = [["hello", 0.5, 1.0]]
    clips = []
    for i, sec in enumerate((4.0, 8.0, 6.0)):  # 3 clips -> padded to 8
        n_audio = int(sec * C.AUDIO_SR)
        audio = (0.2 * np.sin(
            2 * np.pi * (200 + 10 * i) * np.arange(n_audio) / C.AUDIO_SR
        )).astype(np.float32)
        clips.append((audio, words, i))

    key = jax.random.key(11)
    plain = synthesis.synthesize_clips_batched(
        synthesis.make_batched_clip_fn(gen.apply, CFG), variables,
        clips, lang, CFG, rng=key,
    )
    sharded = synthesis.synthesize_clips_batched(
        synthesis.make_batched_clip_fn(gen.apply, CFG, mesh=mesh8),
        variables, clips, lang, CFG, rng=key, pad_to=8,
    )
    assert len(sharded) == len(plain) == 3
    for (dv_p, ps_p), (dv_s, ps_s) in zip(plain, sharded):
        np.testing.assert_allclose(dv_s, dv_p, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ps_s, ps_p, rtol=1e-5, atol=1e-5)
