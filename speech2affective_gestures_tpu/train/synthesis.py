"""Streaming long-clip gesture synthesis (windowed, autoregressive).

Capability parity with reference `render_clip` (processor_v2.py:1144-1439):
arbitrary-length clips are synthesized in 34-frame windows with stride
(n_poses - n_pre_poses) frames, each window seeded with the previous
window's last 4 output poses, then blended with a 4-frame linear crossfade;
optional fade-out to the mean pose with quadratic-polyfit smoothing.

TPU-first redesign:
- MFCC features for ALL windows are computed on device in one batched call
  (`ops.dsp.get_mfcc_features`) instead of per-window librosa on the host;
- the autoregressive window loop is a single `jax.lax.scan` whose carry is
  the 4-pose seed — one compiled program regardless of clip length;
- the crossfade/assembly runs vectorized afterwards (the blend only touches
  each window's first n_pre frames against the previous window's last
  n_pre raw frames, so it commutes with the scan).
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import ModelConfig
from ..data.preprocessor import get_words_in_time_range
from ..ops import dsp
from ..ops import pose as pose_ops


def plan_subdivisions(clip_length: float, cfg: ModelConfig,
                      unit_time: float | None = None):
    """Window schedule (ref processor_v2.py:1200-1235)."""
    if unit_time is None:
        unit_time = cfg.n_poses / cfg.motion_resampling_framerate
    stride_time = (cfg.n_poses - cfg.n_pre_poses) / cfg.motion_resampling_framerate
    if clip_length < unit_time:
        num = 1
    else:
        num = math.ceil((clip_length - unit_time) / stride_time) + 1
    windows = []
    for i in range(num):
        start = min(i * stride_time, clip_length)
        end = min(start + unit_time, clip_length)
        if start >= end:
            continue
        windows.append((start, end))
    return windows, unit_time, stride_time


def prepare_window_inputs(clip_audio: np.ndarray, clip_words, lang_model,
                          cfg: ModelConfig, sample_rate: int = C.AUDIO_SR,
                          unit_time: float | None = None):
    """Slice audio + build frame-aligned word ids for every window.

    Returns (audio_windows (S, L), text_windows (S, T), end_padding_samples).
    """
    clip_length = len(clip_audio) / sample_rate
    windows, unit_time, _ = plan_subdivisions(clip_length, cfg, unit_time)
    audio_len = int(unit_time * sample_rate)
    n_frames = cfg.n_poses

    audio_windows = np.zeros((len(windows), audio_len), np.float32)
    text_windows = np.zeros((len(windows), n_frames), np.int64)
    end_padding = 0
    for i, (start, end) in enumerate(windows):
        a_start = math.floor(start / clip_length * len(clip_audio))
        seg = clip_audio[a_start : a_start + audio_len]
        if len(seg) < audio_len and i == len(windows) - 1:
            end_padding = audio_len - len(seg)
        audio_windows[i, : len(seg)] = seg  # zero ('constant') padding

        word_seq = get_words_in_time_range(clip_words, start, end)
        frame_duration = (end - start) / n_frames
        for word in word_seq:
            idx = max(0, int(np.floor((word[1] - start) / frame_duration)))
            if idx < n_frames:
                text_windows[i, idx] = lang_model.get_word_index(word[0])
    return audio_windows, text_windows, end_padding


def make_window_scan(gen_apply, cfg: ModelConfig, use_mfcc: bool = True):
    """Compile the autoregressive window loop once.

    scan_fn(variables, audio_feat_windows, text_windows, vid_idx, seed, rng)
    -> raw per-window outputs (S, T, pose_dim). audio_feat_windows is MFCC
    (S, 37, len) when use_mfcc else raw audio (S, L).
    """

    @jax.jit
    def scan_fn(variables, feat_windows, text_windows, vid_idx, seed, rng):
        n_pre = cfg.n_pre_poses
        t = cfg.n_poses

        def step(carry, xs):
            seed, key = carry
            feat, text = xs
            pre = jnp.zeros((1, t, C.POSE_DIM + 1))
            pre = pre.at[0, :n_pre, :-1].set(seed)
            pre = pre.at[0, :n_pre, -1].set(1.0)
            key, sub = jax.random.split(key)
            out, *_ = gen_apply(
                variables, pre, text[None], feat[None], vid_idx,
                train=False, rngs={"noise": sub},
            )
            return (out[0, -n_pre:], key), out[0]

        # inference path: f32 matmuls for converted-checkpoint parity (the
        # TPU default is bf16-multiply, ~1e-2 drift per stacked block)
        with jax.default_matmul_precision("highest"):
            (_, _), outs = jax.lax.scan(
                step, (seed, rng), (feat_windows, text_windows)
            )
        return outs

    return scan_fn


def crossfade_weights(n_pre: int, dtype=np.float32):
    """The reference's linear seam ramp (processor_v2.py:1302-1331): frame
    j of a window's first n_pre frames mixes the previous window's raw
    tail with weight (n_pre-j)/(n_pre+1) and its own output with
    (j+1)/(n_pre+1). Single source of truth for the three consumers
    (crossfade_windows, the fused clip program, StreamingSynthesizer)."""
    j = np.arange(n_pre, dtype=dtype)
    return (n_pre - j) / (n_pre + 1), (j + 1) / (n_pre + 1)


def crossfade_windows(outs: np.ndarray, n_pre: int) -> np.ndarray:
    """Blend + assemble raw window outputs (ref processor_v2.py:1302-1331).

    Window i>0's first n_pre frames are linearly mixed with window i-1's
    last n_pre frames; each non-final window then drops its last n_pre
    frames before concatenation.
    """
    s, t, d = outs.shape
    if s == 1:
        return outs[0].copy()
    blended = outs.copy()
    w_prev, w_next = crossfade_weights(n_pre, outs.dtype)
    w_prev, w_next = w_prev[None, :, None], w_next[None, :, None]
    blended[1:, :n_pre] = outs[:-1, -n_pre:] * w_prev + outs[1:, :n_pre] * w_next
    pieces = [blended[i, : t - n_pre] for i in range(s - 1)] + [blended[-1]]
    return np.concatenate(pieces, axis=0)


def fade_frame_range(n_frames: int, end_padding_samples: int,
                     cfg: ModelConfig, sample_rate: int = C.AUDIO_SR):
    """The (start, end) frame window the fade-out smoothing covers
    (ref processor_v2.py:1336-1339)."""
    start = n_frames - int(
        end_padding_samples / sample_rate * cfg.motion_resampling_framerate
    )
    return start, start + cfg.n_pre_poses * 2


def polyfit_smooth(dir_vec: np.ndarray, start_frame: int,
                   end_frame: int) -> np.ndarray:
    """Quadratic weighted polyfit over [start, end) with pinned endpoints
    (ref processor_v2.py:1358-1391; also applied to the TARGET stream)."""
    y = dir_vec[start_frame:end_frame]
    if len(y) < 3:
        return dir_vec
    x = np.arange(y.shape[0])
    w = np.ones(len(y))
    w[0] = w[-1] = 5
    coeffs = np.polyfit(x, y, 2, w=w)
    interpolated = np.stack(
        [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])], axis=1
    )
    dir_vec[start_frame:end_frame] = interpolated
    return dir_vec


def fade_out_poses(out_dir_vec: np.ndarray, end_padding_samples: int,
                   cfg: ModelConfig, sample_rate: int = C.AUDIO_SR) -> np.ndarray:
    """Fade to the mean pose + quadratic polyfit smoothing over the seam
    (ref processor_v2.py:1334-1391)."""
    n_smooth = cfg.n_pre_poses
    start_frame, end_frame = fade_frame_range(
        len(out_dir_vec), end_padding_samples, cfg, sample_rate
    )
    if len(out_dir_vec) < end_frame:
        out_dir_vec = np.pad(
            out_dir_vec, [(0, end_frame - len(out_dir_vec)), (0, 0)],
            mode="constant",
        )
    out_dir_vec[end_frame - n_smooth :] = 0.0  # mean pose in normalized space
    return polyfit_smooth(out_dir_vec, start_frame, end_frame)


def synthesize_clip(
    gen_apply,
    variables,
    clip_audio: np.ndarray,
    clip_words,
    lang_model,
    cfg: ModelConfig,
    vid_idx: int = 0,
    seed_dir_vec: np.ndarray | None = None,
    rng: jax.Array | None = None,
    sample_rate: int = C.AUDIO_SR,
    fade_out: bool = False,
    use_mfcc: bool = True,
    scan_fn=None,
    window_bucketing: bool = False,
) -> np.ndarray:
    """Full streaming synthesis: audio + timed words -> (F, pose_dim)
    mean-normalized direction vectors for the whole clip.

    window_bucketing pads the window count to the next power of two so the
    jitted scan compiles once per bucket instead of once per clip length
    (serving path); the scan is sequential, so outputs for the real windows
    are unaffected by trailing padded windows, which are sliced away.
    """
    audio_windows, text_windows, end_padding = prepare_window_inputs(
        clip_audio, clip_words, lang_model, cfg, sample_rate
    )
    n_windows = len(audio_windows)
    if window_bucketing and n_windows > 0:
        bucket = 1 << max(2, (n_windows - 1).bit_length())
        if bucket > n_windows:
            pad = bucket - n_windows
            audio_windows = np.pad(audio_windows, ((0, pad), (0, 0)))
            text_windows = np.pad(text_windows, ((0, pad), (0, 0)))
    if use_mfcc:
        feat_windows = dsp.get_mfcc_features_fast(
            jnp.asarray(audio_windows), sr=sample_rate, num_mfcc=cfg.num_mfcc
        )[..., : cfg.mfcc_length]
    else:
        feat_windows = jnp.asarray(audio_windows)

    if seed_dir_vec is None:
        seed = jnp.zeros((cfg.n_pre_poses, C.POSE_DIM))
    else:
        seed = jnp.asarray(seed_dir_vec[: cfg.n_pre_poses])
    if rng is None:
        rng = jax.random.key(0)
    if scan_fn is None:
        scan_fn = make_window_scan(gen_apply, cfg, use_mfcc)
    outs = np.asarray(
        scan_fn(variables, feat_windows, jnp.asarray(text_windows),
                jnp.asarray([vid_idx]), seed, rng)
    )[:n_windows]
    out_dir_vec = crossfade_windows(outs, cfg.n_pre_poses)
    if fade_out:
        out_dir_vec = fade_out_poses(out_dir_vec, end_padding, cfg, sample_rate)
    return out_dir_vec


# ---------------------------------------------------------------------------
# fused serving path: the WHOLE request as one device program
# ---------------------------------------------------------------------------


def precision_wrap(gen_apply, precision: str):
    """Bind the inference numerics policy into a generator apply fn.

    'f32' (default): every matmul pinned to highest precision — converted
    reference checkpoints reproduce bit-comparable outputs (the parity
    suite's assumption). 'bf16': params and floating inputs cast to bf16
    per call, floating outputs cast back to f32 (the inference analog of
    builder.mixed_precision_apply) — assembly/crossfade/FK stay f32, the
    network forward runs at TPU-native precision. Opt-in: the output
    drift is CONDITIONED ON THE MODEL'S RECURRENT DYNAMICS (a contractive
    trained GRU stays at a few % relative; an expansive one amplifies
    rounding exponentially over the 34-step window — see
    tests/test_serve.py::test_bf16_precision_service). Always check
    tools/bench_serve_precision.py's deviation report for the actual
    checkpoint being served; latency A/B in docs/PERFORMANCE.md.
    """
    if precision == "f32":
        def run(variables, *args, **kwargs):
            with jax.default_matmul_precision("highest"):
                return gen_apply(variables, *args, **kwargs)

        return run
    if precision != "bf16":
        raise ValueError(f"unknown precision {precision!r} "
                         "(expected 'f32' or 'bf16')")
    bf16, f32 = jnp.bfloat16, jnp.float32

    def cast_in(x):
        return x.astype(bf16) if getattr(x, "dtype", None) == f32 else x

    def cast_out(x):
        return x.astype(f32) if getattr(x, "dtype", None) == bf16 else x

    def run(variables, *args, **kwargs):
        variables = dict(variables)
        variables["params"] = jax.tree.map(cast_in, variables["params"])
        args = tuple(jax.tree.map(cast_in, a) for a in args)
        out = gen_apply(variables, *args, **kwargs)
        return jax.tree.map(cast_out, out)

    return run


def make_fused_clip_fn(gen_apply, cfg: ModelConfig, use_mfcc: bool = True,
                       precision: str = "f32"):
    """Compile the complete serving computation as ONE jitted program:
    MFCC front-end -> autoregressive window scan -> validity-masked
    crossfade/assembly -> mean re-add -> FK pose conversion.

    The unfused path (synthesize_clip) pays one dispatch + device->host
    round-trip PER STAGE — over the axon tunnel (~30 ms RTT each) that
    fixed cost dominated short clips (834 ms median for 5 s,
    docs/PERFORMANCE.md). Here a request is one host->device transfer, one
    program, one fetch.

    fused(variables, audio_windows (S, L), text_windows (S, T), vid_idx
    (1,), seed (n_pre, D), rng, n_valid) -> (dir_vec (F_max, D), poses
    (F_max, J, 3)) where F_max = (S-1)*stride + T; rows past
    (n_valid-1)*stride + T are garbage from padded windows — the host
    slices them off. The masked crossfade reproduces crossfade_windows
    exactly for the valid prefix (windows are sequential, so padded
    windows can only ever APPEND rows, never corrupt valid ones; the
    validity mask stops the first padded window from blending into the
    last n_pre real rows).
    """
    return jax.jit(_fused_clip_body(gen_apply, cfg, use_mfcc, precision))


def _fused_clip_body(gen_apply, cfg: ModelConfig, use_mfcc: bool = True,
                     precision: str = "f32"):
    """The single-clip fused program body (unjitted) — shared by
    make_fused_clip_fn (jit) and make_batched_clip_fn (jit∘vmap)."""
    n_pre = cfg.n_pre_poses
    t = cfg.n_poses
    stride = t - n_pre
    mean_vec = jnp.asarray(cfg.mean_dir_vec_array.reshape(-1))
    apply_fn = precision_wrap(gen_apply, precision)

    def fused(variables, audio_windows, text_windows, vid_idx, seed, rng,
              n_valid):
        if use_mfcc:
            feat_windows = dsp.get_mfcc_features_fast(
                audio_windows, sr=C.AUDIO_SR, num_mfcc=cfg.num_mfcc
            )[..., : cfg.mfcc_length]
        else:
            feat_windows = audio_windows

        def step(carry, xs):
            sd, key = carry
            feat, text = xs
            pre = jnp.zeros((1, t, C.POSE_DIM + 1))
            pre = pre.at[0, :n_pre, :-1].set(sd)
            pre = pre.at[0, :n_pre, -1].set(1.0)
            key, sub = jax.random.split(key)
            out, *_ = apply_fn(
                variables, pre, text[None], feat[None], vid_idx,
                train=False, rngs={"noise": sub},
            )
            return (out[0, -n_pre:], key), out[0]

        (_, _), outs = jax.lax.scan(
            step, (seed, rng), (feat_windows, text_windows)
        )  # (S, T, D)

        s = outs.shape[0]
        # linear crossfade of each window's first n_pre frames with the
        # previous window's last n_pre raw frames (crossfade_windows above,
        # ref processor_v2.py:1302-1331)
        wp, wn = crossfade_weights(n_pre)
        w_prev = jnp.asarray(wp, outs.dtype)[:, None]
        w_next = jnp.asarray(wn, outs.dtype)[:, None]
        if s > 1:
            blended_head = outs[:-1, -n_pre:] * w_prev + outs[1:, :n_pre] * w_next
            blended = outs.at[1:, :n_pre].set(blended_head)
        else:
            blended = outs

        f_max = (s - 1) * stride + t
        dir_vec = jnp.zeros((f_max, outs.shape[-1]), outs.dtype)
        for i in range(s):  # static loop, compiled once per bucket
            lo = i * stride
            cur = jax.lax.dynamic_slice_in_dim(dir_vec, lo, t, axis=0)
            write = jnp.where(i < n_valid, blended[i], cur)
            dir_vec = jax.lax.dynamic_update_slice_in_dim(
                dir_vec, write, lo, axis=0
            )

        poses = pose_ops.convert_dir_vec_to_pose(dir_vec + mean_vec)
        return dir_vec, poses

    return fused


def make_batched_clip_fn(gen_apply, cfg: ModelConfig, use_mfcc: bool = True,
                         mesh=None, data_axis: str = "data",
                         precision: str = "f32"):
    """Compile MULTI-CLIP fused synthesis: the single-clip fused program
    vmapped over a leading clip axis B, one jitted program for the batch.

    With `mesh`, the clip axis is sharded over the mesh's `data_axis`
    (variables replicated) — dataset-wide synthesis scales over chips the
    same way the train step does; callers must make B divisible by the
    axis size (synthesize_clips_batched pads when given the same mesh).

    The per-clip paths (synthesize_clip / synthesize_clip_fused) run the
    autoregressive window scan at generator batch 1 — B clips cost B*S
    sequential batch-1 forwards, leaving the MXU almost idle. Under vmap
    the scan still walks S windows sequentially (autoregression demands
    it), but each step is ONE generator forward at batch B: dataset-wide
    synthesis (ref generate_gestures_by_dataset, processor_v2.py:1441-1567,
    which loops clips one at a time) and batch serving scale with the
    chip instead of the clip count.

    vmap axes: variables broadcast; audio (B, S, L), text (B, S, T),
    vid_idx (B, 1), seed (B, n_pre, D), per-clip rng keys (B,), n_valid
    (B,). Per-lane numerics match the single-clip program given the same
    per-clip key (same RNG consumption — the key is split inside each
    lane), up to batched-matmul reduction-order effects.
    """
    body = _fused_clip_body(gen_apply, cfg, use_mfcc, precision)
    fn = jax.vmap(body, in_axes=(None, 0, 0, 0, 0, 0, 0))
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(rep,) + (shard,) * 6,
        out_shardings=(shard, shard),
    )


def synthesize_clips_batched(
    batched_fn,
    variables,
    clips,
    lang_model,
    cfg: ModelConfig,
    rng: jax.Array | None = None,
    sample_rate: int = C.AUDIO_SR,
    fade_out: bool = False,
    seeds=None,
    keys=None,
    pad_to: int | None = None,
    timings: dict | None = None,
):
    """Synthesize many clips in one device program.

    clips: iterable of (clip_audio, clip_words, vid_idx) triples. All
    clips are padded to one shared window-count bucket (power of two over
    the longest clip) so the program compiles once per bucket. seeds:
    optional per-clip (n_pre, D) seed direction vectors (default zeros —
    the mean pose). keys: optional (B,) array of per-clip PRNG keys
    (default jax.random.fold_in(rng, i)). Returns a list of (dir_vec
    (F_i, D), poses (F_i, J, 3)) numpy pairs, one per clip, identical to
    running synthesize_clip_fused per clip with the same key. fade_out
    may be a single bool or one bool per clip. pad_to: pad the clip axis
    to a multiple (dummy lanes, results dropped) — required when
    batched_fn shards clips over a mesh axis of that size. timings: if a
    dict is passed, phase wall-times land in it (prep_ms = host window
    planning/packing, device_ms = dispatch + output fetch, post_ms =
    host slicing/fades) so servers can report where request time goes.
    """
    t_start = time.perf_counter()
    clips = list(clips)
    if not clips:
        return []
    fades = (list(fade_out) if isinstance(fade_out, (list, tuple, np.ndarray))
             else [fade_out] * len(clips))
    n_clips = len(clips)
    n_pad = (-n_clips) % pad_to if pad_to else 0
    prepped = [
        prepare_window_inputs(audio, words, lang_model, cfg, sample_rate)
        for audio, words, _ in clips
    ]
    n_windows = [len(a) for a, _, _ in prepped]
    bucket = 1 << max(2, (max(n_windows) - 1).bit_length())
    audio_w = np.zeros((n_clips + n_pad, bucket, prepped[0][0].shape[1]),
                       np.float32)
    text_w = np.zeros((n_clips + n_pad, bucket, cfg.n_poses), np.int64)
    for i, (a, tx, _) in enumerate(prepped):
        audio_w[i, : len(a)] = a
        text_w[i, : len(tx)] = tx
    if keys is None:
        if rng is None:
            rng = jax.random.key(0)
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(n_clips)
        )
    if n_pad:
        keys = jnp.concatenate(
            [jnp.asarray(keys),
             jnp.stack([jax.random.key(0)] * n_pad)]
        )
    if seeds is None:
        seed_arr = jnp.zeros((n_clips + n_pad, cfg.n_pre_poses, C.POSE_DIM))
    else:
        seed_arr = jnp.asarray(np.concatenate([
            np.stack([np.asarray(s[: cfg.n_pre_poses], np.float32)
                      for s in seeds]),
            np.zeros((n_pad, cfg.n_pre_poses, C.POSE_DIM), np.float32),
        ]) if n_pad else np.stack(
            [np.asarray(s[: cfg.n_pre_poses], np.float32) for s in seeds]
        ))
    t_prep = time.perf_counter()
    dir_vec_full, poses_full = batched_fn(
        variables,
        jnp.asarray(audio_w),
        jnp.asarray(text_w),
        jnp.asarray([[vid] for _, _, vid in clips] + [[0]] * n_pad),
        seed_arr,
        keys,
        jnp.asarray(n_windows + [1] * n_pad, jnp.int32),
    )
    dir_vec_full, poses_full = jax.device_get((dir_vec_full, poses_full))
    t_device = time.perf_counter()
    stride = cfg.n_poses - cfg.n_pre_poses
    out = []
    for i, (_, _, end_padding) in enumerate(prepped):
        n_real = (n_windows[i] - 1) * stride + cfg.n_poses
        dv = dir_vec_full[i, :n_real]
        ps = poses_full[i, :n_real]
        if fades[i]:
            dv = fade_out_poses(dv.copy(), end_padding, cfg, sample_rate)
            ps = np.asarray(pose_ops.convert_dir_vec_to_pose(
                jnp.asarray(dv + cfg.mean_dir_vec_array.reshape(-1))
            ))
        out.append((dv, ps))
    if timings is not None:
        t_end = time.perf_counter()
        timings["prep_ms"] = (t_prep - t_start) * 1e3
        timings["device_ms"] = (t_device - t_prep) * 1e3
        timings["post_ms"] = (t_end - t_device) * 1e3
    return out


def synthesize_clip_fused(
    clip_fn,
    variables,
    clip_audio: np.ndarray,
    clip_words,
    lang_model,
    cfg: ModelConfig,
    vid_idx: int = 0,
    rng: jax.Array | None = None,
    sample_rate: int = C.AUDIO_SR,
    fade_out: bool = False,
    timings: dict | None = None,
):
    """Serving-path synthesis through a make_fused_clip_fn program.

    Host work is reduced to window planning/slicing (numpy views) and the
    final slice to the real frame count; window counts are bucketed to the
    next power of two so the program compiles once per bucket. Returns
    (dir_vec (F, D), poses (F, J, 3)) as numpy arrays. timings: optional
    dict receiving prep_ms/device_ms/post_ms phase wall-times.
    """
    t_start = time.perf_counter()
    audio_windows, text_windows, end_padding = prepare_window_inputs(
        clip_audio, clip_words, lang_model, cfg, sample_rate
    )
    n_windows = len(audio_windows)
    bucket = 1 << max(2, (n_windows - 1).bit_length())
    if bucket > n_windows:
        pad = bucket - n_windows
        audio_windows = np.pad(audio_windows, ((0, pad), (0, 0)))
        text_windows = np.pad(text_windows, ((0, pad), (0, 0)))
    t_prep = time.perf_counter()
    dir_vec_full, poses_full = clip_fn(
        variables, jnp.asarray(audio_windows), jnp.asarray(text_windows),
        jnp.asarray([vid_idx]),
        jnp.zeros((cfg.n_pre_poses, C.POSE_DIM)),
        rng if rng is not None else jax.random.key(0),
        jnp.asarray(n_windows, jnp.int32),
    )
    n_real = (n_windows - 1) * (cfg.n_poses - cfg.n_pre_poses) + cfg.n_poses
    dir_vec, poses = jax.device_get((dir_vec_full[:n_real],
                                     poses_full[:n_real]))
    t_device = time.perf_counter()
    if fade_out:
        # host-side polyfit smoothing (rare path, numpy by nature); the
        # poses must then be recomputed from the smoothed vectors.
        # device_get hands back read-only buffers, so copy first.
        dir_vec = fade_out_poses(dir_vec.copy(), end_padding, cfg,
                                 sample_rate)
        poses = np.asarray(pose_ops.convert_dir_vec_to_pose(
            jnp.asarray(dir_vec + cfg.mean_dir_vec_array.reshape(-1))
        ))
    if timings is not None:
        t_end = time.perf_counter()
        timings["prep_ms"] = (t_prep - t_start) * 1e3
        timings["device_ms"] = (t_device - t_prep) * 1e3
        timings["post_ms"] = (t_end - t_device) * 1e3
    return dir_vec, poses
