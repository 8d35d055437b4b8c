"""Real-time incremental gesture synthesis.

The reference can only synthesize COMPLETE clips: `render_clip`
(processor_v2.py:1144-1439) needs the whole waveform up front, then walks
34-frame windows with a 30-frame stride, autoregressive 4-pose seeding and
a 4-frame crossfade. Those window mechanics are actually online-capable —
window i depends only on audio up to `i*stride_time + unit_time` and the
previous window's output — the reference just never exposes that.

`StreamingSynthesizer` does: feed audio chunks (any size) as they arrive,
and pose frames come back as soon as each window's audio is complete, with
the window machinery (seeding, crossfade, final-window padding and text
frame mapping) matching the offline path exactly. flush() closes the clip
and returns the tail. The whole stream equals
`synthesis.synthesize_clip(...)` on the concatenated audio — pinned by
tests/test_streaming.py — so offline and live serving share numerics.

Algorithmic latency is the window length minus stride (the crossfade
overlap): a frame is emitted at most `unit_time` (2.27 s) of audio after
the audio it depends on, per the reference's own window geometry.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .config import ModelConfig
from .data.preprocessor import get_words_in_time_range
from .ops import dsp
from .train import synthesis


def make_window_fn(gen_apply, cfg: ModelConfig, use_mfcc: bool = True,
                   precision: str = "f32"):
    """ONE window as one jitted device program: features -> generator.

    window_fn(variables, audio (L,), text (T,), vid_idx (1,), seed
    (n_pre, D), key) -> (T, D) raw window output. Identical math to one
    step of synthesis.make_window_scan (the same seeding and rng split),
    so a chain of window_fn calls reproduces the offline scan.
    precision: 'f32' (highest-precision matmuls, checkpoint parity) or
    'bf16' (synthesis.precision_wrap).
    """
    n_pre = cfg.n_pre_poses
    t = cfg.n_poses
    apply_fn = synthesis.precision_wrap(gen_apply, precision)

    @jax.jit
    def window_fn(variables, audio, text, vid_idx, seed, key):
        if use_mfcc:
            feat = dsp.get_mfcc_features_fast(
                audio[None], sr=C.AUDIO_SR, num_mfcc=cfg.num_mfcc
            )[0, ..., : cfg.mfcc_length]
        else:
            feat = audio
        pre = jnp.zeros((1, t, C.POSE_DIM + 1))
        pre = pre.at[0, :n_pre, :-1].set(seed)
        pre = pre.at[0, :n_pre, -1].set(1.0)
        key, sub = jax.random.split(key)
        out, *_ = apply_fn(
            variables, pre, text[None], feat[None], vid_idx,
            train=False, rngs={"noise": sub},
        )
        return out[0], key

    return window_fn


class StreamingSynthesizer:
    """Incremental windowed synthesis with offline-path parity.

    Usage:
        stream = StreamingSynthesizer(gen.apply, variables, lang, cfg,
                                      vid_idx=3, rng=jax.random.key(0))
        for chunk, words in source:           # e.g. mic + incremental ASR
            frames = stream.feed(chunk, words)   # (k, POSE_DIM), k >= 0
            ...
        frames = stream.flush()               # final (partial) window

    Words may arrive any time before the window that covers them is
    synthesized (an ASR lag of up to `unit_time` is absorbed); each
    window's text uses the same frame mapping as the offline path.
    """

    def __init__(self, gen_apply, variables, lang_model, cfg: ModelConfig,
                 vid_idx: int = 0, seed_dir_vec: np.ndarray | None = None,
                 rng: jax.Array | None = None, use_mfcc: bool = True,
                 window_fn=None, precision: str = "f32"):
        self.cfg = cfg
        self.lang = lang_model
        self.variables = variables
        self.vid_idx = jnp.asarray([vid_idx])
        self.use_mfcc = use_mfcc
        self.window_fn = window_fn or make_window_fn(
            gen_apply, cfg, use_mfcc, precision
        )
        self.unit_time = cfg.n_poses / cfg.motion_resampling_framerate
        self.stride_time = ((cfg.n_poses - cfg.n_pre_poses)
                            / cfg.motion_resampling_framerate)
        self.audio_len = int(self.unit_time * C.AUDIO_SR)
        self._audio = np.zeros(0, np.float32)
        self._words: list = []
        self._n_done = 0  # completed windows
        self._prev_raw: np.ndarray | None = None  # last window's raw output
        self._seed = (jnp.zeros((cfg.n_pre_poses, C.POSE_DIM))
                      if seed_dir_vec is None
                      else jnp.asarray(seed_dir_vec[: cfg.n_pre_poses]))
        self._key = rng if rng is not None else jax.random.key(0)
        self._flushed = False

    # ---------------------------------------------------------- internals

    def _window_start_samples(self, i: int) -> int:
        # the offline path slices window i at
        # floor(start / clip_length * len(audio)) (ref processor_v2.py:1241)
        # — mathematically floor(start * sr), but float-rounded THROUGH the
        # total clip length, which a live stream cannot know. We use
        # floor(start * sr) directly: identical whenever the clip length is
        # exactly representable (the tests pin this), within one audio
        # sample otherwise.
        return math.floor(i * self.stride_time * C.AUDIO_SR)

    def _window_text(self, start: float, end: float) -> np.ndarray:
        text = np.zeros(self.cfg.n_poses, np.int64)
        frame_duration = (end - start) / self.cfg.n_poses
        for word in get_words_in_time_range(self._words, start, end):
            idx = max(0, int(np.floor((word[1] - start) / frame_duration)))
            if idx < self.cfg.n_poses:
                text[idx] = self.lang.get_word_index(word[0])
        return text

    def _run_window(self, audio_window: np.ndarray, start: float,
                    end: float) -> np.ndarray:
        out, self._key = self.window_fn(
            self.variables, jnp.asarray(audio_window),
            jnp.asarray(self._window_text(start, end)), self.vid_idx,
            self._seed, self._key,
        )
        out = np.asarray(out)
        self._seed = jnp.asarray(out[-self.cfg.n_pre_poses:])
        return out

    def _emit(self, raw: np.ndarray, final: bool) -> np.ndarray:
        """Crossfade with the previous window and return the frames that
        are now final (ref crossfade_windows: window i's head blends with
        window i-1's raw tail; every non-final window withholds its last
        n_pre frames — they are only a seam for the next window)."""
        n_pre = self.cfg.n_pre_poses
        out = raw.copy()
        if self._prev_raw is not None:
            w_prev, w_next = synthesis.crossfade_weights(n_pre, out.dtype)
            out[:n_pre] = (self._prev_raw[-n_pre:] * w_prev[:, None]
                           + raw[:n_pre] * w_next[:, None])
        self._prev_raw = raw
        return out if final else out[: len(out) - n_pre]

    # ------------------------------------------------------------- public

    def feed(self, audio_chunk, words=()) -> np.ndarray:
        """Append audio (float32 @16 kHz) and any newly known timed words;
        return all pose frames that became final ((k, POSE_DIM), possibly
        k=0)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        audio_chunk = np.asarray(audio_chunk, np.float32)
        if audio_chunk.size:
            self._audio = np.concatenate([self._audio, audio_chunk])
        self._words.extend(list(w) for w in words)

        emitted = []
        while True:
            a_start = self._window_start_samples(self._n_done)
            if a_start + self.audio_len > len(self._audio):
                break
            start = self._n_done * self.stride_time
            raw = self._run_window(
                self._audio[a_start : a_start + self.audio_len],
                start, start + self.unit_time,
            )
            self._n_done += 1
            emitted.append(self._emit(raw, final=False))
        return (np.concatenate(emitted, axis=0) if emitted
                else np.zeros((0, C.POSE_DIM), np.float32))

    def flush(self, words=()) -> np.ndarray:
        """Close the clip: synthesize the final (zero-padded, possibly
        partial) window exactly as the offline path does for its last
        subdivision, and return the remaining frames."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        self._words.extend(list(w) for w in words)
        self._flushed = True
        clip_length = len(self._audio) / C.AUDIO_SR

        # the offline schedule for this total length
        # (synthesis.plan_subdivisions)
        windows, _, _ = synthesis.plan_subdivisions(clip_length, self.cfg)
        emitted = []
        for i in range(self._n_done, len(windows)):
            start, end = windows[i]
            a_start = self._window_start_samples(i)
            seg = self._audio[a_start : a_start + self.audio_len]
            window_audio = np.zeros(self.audio_len, np.float32)
            window_audio[: len(seg)] = seg
            raw = self._run_window(window_audio, start, end)
            self._n_done += 1
            emitted.append(self._emit(raw, final=(i == len(windows) - 1)))
        if not emitted:
            # every window already streamed; the last one withheld its
            # seam tail, which is final now
            if self._prev_raw is not None:
                return self._prev_raw[-self.cfg.n_pre_poses:].copy()
            return np.zeros((0, C.POSE_DIM), np.float32)
        return np.concatenate(emitted, axis=0)
