"""Throughput A/B: per-clip fused synthesis vs batched multi-clip synthesis.

The per-clip serving program (synthesis.make_fused_clip_fn) already
collapsed a request to one device program, but it runs the window scan at
generator batch 1 — synthesizing a DATASET of B clips costs B sequential
programs of S batch-1 forwards each. make_batched_clip_fn vmaps the same
program over clips: still S sequential scan steps (autoregression), but
each is one batch-B generator forward. This measures clips/s for both on
the real chip.

Timing follows docs/PERFORMANCE.md methodology: the elapsed window ends
with the host-side device_get of the outputs (a value fetch), repeated,
median reported; both variants interleaved in one process.

Usage: python tools/bench_batch_synthesis.py [--clips 64] [--seconds 5] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    import jax

    # honor JAX_PLATFORMS=cpu even though the axon sitecustomize
    # froze the platform default at interpreter start (same trick
    # as tests/conftest.py / __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from speech2affective_gestures_tpu import compile_cache

    compile_cache.enable()
    import numpy as np

    from speech2affective_gestures_tpu import constants as C
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.data.vocab import Vocab
    from speech2affective_gestures_tpu.train import builder, synthesis

    cfg = ModelConfig()  # full paper config
    gen, _, _ = builder.build_models(cfg, 1000, 100)
    rng_np = np.random.default_rng(0)
    batch = builder.synthetic_batch(rng_np, 2, cfg, 1000, 100)
    import jax.numpy as jnp

    pre = jnp.zeros((2, cfg.n_poses, C.POSE_DIM + 1))
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, jnp.asarray(batch["extended_word_seq"]),
        jnp.asarray(batch["mfcc_features"]),
        jnp.asarray(batch["vid_indices"]),
    )

    lang = Vocab("bench")
    for w in ("hello", "world", "gesture"):
        lang.index_word(w)
    words = [["hello", 0.4, 0.9], ["gesture", 2.0, 2.6]]
    n_audio = int(args.seconds * C.AUDIO_SR)
    clips = []
    for i in range(args.clips):
        audio = (0.2 * np.sin(
            2 * np.pi * (180 + 7 * i) * np.arange(n_audio) / C.AUDIO_SR
        )).astype(np.float32)
        clips.append((audio, words, i % 100))

    clip_fn = synthesis.make_fused_clip_fn(gen.apply, cfg)
    batched_fn = synthesis.make_batched_clip_fn(gen.apply, cfg)
    key = jax.random.key(3)

    def run_per_clip():
        t0 = time.perf_counter()
        outs = []
        for i, (audio, w, vid) in enumerate(clips):
            outs.append(synthesis.synthesize_clip_fused(
                clip_fn, variables, audio, w, lang, cfg, vid_idx=vid,
                rng=jax.random.fold_in(key, i),
            ))
        return time.perf_counter() - t0, outs

    def run_batched():
        t0 = time.perf_counter()
        outs = synthesis.synthesize_clips_batched(
            batched_fn, variables, clips, lang, cfg, rng=key
        )
        return time.perf_counter() - t0, outs

    # warm both programs (compile outside the timed reps)
    _, a = run_per_clip()
    _, b = run_batched()
    worst = max(
        float(np.abs(x[0] - y[0]).max()) for x, y in zip(a, b)
    )

    t_per, t_bat = [], []
    for _ in range(args.reps):
        t, _ = run_per_clip()
        t_per.append(t)
        t, _ = run_batched()
        t_bat.append(t)
    med_per = float(np.median(t_per))
    med_bat = float(np.median(t_bat))
    print(json.dumps({
        "clips": args.clips, "clip_seconds": args.seconds,
        "per_clip_s": round(med_per, 3),
        "batched_s": round(med_bat, 3),
        "per_clip_clips_per_s": round(args.clips / med_per, 1),
        "batched_clips_per_s": round(args.clips / med_bat, 1),
        "speedup": round(med_per / med_bat, 1),
        "max_abs_dev_dir_vec": worst,
    }), flush=True)


if __name__ == "__main__":
    main()
