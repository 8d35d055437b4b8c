"""Interleaved A/B of serving precision: f32 (checkpoint parity) vs bf16.

The fused serving program (synthesis.make_fused_clip_fn) defaults to
highest-precision f32 matmuls so converted reference checkpoints
reproduce bit-comparable outputs. `precision='bf16'`
(synthesis.precision_wrap) runs the generator forward at TPU-native
precision while keeping the crossfade/assembly/FK in f32. This measures
what that buys — single-clip latency per length bucket and batched
clips/s — and what it costs: the max abs deviation of the bf16 dir-vec
stream from the f32 one (same keys, same windows).

Timing per docs/PERFORMANCE.md: elapsed windows end in the host-side
device_get of the outputs (value fetch), medians over reps, the two
precisions interleaved in one process.

Usage: python tools/bench_serve_precision.py [--clips 32] [--reps 5]
       [--seconds 5,15,60]
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
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--seconds", default="5,15,60")
    p.add_argument("--batch-seconds", type=float, default=5.0)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)
    lengths = [float(s) for s in args.seconds.split(",")]

    import jax

    # honor JAX_PLATFORMS=cpu even though the axon sitecustomize
    # froze the platform default at interpreter start (same trick
    # as tests/conftest.py / __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from speech2affective_gestures_tpu import compile_cache

    compile_cache.enable()
    import jax.numpy as jnp
    import numpy as np

    from speech2affective_gestures_tpu import constants as C
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.data.vocab import Vocab
    from speech2affective_gestures_tpu.train import builder, synthesis

    cfg = ModelConfig()  # full paper config
    gen, _, _ = builder.build_models(cfg, 1000, 100)
    batch = builder.synthetic_batch(np.random.default_rng(0), 2, cfg,
                                    1000, 100)
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((2, cfg.n_poses, C.POSE_DIM + 1)),
        jnp.asarray(batch["extended_word_seq"]),
        jnp.asarray(batch["mfcc_features"]),
        jnp.asarray(batch["vid_indices"]),
    )
    lang = Vocab("bench")
    for w in ("hello", "world", "gesture"):
        lang.index_word(w)
    words = [["hello", 0.4, 0.9], ["gesture", 2.0, 2.6]]

    fns = {prec: synthesis.make_fused_clip_fn(gen.apply, cfg,
                                              precision=prec)
           for prec in ("f32", "bf16")}
    key = jax.random.key(7)
    report = {"single_clip": {}, "deviation": {}}

    # --- single-clip latency per length, interleaved
    for seconds in lengths:
        audio = (0.2 * np.sin(
            2 * np.pi * 170 * np.arange(int(seconds * C.AUDIO_SR))
            / C.AUDIO_SR)).astype(np.float32)
        outs, times = {}, {"f32": [], "bf16": []}
        for prec, fn in fns.items():  # warm/compile + capture outputs
            outs[prec] = synthesis.synthesize_clip_fused(
                fn, variables, audio, words, lang, cfg, vid_idx=3, rng=key,
            )[0]
        for _ in range(args.reps):
            for prec, fn in fns.items():
                t0 = time.perf_counter()
                synthesis.synthesize_clip_fused(
                    fn, variables, audio, words, lang, cfg, vid_idx=3,
                    rng=key,
                )
                times[prec].append(time.perf_counter() - t0)
        med = {prec: float(np.median(ts)) for prec, ts in times.items()}
        dev = float(np.abs(outs["f32"] - outs["bf16"]).max())
        scale = float(np.abs(outs["f32"]).max())
        report["single_clip"][f"{seconds:g}s"] = {
            "f32_ms": round(med["f32"] * 1e3, 1),
            "bf16_ms": round(med["bf16"] * 1e3, 1),
            "speedup": round(med["f32"] / med["bf16"], 2),
        }
        report["deviation"][f"{seconds:g}s"] = {
            "max_abs": round(dev, 5),
            "rel_to_max": round(dev / scale, 4) if scale else None,
        }

    # --- batched clips/s, interleaved
    n_audio = int(args.batch_seconds * C.AUDIO_SR)
    clips = [
        ((0.2 * np.sin(2 * np.pi * (180 + 7 * i) * np.arange(n_audio)
                       / C.AUDIO_SR)).astype(np.float32), words, i % 100)
        for i in range(args.clips)
    ]
    bfns = {prec: synthesis.make_batched_clip_fn(gen.apply, cfg,
                                                 precision=prec)
            for prec in ("f32", "bf16")}
    bouts, btimes = {}, {"f32": [], "bf16": []}
    for prec, fn in bfns.items():  # warm + outputs
        bouts[prec] = synthesis.synthesize_clips_batched(
            fn, variables, clips, lang, cfg, rng=key)
    for _ in range(args.reps):
        for prec, fn in bfns.items():
            t0 = time.perf_counter()
            synthesis.synthesize_clips_batched(
                fn, variables, clips, lang, cfg, rng=key)
            btimes[prec].append(time.perf_counter() - t0)
    bmed = {prec: float(np.median(ts)) for prec, ts in btimes.items()}
    bdev = max(
        float(np.abs(x[0] - y[0]).max())
        for x, y in zip(bouts["f32"], bouts["bf16"])
    )
    report["batched"] = {
        "clips": args.clips, "clip_seconds": args.batch_seconds,
        "f32_clips_per_s": round(args.clips / bmed["f32"], 1),
        "bf16_clips_per_s": round(args.clips / bmed["bf16"], 1),
        "speedup": round(bmed["f32"] / bmed["bf16"], 2),
        "max_abs_dev": round(bdev, 5),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
