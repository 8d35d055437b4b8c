"""Interleaved A/B of backward-pass rematerialization on the full GAN step.

The round-3 trace diagnosis (docs/PERFORMANCE.md) says the step is
activation-TRAFFIC-bound at ~10-14% MFU — i.e. there is ~7x FLOP headroom.
`jax.checkpoint` trades exactly that: the backward re-runs forwards instead
of reading stored residuals from HBM. This script measures whether the
trade pays on the real chip, for both remat policies, in f32 and bf16.

Unlike fused_pass, remat is trajectory-preserving (identical forward values
and gradients — only WHERE backward residuals come from changes), so a win
here could become the default, not an opt-in.

Variants are built in one process (remat is a GanConfig field, bound at jit
trace, not import) and timed INTERLEAVED round-robin so tunnel-latency
drift hits all variants equally. One JSON line per (variant, precision).

Usage:  python tools/bench_remat.py [--batch-size 128] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--windows", default="20,60")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--variants", default="none,full,dots")
    p.add_argument("--precisions", default="f32,bf16")
    args = p.parse_args(argv)
    windows = tuple(int(w) for w in args.windows.split(","))

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

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder, timing

    cfg = ModelConfig()
    batch = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(0), args.batch_size, cfg, 1000, 100))
    key = jax.random.key(1)

    runs = {}  # (variant, prec) -> dict(step fn, state, window fn)
    for prec in args.precisions.split(","):
        for variant in args.variants.split(","):
            setup = builder.init_training(
                cfg, jax.random.key(0), n_words=1000, n_speakers=100,
                mixed_precision=(prec == "bf16"), remat=variant,
            )
            state, train_step = setup["state"], setup["train_step"]

            def step(carry, _ts=train_step):
                st, k = carry
                k, sub = jax.random.split(k)
                st, _ = _ts(st, batch, sub, gan_on=True)
                return st, k

            def make_carry(_st=state):
                return jax.tree.map(jnp.copy, _st), key

            def run_window(n, _step=step, _make=make_carry):
                import time as _t
                carry = _make()
                t0 = _t.perf_counter()
                for _ in range(n):
                    carry = _step(carry)
                timing.fetch_scalar(carry)
                return _t.perf_counter() - t0

            # warm/compile outside the timed loops
            import time as _t
            t0 = _t.perf_counter()
            timing.fetch_scalar(step(make_carry()))
            print(f"# compiled {variant}/{prec} in "
                  f"{_t.perf_counter() - t0:.1f}s", file=sys.stderr,
                  flush=True)
            runs[(variant, prec)] = run_window

    # interleaved: one (n1, n2) slope sample per variant per rep
    n1, n2 = windows
    samples = {k: [] for k in runs}
    for _ in range(args.reps):
        for k, run_window in runs.items():
            t1 = run_window(n1)
            t2 = run_window(n2)
            samples[k].append((t2 - t1) / (n2 - n1))

    for (variant, prec), slopes in samples.items():
        slopes = sorted(slopes)
        med = float(np.median(slopes))
        print(json.dumps({
            "remat": variant, "precision": prec,
            "batch_size": args.batch_size,
            "ms_per_step": round(med * 1e3, 2),
            "steps_per_sec": round(1.0 / med, 2),
            "slope_samples_ms": [round(s * 1e3, 2) for s in slopes],
        }), flush=True)


if __name__ == "__main__":
    main()
