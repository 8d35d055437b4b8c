"""End-to-end TRAINER epoch throughput vs the raw jitted step.

bench.py measures the step function in a tight dispatch loop (fetch only
at window end) — but the Trainer's epoch loop historically fetched every
step's metrics to host (check_finite + accumulation), a per-step
device->host sync whose RTT over the tunnel (~30 ms) can exceed the step
itself. `metrics_lag` defers those fetches so dispatch runs ahead.

This measures what the USER actually gets: per_train_epoch wall time per
iteration, for several lag values, interleaved. The gap between lag=0 and
the bench.py steps/s is the cost of synchronous metrics; the gap between
lag>0 and bench.py is what remains (host batch assembly + logging).

Usage: python tools/bench_epoch.py [--batch-size 128] [--iters 40] [--reps 3]
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
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--lags", default="0,2,8")
    p.add_argument("--spps", default="1",
                   help="comma list of steps_per_program values; each "
                        "(lag, spp) combo gets its own trainer, "
                        "interleaved")
    p.add_argument("--precisions", default="f32",
                   help="comma list from {f32, bf16}; bf16 is the "
                        "mixed-precision mode (bf16 network forwards, f32 "
                        "master weights/optimizer — train/builder.py). The "
                        "full cross product (lag, spp, precision) is "
                        "interleaved so one run yields a like-for-like "
                        "composed-mode table.")
    args = p.parse_args(argv)

    from speech2affective_gestures_tpu import compile_cache

    compile_cache.enable()
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.data import ted_db
    from speech2affective_gestures_tpu.train.trainer import Trainer

    cfg = ModelConfig(batch_size=args.batch_size, loss_warmup=-1)
    # the corpus must actually SUSTAIN the requested iteration count:
    # an epoch is n_samples // batch_size sampler batches, so undersizing
    # silently shrinks the epoch and wall/args.iters reports nonsense
    # (the first TPU run of this tool did exactly that: 1-iteration
    # epochs divided by 40 printed an impossible 6 ms/step)
    need = (args.iters + 4) * args.batch_size
    n_videos, clip_seconds = 8, 60.0
    while True:
        videos = ted_db.make_synthetic_videos(
            n_videos=n_videos, clip_seconds=clip_seconds)
        ds = ted_db.build_dataset_from_videos(videos, cfg,
                                              keep_sidecars=False)
        if ds.n_samples >= need:
            break
        n_videos *= 2

    import tempfile

    import numpy as np

    trainers = {}
    combos = [(int(l), int(s), prec) for l in args.lags.split(",")
              for s in args.spps.split(",")
              for prec in args.precisions.split(",")]
    for lag, spp, prec in combos:
        if prec not in ("f32", "bf16"):
            raise SystemExit(f"unknown precision {prec!r}")
        t = Trainer(cfg, tempfile.mkdtemp(prefix=f"bench_lag{lag}_"),
                    train_data=ds, val_data=ds, seed=3, metrics_lag=lag,
                    steps_per_program=spp,
                    mixed_precision=(prec == "bf16"))
        t.epoch = 1
        t.logger.print_log = lambda *a, **k: None  # logging off the clock
        # count the steps that actually run (assert the epoch sustained
        # the requested count — see the corpus sizing above)
        t._n_steps = 0
        if spp > 1:
            # a train_step wrapper would count TRACE-time calls (once per
            # scan body), so count executed steps at the program boundary
            ms = t._get_multi_step()

            def counted_ms(state, arrays, idx, adv, rng, gan_on,
                           _t=t, _ms=ms):
                _t._n_steps += int(idx.shape[0])
                return _ms(state, arrays, idx, adv, rng, gan_on=gan_on)

            t._get_multi_step = lambda _f=counted_ms: _f
        else:
            inner = t.train_step

            def counted(st, b, r, _t=t, _inner=inner, **kw):
                _t._n_steps += 1
                return _inner(st, b, r, **kw)

            t.train_step = counted
        t.per_train_epoch(log_interval=10**9, max_iters=max(4, spp))
        trainers[(lag, spp, prec)] = t

    results = {key: [] for key in trainers}
    for _ in range(args.reps):
        for key, t in trainers.items():
            t._n_steps = 0
            t0 = time.perf_counter()
            t.per_train_epoch(log_interval=10**9, max_iters=args.iters)
            dt = time.perf_counter() - t0
            assert t._n_steps == args.iters, (
                f"epoch ran {t._n_steps} steps, requested {args.iters} — "
                "corpus too small, numbers would be garbage"
            )
            results[key].append(dt / t._n_steps)

    for (lag, spp, prec), times in results.items():
        med = float(np.median(times))
        print(json.dumps({
            "metrics_lag": lag, "steps_per_program": spp,
            "precision": prec,
            "batch_size": args.batch_size,
            "iters": args.iters,
            "ms_per_iter": round(med * 1e3, 2),
            "iters_per_sec": round(1.0 / med, 2),
            "samples_ms": [round(x * 1e3, 2) for x in sorted(times)],
        }), flush=True)


if __name__ == "__main__":
    main()
