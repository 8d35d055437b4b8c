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
    videos = ted_db.make_synthetic_videos(n_videos=4, clip_seconds=20.0)
    ds = ted_db.build_dataset_from_videos(videos, cfg, keep_sidecars=False)

    import tempfile

    trainers = {}
    for lag in (int(x) for x in args.lags.split(",")):
        t = Trainer(cfg, tempfile.mkdtemp(prefix=f"bench_lag{lag}_"),
                    train_data=ds, val_data=ds, seed=3, metrics_lag=lag)
        t.epoch = 1
        t.logger.print_log = lambda *a, **k: None  # logging off the clock
        t.per_train_epoch(log_interval=10**9, max_iters=4)  # compile+warm
        trainers[lag] = t

    results = {lag: [] for lag in trainers}
    for _ in range(args.reps):
        for lag, t in trainers.items():
            t0 = time.perf_counter()
            t.per_train_epoch(log_interval=10**9, max_iters=args.iters)
            results[lag].append((time.perf_counter() - t0) / args.iters)

    import numpy as np

    for lag, times in results.items():
        med = float(np.median(times))
        print(json.dumps({
            "metrics_lag": lag, "batch_size": args.batch_size,
            "ms_per_iter": round(med * 1e3, 2),
            "iters_per_sec": round(1.0 / med, 2),
            "samples_ms": [round(x * 1e3, 2) for x in sorted(times)],
        }), flush=True)


if __name__ == "__main__":
    main()
