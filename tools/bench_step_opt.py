"""Single-chip GAN-step optimization sweep (run on the real TPU).

Sweeps the RNN scan-unroll factor (S2AG_RNN_UNROLL, read by
models/layers.py at import) over the full paper-config train step with
honest value-fetch slope timing (train/timing.py), printing one JSON line
per setting. Since the unroll knob is bound at import, each setting runs in
a subprocess.

Usage:
    python tools/bench_step_opt.py --sweep 1,2,4,8     # orchestrates
    S2AG_RNN_UNROLL=4 python tools/bench_step_opt.py --one  # one setting
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(batch_size: int, windows, reps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.models import layers
    from speech2affective_gestures_tpu.train import builder, timing

    cfg = ModelConfig()
    setup = builder.init_training(cfg, jax.random.key(0),
                                  n_words=1000, n_speakers=100)
    state, train_step = setup["state"], setup["train_step"]
    key = jax.random.key(1)
    batch = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(0), batch_size, cfg, 1000, 100))

    def step(carry):
        st, k = carry
        k, sub = jax.random.split(k)
        st, _ = train_step(st, batch, sub, gan_on=True)
        return st, k

    def make_carry():
        return jax.tree.map(jnp.copy, state), key

    t0 = time.perf_counter()
    timing.fetch_scalar(step(make_carry()))
    compile_s = time.perf_counter() - t0
    res = timing.time_compiled_step(step, make_carry, windows=windows,
                                    reps=reps)
    return {
        "unroll": layers.RNN_UNROLL,
        "batch_size": batch_size,
        "steps_per_sec": round(res["steps_per_sec"], 2),
        "ms_per_step": round(res["sec_per_step"] * 1e3, 3),
        "slope_samples_ms": [round(s * 1e3, 2) for s in res["slope_samples"]],
        "compile_s": round(compile_s, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--one", action="store_true")
    p.add_argument("--sweep", default="1,2,4,8")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--windows", default="20,60")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)
    windows = tuple(int(w) for w in args.windows.split(","))

    if args.one:
        print(json.dumps(run_one(args.batch_size, windows, args.reps)))
        return

    for unroll in args.sweep.split(","):
        env = dict(os.environ, S2AG_RNN_UNROLL=unroll)
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               "--batch-size", str(args.batch_size),
               "--windows", args.windows, "--reps", str(args.reps)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=1800)
        line = (out.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(line, flush=True)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    main()
