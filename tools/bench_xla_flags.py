"""Global XLA-flag sweep over the full GAN train step (run on the real TPU).

The round-4 device trace showed the f32 step bound by ~200 medium
activation fusions with NO dominant op (docs/PERFORMANCE.md, "Why 2x is
not reachable by kernel work here") — the one lever shaped like that
bound is a compiler-global one. This harness A/Bs candidate XLA flags
against the unflagged baseline with the honest value-fetch slope timing
(train/timing.py), process-per-setting because XLA_FLAGS binds at
startup.

Noise control on the shared axon host (device fluctuates ±15-20%):
settings are run ROUND-ROBIN (baseline, cand1, cand2, ..., baseline, ...)
for --reps full cycles, and each setting gets its OWN persistent compile
cache dir so only its first run pays the multi-minute compile. A setting
whose flags the plugin rejects is recorded as failed, not fatal.

Usage:
    python tools/bench_xla_flags.py                 # sweep the defaults
    python tools/bench_xla_flags.py --one           # timed child (internal)
    python tools/bench_xla_flags.py --flags "--xla_tpu_scoped_vmem_limit_kib=50000"

There is no reference counterpart (the reference has no compiler-tuning
surface); this is TPU-runtime infrastructure.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Candidate flag sets. Each is (tag, "XLA flags string"). Baseline is
# always included first. Candidates target the measured bound: fusion
# sizing / scoped-VMEM headroom / scheduler behavior for a program made
# of many medium elementwise fusions.
DEFAULT_CANDIDATES = [
    ("vmem50m", "--xla_tpu_scoped_vmem_limit_kib=50000"),
    ("no_dot_strength", "--xla_tpu_enable_dot_strength_reduction=false"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("aggressive_loop_fusion",
     "--xla_tpu_enable_aggressive_loop_fusion=true"),
]


def run_one(batch_size: int, windows, reps: int, mixed: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech2affective_gestures_tpu import compile_cache
    compile_cache.enable()

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder, timing

    cfg = ModelConfig()
    setup = builder.init_training(cfg, jax.random.key(0),
                                  n_words=1000, n_speakers=100,
                                  mixed_precision=mixed)
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
        "batch_size": batch_size,
        "mixed_precision": mixed,
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "steps_per_sec": round(res["steps_per_sec"], 2),
        "ms_per_step": round(res["sec_per_step"] * 1e3, 3),
        "slope_samples_ms": [round(s * 1e3, 2) for s in res["slope_samples"]],
        "compile_s": round(compile_s, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--one", action="store_true")
    p.add_argument("--flags", action="append", default=None,
                   help="candidate XLA flags string (repeatable); "
                        "default: the built-in candidate list")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--windows", default="20,60")
    p.add_argument("--reps", type=int, default=2,
                   help="value-fetch slope reps inside each child")
    p.add_argument("--cycles", type=int, default=3,
                   help="round-robin cycles over all settings")
    p.add_argument("--mixed-precision", action="store_true")
    p.add_argument("--cache-root", default="/tmp/s2ag_xla_flag_cache")
    args = p.parse_args(argv)
    windows = tuple(int(w) for w in args.windows.split(","))
    if len(windows) != 2 or windows[1] <= windows[0] or windows[0] <= 0:
        p.error(f"--windows must be exactly two increasing positive sizes "
                f"N1,N2 (the slope estimator), got {args.windows!r}")

    if args.one:
        print(json.dumps(run_one(args.batch_size, windows, args.reps,
                                 args.mixed_precision)))
        return

    if args.flags is None:
        candidates = list(DEFAULT_CANDIDATES)
    else:
        candidates = [(f"cand{i}", f) for i, f in enumerate(args.flags)]
    settings = [("baseline", "")] + candidates

    results = {tag: [] for tag, _ in settings}
    failed = {}
    # a setting is dropped only after this many CONSECUTIVE child failures;
    # a single flake on the shared axon host (the usual case) just skips
    # that cycle and the setting retries next cycle — permanently losing
    # the baseline to a cycle-0 flake would void the whole comparison
    consec_failures = {tag: 0 for tag, _ in settings}
    max_consec = 2
    for cycle in range(args.cycles):
        for tag, flags in settings:
            if consec_failures[tag] >= max_consec:
                continue
            env = dict(os.environ,
                       S2AG_COMPILE_CACHE=os.path.join(args.cache_root, tag))
            base = env.get("S2AG_BASE_XLA_FLAGS", env.get("XLA_FLAGS", ""))
            env["XLA_FLAGS"] = (base + " " + flags).strip()
            cmd = [sys.executable, os.path.abspath(__file__), "--one",
                   "--batch-size", str(args.batch_size),
                   "--windows", args.windows, "--reps", str(args.reps)]
            if args.mixed_precision:
                cmd.append("--mixed-precision")
            try:
                out = subprocess.run(cmd, env=env, capture_output=True,
                                     text=True, timeout=3600)
                err_lines = (None if out.returncode == 0
                             else out.stderr.strip().splitlines()[-3:])
            except subprocess.TimeoutExpired:
                # a hung child must not abort the multi-hour sweep: record
                # it like any other child error and keep going
                err_lines = [f"child timed out after 3600s (cycle {cycle})"]
            if err_lines is not None:
                consec_failures[tag] += 1
                failed[tag] = err_lines
                print(json.dumps({"tag": tag, "cycle": cycle,
                                  "failed": err_lines,
                                  "consecutive": consec_failures[tag]}),
                      flush=True)
                continue
            consec_failures[tag] = 0
            failed.pop(tag, None)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            rec["tag"], rec["cycle"] = tag, cycle
            results[tag].append(rec)
            print(json.dumps(rec), flush=True)

    summary = {}
    for tag, recs in results.items():
        if not recs:
            continue
        ms = sorted(r["ms_per_step"] for r in recs)
        # statistics.median (not the upper-median ms[n//2]): reps x cycles
        # is often even, and train/timing.py uses the true median — the
        # per-setting comparison must not carry a systematic half-sample
        # bias
        summary[tag] = {"median_ms_per_step": float(statistics.median(ms)),
                        "all_ms": ms, "n": len(ms)}
    print(json.dumps({"summary": summary, "failed": failed}, indent=2))


if __name__ == "__main__":
    main()
