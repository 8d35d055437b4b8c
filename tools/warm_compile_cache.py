"""Warm a repo-local persistent XLA cache with the flagship programs.

Cold compiles of the full-size GAN train step take minutes on this host
class (measured: 110-1143 s for the bs128 f32 step over the axon tunnel,
variance is tunnel/host load). This tool compiles the programs `bench.py`
and `__graft_entry__.entry()` need into `<repo>/.xla_warm_cache`, which
compile_cache.enable() auto-prefers when present (env override wins).
Entries are keyed by HLO + jax/jaxlib version + device; a mismatched
environment simply misses and compiles cold — a stale cache can never
break anything.

MEASURED NEGATIVE RESULT on the axon tunnel (round 5): loading a cached
37 MB train-step executable cost ~460 s — the serialized executable moves
at the tunnel's <1 MiB/s bulk rate, i.e. cache READS of big entries are as
slow as compiling. Shipping a warmed cache inside the checkout therefore
does NOT pay on tunneled devices and the repo does not commit one; on real
(non-tunneled) TPU hosts, where cache loads are local-disk reads, this
tool gives CI/serving fleets a genuine warm start.

Usage:
    python tools/warm_compile_cache.py [--stages headline,entry,bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="headline,entry",
                    help="comma list: headline (bs128 f32 train step), "
                         "entry (__graft_entry__ forward), bf16 "
                         "(mixed-precision bs128 step)")
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args()
    stages = {s.strip() for s in args.stages.split(",") if s.strip()}

    from speech2affective_gestures_tpu import compile_cache

    cache_dir = compile_cache.enable(compile_cache.REPO_WARM_DIR)
    print(f"warming cache at {cache_dir}")

    import numpy as np
    import jax

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder, timing

    def run(name, fn):
        t0 = time.monotonic()
        fn()
        print(f"  {name}: {time.monotonic() - t0:.1f}s")

    cfg = ModelConfig()
    if stages & {"headline", "bf16"}:
        batch = jax.device_put(builder.synthetic_batch(
            np.random.default_rng(0), args.batch_size, cfg, 1000, 100))
        key = jax.random.key(1)

    if "headline" in stages:
        setup = builder.init_training(cfg, jax.random.key(0),
                                      n_words=1000, n_speakers=100)

        def headline():
            st, metrics = setup["train_step"](setup["state"], batch, key,
                                              gan_on=True)
            timing.fetch_scalar(metrics["loss"])

        run("headline f32 train step", headline)

    if "bf16" in stages:
        mp = builder.init_training(cfg, jax.random.key(0), n_words=1000,
                                   n_speakers=100, mixed_precision=True)

        def bf16():
            st, metrics = mp["train_step"](mp["state"], batch, key,
                                           gan_on=True)
            timing.fetch_scalar(metrics["loss"])

        run("bf16 train step", bf16)

    if "entry" in stages:
        import __graft_entry__ as g

        def entry():
            fn, eargs = g.entry()
            timing.fetch_scalar(jax.jit(fn)(*eargs))

        run("entry forward", entry)

    total = sum(
        os.path.getsize(os.path.join(cache_dir, f))
        for f in os.listdir(cache_dir)
    )
    print(f"cache populated: {len(os.listdir(cache_dir))} entries, "
          f"{total / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
