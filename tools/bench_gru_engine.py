"""A/B the GRU engines (lax.scan vs fused Pallas kernel) on the real TPU.

Per engine (subprocess, since S2AG_GRU_ENGINE binds at trace time):
honest slope-timed generator forward, forward+backward, and full GAN train
step, plus a cross-engine numeric check on one forward.

Usage:
    python tools/bench_gru_engine.py              # A/B orchestration
    S2AG_GRU_ENGINE=pallas python tools/bench_gru_engine.py --one
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(batch_size: int, windows, reps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.models import layers
    from speech2affective_gestures_tpu.train import builder, gan_step, losses, timing

    cfg = ModelConfig()
    setup = builder.init_training(cfg, jax.random.key(0),
                                  n_words=1000, n_speakers=100)
    gen, state = setup["gen"], setup["state"]
    b = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(0), batch_size, cfg, 1000, 100))
    pre_seq = gan_step.build_pre_seq(b["vec_seq"], cfg.n_pre_poses)
    k1, k2 = jax.random.split(jax.random.key(7))
    gvars = {"params": state.gen_params, "batch_stats": state.gen_stats}

    out = {"engine": layers._gru_engine(), "batch_size": batch_size}

    def gen_fwd(eps):
        (o, *_), _ = gen.apply(
            gvars, pre_seq + eps, b["extended_word_seq"], b["mfcc_features"],
            b["vid_indices"], train=True,
            rngs={"noise": k1, "dropout": k2}, mutable=["batch_stats"],
        )
        return o.sum()

    def gen_fwd_bwd(eps):
        def loss_fn(params):
            (o, *_), _ = gen.apply(
                {"params": params, "batch_stats": state.gen_stats},
                pre_seq + eps, b["extended_word_seq"], b["mfcc_features"],
                b["vid_indices"], train=True,
                rngs={"noise": k1, "dropout": k2}, mutable=["batch_stats"],
            )
            return losses.scaled_huber(o, b["vec_seq"], beta=0.1)
        g = jax.grad(loss_fn)(state.gen_params)
        return jax.tree.leaves(g)[0].sum()

    for name, fn in (("gen_fwd_ms", gen_fwd), ("gen_fwd_bwd_ms", gen_fwd_bwd)):
        jfn = jax.jit(fn)
        res = timing.time_compiled_step(lambda c: jfn(c * 0.0), jnp.zeros(()),
                                        windows=windows, reps=reps)
        out[name] = round(res["sec_per_step"] * 1e3, 3)

    # deterministic forward value for the cross-engine check
    with jax.default_matmul_precision("highest"):
        (o, *_), _ = jax.jit(
            lambda: gen.apply(
                gvars, pre_seq, b["extended_word_seq"], b["mfcc_features"],
                b["vid_indices"], train=True,
                rngs={"noise": k1, "dropout": k2}, mutable=["batch_stats"],
            )
        )()
    out["fwd_checksum"] = float(jnp.sum(o))
    out["fwd_first"] = [float(x) for x in np.asarray(o[0, 0, :4])]

    train_step = setup["train_step"]

    def step(carry):
        st, k = carry
        k, sub = jax.random.split(k)
        st, _ = train_step(st, b, sub, gan_on=True)
        return st, k

    def make():
        return jax.tree.map(jnp.copy, state), jax.random.key(1)

    res = timing.time_compiled_step(step, make, windows=windows, reps=reps)
    out["full_step_ms"] = round(res["sec_per_step"] * 1e3, 3)
    out["steps_per_sec"] = round(res["steps_per_sec"], 2)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--one", action="store_true")
    p.add_argument("--engines", default="scan,pallas")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--windows", default="20,60")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)
    windows = tuple(int(w) for w in args.windows.split(","))

    if args.one:
        print(json.dumps(run_one(args.batch_size, windows, args.reps)),
              flush=True)
        return

    for engine in args.engines.split(","):
        env = dict(os.environ, S2AG_GRU_ENGINE=engine)
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               "--batch-size", str(args.batch_size),
               "--windows", args.windows, "--reps", str(args.reps)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=2400)
        print((out.stdout.strip().splitlines() or ["<no output>"])[-1],
              flush=True)
        if out.returncode != 0:
            print(out.stderr[-3000:], file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
