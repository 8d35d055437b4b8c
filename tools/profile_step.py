"""Decompose the GAN train step's device time by component (run on TPU).

Slope-times (train/timing.py) each constituent of the step in isolation —
generator forward, forward+backward, discriminator forward(+backward),
trimodal forward, optimizer update — as dependent chains, so the honest
per-component device times account for the full step's ~17 ms and tell us
what to optimize. Chaining trick: each iteration's input is perturbed by
(previous scalar output * 0), forcing sequential execution without changing
the math.

Usage: python tools/profile_step.py [--batch-size 128] [--reps 3]
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
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)
    windows = tuple(int(w) for w in args.windows.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.train import builder, gan_step, losses, timing

    cfg = ModelConfig()
    setup = builder.init_training(cfg, jax.random.key(0),
                                  n_words=1000, n_speakers=100)
    gen, dis, tri = setup["gen"], setup["dis"], setup["tri"]
    state = setup["state"]
    b = jax.device_put(builder.synthetic_batch(
        np.random.default_rng(0), args.batch_size, cfg, 1000, 100))
    pre_seq = gan_step.build_pre_seq(b["vec_seq"], cfg.n_pre_poses)
    text, mfcc, audio = b["extended_word_seq"], b["mfcc_features"], b["audio"]
    vids, target = b["vid_indices"], b["vec_seq"]
    k1, k2 = jax.random.split(jax.random.key(7))

    gvars = {"params": state.gen_params, "batch_stats": state.gen_stats}
    dvars = {"params": state.dis_params, "batch_stats": state.dis_stats}
    tvars = {"params": state.tri_params, "batch_stats": state.tri_stats}

    results = {}

    def chain(name, fn):
        jfn = jax.jit(fn)

        def step(c):
            return jfn(c * 0.0)

        res = timing.time_compiled_step(step, jnp.zeros(()),
                                        windows=windows, reps=args.reps)
        results[name] = round(res["sec_per_step"] * 1e3, 3)
        print(json.dumps({name: results[name],
                          "samples_ms": [round(s * 1e3, 2)
                                         for s in res["slope_samples"]]}),
              flush=True)

    def gen_fwd(eps):
        (out, z, mu, lv), mut = gen.apply(
            gvars, pre_seq + eps, text, mfcc, vids, train=True,
            rngs={"noise": k1, "dropout": k2}, mutable=["batch_stats"],
        )
        return out.sum()

    def gen_fwd_bwd(eps):
        def loss_fn(params):
            (out, z, mu, lv), mut = gen.apply(
                {"params": params, "batch_stats": state.gen_stats},
                pre_seq + eps, text, mfcc, vids, train=True,
                rngs={"noise": k1, "dropout": k2}, mutable=["batch_stats"],
            )
            return losses.scaled_huber(out, target, beta=0.1)
        g = jax.grad(loss_fn)(state.gen_params)
        return jax.tree.leaves(g)[0].sum()

    def dis_fwd(eps):
        prob, mut = dis.apply(dvars, target + eps, text, train=True,
                              rngs={"dropout": k2}, mutable=["batch_stats"])
        return prob.sum()

    def dis_fwd_bwd(eps):
        def loss_fn(params):
            prob, mut = dis.apply(
                {"params": params, "batch_stats": state.dis_stats},
                target + eps, text, train=True,
                rngs={"dropout": k2}, mutable=["batch_stats"],
            )
            return losses.gen_ns_gan(prob)
        g = jax.grad(loss_fn)(state.dis_params)
        return jax.tree.leaves(g)[0].sum()

    def tri_fwd(eps):
        (out, *_), _ = tri.apply(
            tvars, pre_seq + eps, text, audio, vids, train=True,
            rngs={"noise": k1, "dropout": k2}, mutable=["batch_stats"],
        )
        return out.sum()

    def adam_updates(eps):
        # both optimizer updates + apply, isolated from the grads
        gopt, dopt = gan_step.make_optimizers(setup["gan_cfg"])
        fake_g = jax.tree.map(lambda p: p * 0 + eps, state.gen_params)
        up, _ = gopt.update(fake_g, state.gen_opt, state.gen_params)
        new_p = jax.tree.map(lambda a, b: a + b, state.gen_params, up)
        fake_d = jax.tree.map(lambda p: p * 0 + eps, state.dis_params)
        upd, _ = dopt.update(fake_d, state.dis_opt, state.dis_params)
        return (jax.tree.leaves(new_p)[0].sum()
                + jax.tree.leaves(upd)[0].sum())

    chain("gen_fwd_ms", gen_fwd)
    chain("gen_fwd_bwd_ms", gen_fwd_bwd)
    chain("dis_fwd_ms", dis_fwd)
    chain("dis_fwd_bwd_ms", dis_fwd_bwd)
    chain("tri_fwd_ms", tri_fwd)
    chain("adam_updates_ms", adam_updates)

    # the full step for reference
    train_step = setup["train_step"]

    def full(carry):
        st, k = carry
        k, sub = jax.random.split(k)
        st, _ = train_step(st, b, sub, gan_on=True)
        return st, k

    def make_carry():
        return jax.tree.map(jnp.copy, state), jax.random.key(1)

    res = timing.time_compiled_step(full, make_carry, windows=windows,
                                    reps=args.reps)
    results["full_step_ms"] = round(res["sec_per_step"] * 1e3, 3)

    # expected accounting: D-step = gen_fwd + 2x dis fwd+bwd-ish;
    # G-step = 2x gen fwd+bwd-ish + dis fwd+bwd; + tri fwd + adam
    print(json.dumps({"batch_size": args.batch_size, **results}), flush=True)


if __name__ == "__main__":
    main()
