"""v1 training paths: SER classification + emotion-conditioned s2eg GAN.

Capability parity with reference `processor.py` (the legacy joint trainer):
- `forward_pass_ser` (:616-637): CrossEntropy on AttConvRNN logits (or L1 +
  temporal-difference L1 for dimensional labels), argmax one-hot output;
- `forward_pass_s2eg` (:681-836): the same GAN shape as v2 where G and D
  additionally take the emotion one-hot;
- SER optimizer choices (:238-248): SGD(momentum 0.9, nesterov, wd) or Adam.

Both steps compile to single XLA programs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from . import gan_step, losses
from .gan_step import GanConfig, build_pre_seq


def make_ser_optimizer(kind: str = "sgd", lr: float = 1e-3,
                       weight_decay: float = 5e-4, nesterov: bool = True):
    if kind == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(lr, momentum=0.9, nesterov=nesterov),
        )
    if kind == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(lr)
        )
    raise ValueError(kind)


def make_ser_train_step(ser_apply: Callable, optimizer,
                        emo_as_cats: bool = True):
    """(params, stats, opt_state, batch {data (B,H,W,C), labels}, rng)
    -> updated (params, stats, opt_state), metrics."""

    @jax.jit
    def step(params, stats, opt_state, data, labels, rng):
        def loss_fn(p, s):
            logits, mut = ser_apply(
                {"params": p, "batch_stats": s}, data, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            if emo_as_cats:
                loss = optax.softmax_cross_entropy(
                    logits, labels.astype(logits.dtype)
                ).mean()
            else:
                loss = jnp.abs(logits - labels).mean() + jnp.abs(
                    (logits[1:] - logits[:-1]) - (labels[1:] - labels[:-1])
                ).mean()
            return loss, (mut["batch_stats"], logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pred = jnp.argmax(logits, axis=-1)
        accuracy = (pred == jnp.argmax(labels, axis=-1)).mean()
        return params, stats, opt_state, {"loss": loss, "accuracy": accuracy}

    return step


def make_ser_eval_step(ser_apply: Callable):
    @jax.jit
    def step(params, stats, data, labels):
        logits = ser_apply({"params": params, "batch_stats": stats}, data,
                           train=False)
        pred = jnp.argmax(logits, axis=-1)
        one_hot = jax.nn.one_hot(pred, logits.shape[-1])
        accuracy = (pred == jnp.argmax(labels, axis=-1)).mean()
        return pred, one_hot, accuracy

    return step


def make_s2eg_train_step(gen_apply: Callable, dis_apply: Callable,
                         cfg: GanConfig):
    """v1 GAN step: generator/discriminator signatures carry in_emo_labels
    (ref forward_pass_s2eg, processor.py:681-836)."""
    gopt, dopt = gan_step.make_optimizers(cfg)

    def gen_fwd(params, stats, pre_seq, text, audio, emo, vids, rng):
        r_noise, r_drop = jax.random.split(rng)
        (out, z, mu, logvar), mut = gen_apply(
            {"params": params, "batch_stats": stats},
            pre_seq, text, audio, emo, vids, train=True,
            rngs={"noise": r_noise, "dropout": r_drop},
            mutable=["batch_stats"],
        )
        return out, z, mu, logvar, mut["batch_stats"]

    def dis_fwd(params, stats, poses, emo, rng):
        prob, mut = dis_apply(
            {"params": params, "batch_stats": stats}, poses, emo,
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return prob, mut["batch_stats"]

    @partial(jax.jit, static_argnames=("gan_on",))
    def step(state, batch, rng, gan_on: bool = True):
        text, audio = batch["extended_word_seq"], batch["audio"]
        emo, target = batch["emo_labels"], batch["vec_seq"]
        vids = batch.get("vid_indices")
        pre_seq = build_pre_seq(target, cfg.n_pre_poses)
        rngs = jax.random.split(rng, 6)
        gen_stats, dis_stats = state.gen_stats, state.dis_stats
        dis_params, dis_opt = state.dis_params, state.dis_opt
        metrics = {}

        if gan_on and cfg.loss_gan_weight > 0.0:
            fake, *_, gen_stats = gen_fwd(
                state.gen_params, gen_stats, pre_seq, text, audio, emo, vids,
                rngs[0],
            )
            fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(dp, dstats):
                d_real, dstats = dis_fwd(dp, dstats, target, emo, rngs[1])
                d_fake, dstats = dis_fwd(dp, dstats, fake, emo, rngs[2])
                return losses.dis_ns_gan(d_real, d_fake), dstats

            (d_loss, dis_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(dis_params, dis_stats)
            d_updates, dis_opt = dopt.update(d_grads, dis_opt, dis_params)
            dis_params = optax.apply_updates(dis_params, d_updates)
            metrics["dis"] = d_loss

        def g_loss_fn(gp, gstats, dstats):
            out, z, mu, logvar, gstats = gen_fwd(
                gp, gstats, pre_seq, text, audio, emo, vids, rngs[3]
            )
            huber = losses.scaled_huber(out, target, beta=0.1)
            loss = cfg.loss_regression_weight * huber
            aux = {"loss": cfg.loss_regression_weight * huber}
            if cfg.z_type == "speaker" and cfg.loss_reg_weight > 0.0:
                rand_vids = gan_step.draw_other_speaker_ids(
                    rngs[4], vids, cfg.n_speakers
                )
                out_rand, z_rand, *_, gstats = gen_fwd(
                    gp, gstats, pre_seq, text, audio, emo, rand_vids, rngs[5]
                )
                div = losses.diversity_regularizer(out, out_rand, z, z_rand)
                kld = losses.kld_speaker(mu, logvar)
                loss = loss + cfg.loss_reg_weight * div + cfg.loss_kld_weight * kld
                aux["DIV_REG"] = cfg.loss_reg_weight * div
                aux["KLD"] = cfg.loss_kld_weight * kld
            if gan_on and cfg.loss_gan_weight > 0.0:
                d_out, dstats = dis_fwd(dis_params, dstats, out, emo, rngs[2])
                gen_err = losses.gen_ns_gan(d_out)
                loss = loss + cfg.loss_gan_weight * gen_err
                aux["gen"] = cfg.loss_gan_weight * gen_err
            aux["s2eg_l1"] = losses.l1(out, target)
            return loss, (gstats, dstats, aux)

        (g_loss, (gen_stats, dis_stats, aux)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.gen_params, gen_stats, dis_stats)
        g_updates, gen_opt = gopt.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        metrics.update(aux)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_stats=gen_stats, gen_opt=gen_opt,
            dis_params=dis_params, dis_stats=dis_stats, dis_opt=dis_opt,
        )
        return new_state, metrics

    return step
