"""The jitted GAN training step (the hot loop).

Functional re-design of reference `processor_v2.py:776-957`
(`forward_pass_s2ag`): one compiled step performs the D update followed by
the G update (Huber + KLD + diversity regularizer + ns-GAN), exactly
mirroring the reference's stop-gradient placement (`.detach()` at
processor_v2.py:809,913,918) and its BatchNorm running-stat update order
(every train-mode forward updates stats, threaded sequentially).

TPU-first properties:
- the whole step is one XLA program: no Python between D and G updates, no
  host sync until metrics are fetched;
- both optimizers are optax.adam(betas=(0.5, 0.999)) states carried in a
  single pytree TrainState (the reference re-creates CUDA grads each step);
- under a `jax.sharding.Mesh` the same step runs data-parallel: batch
  sharded on the 'data' axis, params replicated, gradients reduced by XLA
  collectives — subsuming nn.DataParallel (processor_v2.py:167-172).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import constants as C
from . import losses


@dataclasses.dataclass(frozen=True)
class GanConfig:
    """Loss/optimizer hyper-parameters (config/multimodal_context_v2.yml:28-36
    + parse_args.py defaults)."""

    loss_regression_weight: float = 500.0
    loss_gan_weight: float = 5.0
    loss_kld_weight: float = 0.1
    loss_reg_weight: float = 0.05
    loss_warmup: int = 0
    learning_rate: float = 5e-4
    discriminator_lr_weight: float = 0.2
    z_type: str = "speaker"
    n_pre_poses: int = C.N_PRE_POSES
    # size of the speaker vocab; when >1 the diversity regularizer draws a
    # FRESH random speaker id excluding each sample's own (the reference's
    # np.setdiff1d draw, processor_v2.py:625-636). 0 falls back to an
    # in-batch permutation (only used when the vocab size is unknown).
    n_speakers: int = 0
    # diversity-regularizer second-pass speaker ids: 'permutation' (default)
    # reproduces the reference's torch.randperm over the in-batch ids EXACTLY
    # (processor_v2.py:902-903), fix-points and all — reference parity, like
    # every other default in this config (gradient_clip, lr_decay); 'fresh'
    # is the documented opt-in improvement: a uniform draw over the vocab
    # excluding each sample's own id, which can never fix-point (a sample
    # drawing itself makes its div-reg term degenerate). Recorded in
    # README.md parity notes.
    divreg_draw: str = "permutation"
    # which batch field feeds the generator's audio input: 'mfcc_features'
    # for the paper model, 'audio' for the abl_audio WavEncoder ablation
    generator_input: str = "mfcc_features"
    # optional global-norm gradient clipping (the reference parses
    # --gradient-clip but never applies it; 0.0 = off = reference parity)
    gradient_clip: float = 0.0
    # optional per-epoch exponential LR decay lr*decay**epoch (the
    # reference's adjust_lr_s2ag call is commented out at
    # processor_v2.py:991; 1.0 = off = reference parity). Applied as a
    # step-indexed schedule, so decay_steps_per_epoch must be set too.
    # NOTE: optax schedules count OPTIMIZER UPDATES, and the discriminator
    # only starts updating after the GAN warmup (loss_warmup epochs), so the
    # D schedule's "epoch" index lags the wall-clock epoch by the warmup
    # length. Epoch-indexed decay would need the epoch threaded into the
    # step; the offset is tiny (warmup defaults to 0) and documented here.
    lr_decay: float = 1.0
    decay_steps_per_epoch: int = 0
    # fuse same-parameter forwards into single double-batch calls: the
    # G-step main + diversity-regularizer generator forwards become ONE
    # 2B-batch forward (they share every input except the speaker ids,
    # processor_v2.py:899-906), and the D-step real+fake discriminator
    # forwards become ONE 2B-batch forward. Opt-in (like mixed precision):
    # BatchNorm train statistics are then computed over the 2B concat
    # instead of two sequential B batches (one running-stat momentum update
    # instead of two) and the per-sample noise/dropout draws come from one
    # 2B-shaped draw, so trajectories diverge from the reference at the
    # stochastic level while every loss term keeps its exact formula.
    # Default off = reference parity.
    fused_pass: bool = False
    # rematerialization of the network forwards inside the gradient passes:
    # 'none' (default — XLA keeps all backward residuals in HBM, exactly the
    # torch autograd behavior), 'full' (jax.checkpoint with the default
    # save-nothing policy: the backward re-runs each forward instead of
    # reading stored activations — trades FLOPs, of which the
    # traffic-bound step has ~7x headroom, for HBM activation traffic),
    # 'dots' (dots_with_no_batch_dims_saveable: matmul/conv outputs are
    # kept, only the elementwise chains between them recompute). Numerics
    # are unchanged (same forward values, same gradients — remat only moves
    # WHERE residuals come from), so unlike fused_pass this is
    # trajectory-preserving; see docs/PERFORMANCE.md for the measured A/B.
    remat: str = "none"

    @property
    def lr_dis(self) -> float:
        return self.learning_rate * self.discriminator_lr_weight


def _lr_schedule(base_lr: float, cfg: "GanConfig"):
    if cfg.lr_decay != 1.0 and cfg.decay_steps_per_epoch > 0:
        return lambda step: base_lr * cfg.lr_decay ** (
            step // cfg.decay_steps_per_epoch
        )
    return base_lr


def make_optimizers(cfg: "GanConfig"):
    """The G/D Adam pair (ref processor_v2.py:215-220: Adam(lr, 0.5, 0.999)
    and Adam(lr*0.2)), optionally wrapped with global-norm clipping and a
    per-epoch exponential LR schedule (both default-off, see GanConfig)."""
    def one(base_lr):
        tx = optax.adam(_lr_schedule(base_lr, cfg), b1=0.5, b2=0.999)
        if cfg.gradient_clip > 0.0:
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.gradient_clip), tx
            )
        return tx

    return one(cfg.learning_rate), one(cfg.lr_dis)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    gen_stats: Any
    gen_opt: Any
    dis_params: Any
    dis_stats: Any
    dis_opt: Any
    tri_params: Any = None   # frozen trimodal baseline (comparison only)
    tri_stats: Any = None


def build_pre_seq(target_poses: jax.Array, n_pre_poses: int) -> jax.Array:
    """(B, T, D) targets -> (B, T, D+1) seed sequence: first n_pre_poses
    frames + constraint bit (ref processor_v2.py:784-788)."""
    b, t, d = target_poses.shape
    mask = (jnp.arange(t) < n_pre_poses).astype(target_poses.dtype)[None, :, None]
    poses = jnp.concatenate(
        [target_poses, jnp.ones((b, t, 1), target_poses.dtype)], axis=-1
    )
    return poses * mask


def draw_other_speaker_ids(key: jax.Array, vids: jax.Array,
                           n_speakers: int) -> jax.Array:
    """Fresh uniform draw over the speaker vocab, excluding each sample's
    current id, for the diversity-regularizer second pass.

    The reference permutes the batch's ids (torch.randperm,
    processor_v2.py:902-903), which can fix-point (same id -> z-distance ~0
    -> degenerate div-reg term for that sample) with small batches or few
    speakers; a fresh exclude-current draw has the same intent (ids drawn
    from the setdiff pool like yield_batch's, processor_v2.py:625-636) and
    is provably never degenerate. Drawing in [0, V-1) and shifting past the
    current id keeps it one on-device op. Falls back to an in-batch
    permutation when the vocab size is unknown (n_speakers == 0)."""
    if n_speakers > 1:
        draw = jax.random.randint(key, vids.shape, 0, n_speakers - 1,
                                  dtype=vids.dtype)
        return draw + (draw >= vids).astype(vids.dtype)
    perm = jax.random.permutation(key, vids.shape[0])
    return vids[perm]


def create_train_state(
    gen_variables, dis_variables, cfg: GanConfig, tri_variables=None
) -> TrainState:
    gopt, dopt = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_variables["params"],
        gen_stats=gen_variables.get("batch_stats", {}),
        gen_opt=gopt.init(gen_variables["params"]),
        dis_params=dis_variables["params"],
        dis_stats=dis_variables.get("batch_stats", {}),
        dis_opt=dopt.init(dis_variables["params"]),
        tri_params=None if tri_variables is None else tri_variables["params"],
        tri_stats=None if tri_variables is None else
        tri_variables.get("batch_stats", {}),
    )


def make_train_step(
    gen_apply: Callable,
    dis_apply: Callable,
    cfg: GanConfig,
    tri_apply: Callable | None = None,
) -> Callable:
    """Returns train_step(state, batch, rng, gan_on) -> (state, metrics).

    gen_apply(variables, pre_seq, in_text, in_mfcc, vids, train, rngs,
    mutable) and dis_apply(variables, poses, in_text, train, mutable) are
    flax apply fns; `gan_on` is a static bool implementing the warmup gate
    `epoch > loss_warmup` (ref processor_v2.py:793,936).
    """
    gopt, dopt = make_optimizers(cfg)

    def gen_fwd(params, stats, pre_seq, in_text, in_mfcc, vids, rng):
        r_noise, r_drop = jax.random.split(rng)
        (out, z, mu, logvar), mut = gen_apply(
            {"params": params, "batch_stats": stats},
            pre_seq, in_text, in_mfcc, vids,
            train=True,
            rngs={"noise": r_noise, "dropout": r_drop},
            mutable=["batch_stats"],
        )
        return out, z, mu, logvar, mut["batch_stats"]

    def draw_other_speakers(key, vids):
        n = 0 if cfg.divreg_draw == "permutation" else cfg.n_speakers
        return draw_other_speaker_ids(key, vids, n)

    def dis_fwd(params, stats, poses, in_text, rng):
        prob, mut = dis_apply(
            {"params": params, "batch_stats": stats},
            poses, in_text,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return prob, mut["batch_stats"]

    if cfg.remat not in ("none", "full", "dots"):
        raise ValueError(f"unknown remat mode {cfg.remat!r}")
    if cfg.remat != "none":
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if cfg.remat == "dots" else None)
        gen_fwd = jax.checkpoint(gen_fwd, policy=policy)
        dis_fwd = jax.checkpoint(dis_fwd, policy=policy)

    # the TrainState (params + both Adam states, arg 0) is DONATED: its
    # HBM buffers are reused for the updated state instead of allocating a
    # second copy each step. Callers must treat the passed-in state as
    # consumed (the trainer's `state = train_step(state, ...)` pattern).
    # No-op on backends without donation support (CPU tests).
    #
    # tri_metric (static): compute the frozen-trimodal comparison metric
    # this step. The reference runs that forward EVERY train step purely
    # for logging (processor_v2.py:821); it is ~8% of the step's device
    # time (tools/profile_step.py), so the trainer can gate it to every
    # K-th step via --trimodal-metric-interval. True = reference parity.
    @partial(jax.jit, static_argnames=("gan_on", "tri_metric"),
             donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array,
                   gan_on: bool = True, tri_metric: bool = True):
        in_text = batch["extended_word_seq"]
        target = batch["vec_seq"]
        in_mfcc = batch[cfg.generator_input]
        in_audio = batch.get("audio")
        vids = batch.get("vid_indices")
        pre_seq = build_pre_seq(target, cfg.n_pre_poses)

        rngs = jax.random.split(rng, 6)
        gen_stats = state.gen_stats
        dis_stats = state.dis_stats
        metrics = {}

        # ------------------------------------------------ D update
        dis_params = state.dis_params
        dis_opt = state.dis_opt
        if gan_on and cfg.loss_gan_weight > 0.0:
            fake, *_, gen_stats = gen_fwd(
                state.gen_params, gen_stats, pre_seq, in_text, in_mfcc, vids,
                rngs[0],
            )
            fake = jax.lax.stop_gradient(fake)

            if cfg.fused_pass:
                bsz = target.shape[0]
                text2 = jnp.concatenate([in_text, in_text], axis=0)

                def d_loss_fn(dp, dstats):
                    d_both, dstats = dis_fwd(
                        dp, dstats, jnp.concatenate([target, fake], axis=0),
                        text2, rngs[1],
                    )
                    return losses.dis_ns_gan(d_both[:bsz], d_both[bsz:]), dstats
            else:
                def d_loss_fn(dp, dstats):
                    d_real, dstats = dis_fwd(dp, dstats, target, in_text,
                                             rngs[1])
                    d_fake, dstats = dis_fwd(dp, dstats, fake, in_text,
                                             rngs[2])
                    return losses.dis_ns_gan(d_real, d_fake), dstats

            (d_loss, dis_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(dis_params, dis_stats)
            d_updates, dis_opt = dopt.update(d_grads, dis_opt, dis_params)
            dis_params = optax.apply_updates(dis_params, d_updates)
            metrics["dis"] = d_loss

        # ------------------------------------------------ G update
        div_reg_on = (cfg.z_type in ("speaker", "random")
                      and cfg.loss_reg_weight > 0.0)
        # fused_pass: the main and div-reg forwards share pre_seq/text/mfcc
        # and differ only in speaker ids, so they run as ONE 2B forward and
        # split after (see GanConfig.fused_pass for the BN/RNG caveats)
        fuse_g = cfg.fused_pass and div_reg_on

        def g_loss_fn(gp, gstats, dstats):
            if fuse_g:
                bsz = target.shape[0]
                if cfg.z_type == "speaker":
                    rand_vids = draw_other_speakers(rngs[4], vids)
                    vids2 = jnp.concatenate([vids, rand_vids], axis=0)
                else:  # 'random': z is drawn fresh per sample either way
                    vids2 = (None if vids is None
                             else jnp.concatenate([vids, vids], axis=0))
                out2, z2, mu2, logvar2, gstats = gen_fwd(
                    gp, gstats,
                    jnp.concatenate([pre_seq, pre_seq], axis=0),
                    jnp.concatenate([in_text, in_text], axis=0),
                    jnp.concatenate([in_mfcc, in_mfcc], axis=0),
                    vids2, rngs[3],
                )
                out, out_rand = out2[:bsz], out2[bsz:]
                z, z_rand = z2[:bsz], z2[bsz:]
                mu = None if mu2 is None else mu2[:bsz]
                logvar = None if logvar2 is None else logvar2[:bsz]
            else:
                out, z, mu, logvar, gstats = gen_fwd(
                    gp, gstats, pre_seq, in_text, in_mfcc, vids, rngs[3]
                )
            huber = losses.scaled_huber(out, target, beta=0.1)
            loss = cfg.loss_regression_weight * huber
            aux_metrics = {"loss": cfg.loss_regression_weight * huber}

            if div_reg_on:
                if not fuse_g:
                    if cfg.z_type == "speaker":
                        rand_vids = draw_other_speakers(rngs[4], vids)
                    else:
                        rand_vids = None
                    out_rand, z_rand, *_, gstats = gen_fwd(
                        gp, gstats, pre_seq, in_text, in_mfcc, rand_vids,
                        rngs[5]
                    )
                div_reg = losses.diversity_regularizer(out, out_rand, z, z_rand)
                loss = loss + cfg.loss_reg_weight * div_reg
                aux_metrics["DIV_REG"] = cfg.loss_reg_weight * div_reg
                if cfg.z_type == "speaker":
                    kld = losses.kld_speaker(mu, logvar)
                    loss = loss + cfg.loss_kld_weight * kld
                    aux_metrics["KLD"] = cfg.loss_kld_weight * kld

            if gan_on and cfg.loss_gan_weight > 0.0:
                d_out, dstats_new = dis_fwd(
                    dis_params, dstats, out, in_text,
                    jax.random.fold_in(rngs[2], 1),
                )
                gen_err = losses.gen_ns_gan(d_out)
                loss = loss + cfg.loss_gan_weight * gen_err
                aux_metrics["gen"] = cfg.loss_gan_weight * gen_err
                dstats = dstats_new
            return loss, (gstats, dstats, out, aux_metrics)

        (g_loss, (gen_stats, dis_stats, out, aux_metrics)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.gen_params, gen_stats, dis_stats
            )
        )
        g_updates, gen_opt = gopt.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        metrics.update(aux_metrics)
        metrics["g_total"] = g_loss

        # -------------------------------------- trimodal comparison (frozen)
        s2ag_l1 = losses.l1(out, target)
        if tri_metric and tri_apply is not None and state.tri_params is not None:
            (tri_out, *_), _ = tri_apply(
                {"params": state.tri_params, "batch_stats": state.tri_stats},
                pre_seq, in_text, in_audio, vids,
                train=True,  # reference leaves the frozen net in train mode
                rngs={"noise": rngs[0], "dropout": rngs[1]},
                mutable=["batch_stats"],  # updates discarded
            )
            metrics["s2ag_vs_trimodal_l1"] = s2ag_l1 - losses.l1(tri_out, target)
        metrics["s2ag_l1"] = s2ag_l1

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_stats=gen_stats,
            gen_opt=gen_opt,
            dis_params=dis_params,
            dis_stats=dis_stats,
            dis_opt=dis_opt,
        )
        return new_state, metrics

    @partial(jax.jit, static_argnames=("gan_on",))
    def eval_step(state: TrainState, batch: dict, rng: jax.Array,
                  gan_on: bool = True):
        """Validation pass: eval-mode forwards (running BN stats, no dropout,
        no updates), same loss stack; ref per_val_epoch processor_v2.py:993-1030.

        Runs with f32 matmul precision: evaluation numbers (incl. converted
        reference checkpoints) must not carry the training path's
        bf16-multiply drift. Training itself keeps the fast TPU default.
        """
        with jax.default_matmul_precision("highest"):
            return _eval_step_body(state, batch, rng, gan_on)

    def _eval_step_body(state: TrainState, batch: dict, rng: jax.Array,
                        gan_on: bool):
        in_text = batch["extended_word_seq"]
        target = batch["vec_seq"]
        in_mfcc = batch[cfg.generator_input]
        in_audio = batch.get("audio")
        vids = batch.get("vid_indices")
        pre_seq = build_pre_seq(target, cfg.n_pre_poses)
        rngs = jax.random.split(rng, 4)

        def gen_eval(vids_in, key):
            return gen_apply(
                {"params": state.gen_params, "batch_stats": state.gen_stats},
                pre_seq, in_text, in_mfcc, vids_in,
                train=False, rngs={"noise": key},
            )

        def dis_eval(poses):
            return dis_apply(
                {"params": state.dis_params, "batch_stats": state.dis_stats},
                poses, in_text, train=False,
            )

        out, z, mu, logvar = gen_eval(vids, rngs[0])
        metrics = {}
        huber = losses.scaled_huber(out, target, beta=0.1)
        metrics["loss"] = cfg.loss_regression_weight * huber
        if cfg.z_type in ("speaker", "random") and cfg.loss_reg_weight > 0.0:
            if cfg.z_type == "speaker":
                rand_vids = draw_other_speakers(rngs[1], vids)
            else:
                rand_vids = None
            out_rand, z_rand, *_ = gen_eval(rand_vids, rngs[2])
            metrics["DIV_REG"] = cfg.loss_reg_weight * losses.diversity_regularizer(
                out, out_rand, z, z_rand
            )
            if cfg.z_type == "speaker":
                metrics["KLD"] = cfg.loss_kld_weight * losses.kld_speaker(mu, logvar)
        if gan_on and cfg.loss_gan_weight > 0.0:
            metrics["dis"] = losses.dis_ns_gan(dis_eval(target), dis_eval(out))
            metrics["gen"] = cfg.loss_gan_weight * losses.gen_ns_gan(dis_eval(out))

        s2ag_l1 = losses.l1(out, target)
        metrics["s2ag_l1"] = s2ag_l1
        if tri_apply is not None and state.tri_params is not None:
            tri_out, *_ = tri_apply(
                {"params": state.tri_params, "batch_stats": state.tri_stats},
                pre_seq, in_text, in_audio, vids,
                train=False, rngs={"noise": rngs[3]},
            )
            metrics["s2ag_vs_trimodal_l1"] = s2ag_l1 - losses.l1(tri_out, target)
        return out, metrics

    return train_step, eval_step
