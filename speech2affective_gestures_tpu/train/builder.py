"""Model/state assembly helpers shared by the trainer, benchmarks and tests.

Wires `ModelConfig` (the YAML namespace) to concrete flax modules and a
`TrainState`, matching the reference's Processor construction
(processor_v2.py:135-177): PoseGenerator + AffDiscriminator as the trainable
pair, PoseGeneratorTriModal as the frozen comparator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import ModelConfig
from ..models.discriminator import AffDiscriminator, ConvDiscriminator
from ..models.generator import PoseGenerator, PoseGeneratorTriModal
from .gan_step import GanConfig, create_train_state, make_train_step


def build_models(
    cfg: ModelConfig,
    n_words: int,
    n_speakers: int,
    word_embeddings: np.ndarray | None = None,
    pose_dim: int = C.POSE_DIM,
    variant: str = "s2ag",
):
    """variant in {'s2ag', 'abl_audio', 'abl_aff'} — the paper model and its
    two ablations (main_v2_abl_audio.py / main_v2_abl_aff.py)."""
    gen = PoseGenerator(
        pose_dim=pose_dim,
        n_words=n_words,
        word_embed_size=cfg.wordembed_dim,
        word_embeddings=word_embeddings,
        freeze_embedding=cfg.freeze_wordembed,
        mfcc_length=cfg.mfcc_length,
        num_mfcc=cfg.num_mfcc_combined,
        time_steps=cfg.n_poses,
        hidden_size=cfg.hidden_size_s2eg,
        n_layers=cfg.n_layers,
        dropout_prob=cfg.dropout_prob,
        input_context=cfg.input_context,
        z_type=cfg.z_type,
        n_speakers=n_speakers,
        audio_encoder_type="wav" if variant == "abl_audio" else "mfcc",
        use_aff_encoder=(variant != "abl_aff"),
    )
    if variant == "abl_aff":
        dis = ConvDiscriminator()
    else:
        dis = AffDiscriminator(n_poses=cfg.n_poses)
    tri = PoseGeneratorTriModal(
        pose_dim=pose_dim,
        n_words=n_words,
        word_embed_size=cfg.wordembed_dim,
        word_embeddings=word_embeddings,
        freeze_embedding=cfg.freeze_wordembed,
        hidden_size=cfg.hidden_size,
        n_layers=cfg.n_layers,
        dropout_prob=cfg.dropout_prob,
        input_context=cfg.input_context,
        z_type=cfg.z_type,
        n_speakers=n_speakers,
    )
    return gen, dis, tri


def synthetic_batch(rng: np.random.Generator, batch_size: int,
                    cfg: ModelConfig, n_words: int = 1000,
                    n_speakers: int = 100) -> dict:
    """Fixed-shape batch with the exact geometry of the packed TED-db cache
    (processor_v2.py:278-283) — for benchmarks, smoke tests and dry runs."""
    t = cfg.n_poses
    return {
        "extended_word_seq": rng.integers(0, n_words, (batch_size, t)).astype(np.int32),
        "vec_seq": (rng.standard_normal((batch_size, t, C.POSE_DIM)) * 0.1).astype(np.float32),
        "audio": (rng.standard_normal((batch_size, cfg.expected_audio_length)) * 0.1).astype(np.float32),
        "mfcc_features": rng.standard_normal(
            (batch_size, cfg.num_mfcc_combined, cfg.mfcc_length)
        ).astype(np.float32),
        "vid_indices": rng.integers(0, n_speakers, (batch_size,)).astype(np.int32),
    }


def mixed_precision_apply(apply_fn):
    """Wrap a flax apply fn for bf16 mixed-precision training.

    Master parameters stay f32 in the TrainState; per call, params and
    floating-point array inputs are cast to bf16 and every floating output
    is cast back to f32 (so losses, metrics and — via the differentiable
    casts — gradients are f32). BatchNorm running statistics are NOT cast:
    layers.BatchNorm computes its statistics in f32 regardless of the
    activation dtype (torch-AMP convention), so the running averages keep
    full precision across steps.
    """
    bf16, f32 = jnp.bfloat16, jnp.float32

    def cast_in(x):
        return x.astype(bf16) if getattr(x, "dtype", None) == f32 else x

    def cast_out(x):
        return x.astype(f32) if getattr(x, "dtype", None) == bf16 else x

    def wrapped(variables, *args, **kwargs):
        variables = dict(variables)
        variables["params"] = jax.tree.map(cast_in, variables["params"])
        args = tuple(jax.tree.map(cast_in, a) for a in args)
        out = apply_fn(variables, *args, **kwargs)
        return jax.tree.map(cast_out, out)

    return wrapped


def init_training(
    cfg: ModelConfig,
    rng: jax.Array,
    n_words: int = 1000,
    n_speakers: int = 100,
    word_embeddings: np.ndarray | None = None,
    with_trimodal: bool = True,
    variant: str = "s2ag",
    gradient_clip: float = 0.0,
    lr_decay: float = 1.0,
    decay_steps_per_epoch: int = 0,
    mixed_precision: bool = False,
    divreg_draw: str = "permutation",
    fused_pass: bool = False,
    remat: str = "none",
    abstract: bool = False,
):
    """Build modules, init variables, create TrainState + step fns.

    mixed_precision=True runs every network forward in bf16 (f32 master
    weights, f32 BN statistics, f32 losses/optimizer) — the standard TPU
    training recipe; default off for bit-level reference parity.

    abstract=True returns a state of ShapeDtypeStructs (the whole variable
    init runs under jax.eval_shape — no compile, no device work). Step fns
    are still returned and can be `.lower()`ed / `make_jaxpr`ed against the
    abstract state; used by train/flops.py for FLOP accounting."""
    gen, dis, tri = build_models(cfg, n_words, n_speakers, word_embeddings,
                                 variant=variant)
    batch = synthetic_batch(np.random.default_rng(0), 2, cfg, n_words, n_speakers)
    pre_seq = jnp.zeros((2, cfg.n_poses, C.POSE_DIM + 1), jnp.float32)
    gen_audio_key = "audio" if variant == "abl_audio" else "mfcc_features"

    def _init_vars(rng):
        k1, k2, k3, kn = jax.random.split(rng, 4)
        gen_vars = gen.init(
            {"params": k1, "noise": kn},
            pre_seq, jnp.asarray(batch["extended_word_seq"]),
            jnp.asarray(batch[gen_audio_key]), jnp.asarray(batch["vid_indices"]),
        )
        dis_vars = dis.init(k2, jnp.asarray(batch["vec_seq"]))
        tri_vars = None
        if with_trimodal:
            tri_vars = tri.init(
                {"params": k3, "noise": kn},
                pre_seq, jnp.asarray(batch["extended_word_seq"]),
                jnp.asarray(batch["audio"]), jnp.asarray(batch["vid_indices"]),
            )
        return gen_vars, dis_vars, tri_vars

    gan_cfg = GanConfig(
        loss_regression_weight=cfg.loss_regression_weight,
        loss_gan_weight=cfg.loss_gan_weight,
        loss_kld_weight=cfg.loss_kld_weight,
        loss_reg_weight=cfg.loss_reg_weight,
        loss_warmup=cfg.loss_warmup,
        learning_rate=cfg.learning_rate,
        discriminator_lr_weight=cfg.discriminator_lr_weight,
        z_type=cfg.z_type,
        n_pre_poses=cfg.n_pre_poses,
        n_speakers=n_speakers,
        generator_input=gen_audio_key,
        gradient_clip=gradient_clip,
        lr_decay=lr_decay,
        decay_steps_per_epoch=decay_steps_per_epoch,
        divreg_draw=divreg_draw,
        fused_pass=fused_pass,
        remat=remat,
    )
    def _init_state(rng):
        gen_vars, dis_vars, tri_vars = _init_vars(rng)
        return create_train_state(gen_vars, dis_vars, gan_cfg, tri_vars)

    # abstract: the whole init (variables + optimizer zeros) stays shape-
    # level under eval_shape — zero compiles, zero device buffers
    if abstract:
        state = jax.eval_shape(_init_state, rng)
    elif jax.default_backend() != "cpu":
        # eager init dispatches hundreds of tiny ops; on a remote-tunnel
        # accelerator (~30 ms RTT each) that is minutes of wall clock for
        # milliseconds of math (measured: 165 s on the axon v5e; host-CPU
        # eager init still cost 57-300 s of cold CPU compiles). One jitted
        # device program instead: a single compile, and — unlike eager —
        # one the persistent compile cache can make free on later runs.
        state = jax.jit(_init_state)(rng)
    else:
        state = _init_state(rng)
    tri_apply = tri.apply if with_trimodal else None
    if mixed_precision:
        # bf16 training step from wrapped applies; evaluation stays f32
        # (converted-checkpoint numbers must not carry activation-precision
        # drift), so eval_step is built from the raw applies
        train_step, _ = make_train_step(
            mixed_precision_apply(gen.apply),
            mixed_precision_apply(dis.apply),
            gan_cfg,
            mixed_precision_apply(tri_apply) if tri_apply else None,
        )
        _, eval_step = make_train_step(gen.apply, dis.apply, gan_cfg, tri_apply)
    else:
        train_step, eval_step = make_train_step(
            gen.apply, dis.apply, gan_cfg, tri_apply
        )
    return dict(
        gen=gen, dis=dis, tri=tri, state=state, gan_cfg=gan_cfg,
        train_step=train_step, eval_step=eval_step,
    )
