"""v1 CLI entry — joint SER (IEMOCAP) + emotion-conditioned s2eg training.

Equivalent of reference `main.py` + `processor.py` (the legacy pipeline; the
reference's own copy is bit-rotted — main.py:15 imports a nonexistent
`config.parse_args` — so this entry reproduces its *intended* flow):
train AttConvRNN on IEMOCAP mel blocks with CrossEntropy, then feed the
predicted one-hot emotions into the v1 generator/discriminator GAN.

`--synthetic-data true` substitutes random SER blocks + the synthetic TED
corpus so the path runs without either dataset.
"""

from __future__ import annotations

import argparse
import os
from os.path import join as jn

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .config import ModelConfig
from .data import iemocap, ted_db
from .models.discriminator import AffDiscriminatorV1
from .models.generator import PoseGeneratorV1
from .models.ser import AttConvRNN
from .train import ser_trainer
from .train.gan_step import GanConfig, create_train_state
from .train.logger import TrainLogger
from .main_v2 import str2bool

NUM_EMOTIONS = len(iemocap.EMOTIONS_07)


def build_parser():
    p = argparse.ArgumentParser(description="v1: SER + s2eg joint training")
    p.add_argument("-b", "--base-path", required=True, type=str)
    p.add_argument("-c", "--config", required=True, type=str)
    p.add_argument("--dataset-ser", type=str, default="iemocap")
    p.add_argument("--train-ser", type=str2bool, default=True)
    p.add_argument("--train-s2eg", type=str2bool, default=True)
    p.add_argument("--emo-as-cats", type=str2bool, default=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--ser-num-epoch", type=int, default=1)
    p.add_argument("--s2eg-num-epoch", type=int, default=1)
    p.add_argument("--base-lr", type=float, default=1e-3)
    p.add_argument("--optimizer", type=str, default="sgd")
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--nesterov", type=str2bool, default=True)
    p.add_argument("--synthetic-data", type=str2bool, default=False)
    # --- reference-CLI compatibility (main.py:40-122) ---
    # aliases for flags we name differently
    # (SUPPRESS: only override the primary flag's value when actually passed)
    p.add_argument("--base-lr-ser", type=float, dest="base_lr",
                   default=argparse.SUPPRESS,
                   help="alias of --base-lr (reference main.py:81)")
    p.add_argument("--ser-optimizer", type=str, dest="optimizer",
                   default=argparse.SUPPRESS,
                   help="alias of --optimizer (main.py:79)")
    # parsed-but-unused upstream (the v1 processor ignores them) or
    # meaningless off-GPU; accepted so reference command lines run verbatim
    for flag, typ, default in (
        ("--dataset-s2eg", str, "ted_db"),
        ("--frame-drop", int, 2),
        ("--add-mirrored", str2bool, False),
        ("--use-multiple-gpus", str2bool, True),
        ("--ser-load-last-best", str2bool, True),
        ("--s2eg-load-last-best", str2bool, True),
        ("--num-worker", int, 4),
        ("--ser-start-epoch", int, 0),
        ("--s2eg-start-epoch", int, 0),
        ("--base-tr", float, 1.0),
        ("--lr-ser-decay", float, 0.999),
        ("--lr-s2eg-decay", float, 0.999),
        ("--gradient-clip", float, 0.1),
        ("--momentum", float, 0.9),
        ("--upper-body-weight", float, 1.0),
        ("--affs-reg", float, 0.8),
        ("--quat-norm-reg", float, 0.1),
        ("--quat-reg", float, 1.2),
        ("--recons-reg", float, 1.2),
        ("--eval-interval", int, 1),
        ("--log-interval", int, 100),
        ("--save-interval", int, 10),
    ):
        p.add_argument(flag, type=typ, default=default,
                       help="no-op (reference-CLI compatibility)")
    p.add_argument("-dap", "--dataset-s2eg-already-processed",
                   type=str2bool, default=True,
                   help="no-op (reference-CLI compatibility)")
    p.add_argument("--step", nargs="*", default=None,
                   help="no-op (reference-CLI compatibility)")
    for flag in ("--no-cuda", "--pavi-log", "--print-log", "--save-log"):
        p.add_argument(flag, action="store_true", default=False,
                       help="no-op (reference-CLI compatibility)")
    return p


def _synthetic_ser_split(rng, n=64):
    data = rng.standard_normal((n, 300, 40, 3)).astype(np.float32)
    labels = np.eye(NUM_EMOTIONS, dtype=np.float32)[
        rng.integers(0, NUM_EMOTIONS, n)
    ]
    return data, labels


def main(argv=None):
    from . import compile_cache

    compile_cache.enable()  # see main_v2.main (S2AG_COMPILE_CACHE=0 = off)
    args = build_parser().parse_args(argv)
    cfg = ModelConfig.from_yaml(args.config, batch_size=args.batch_size)
    work_dir = jn(args.base_path, "models", "v1_ser_s2eg")
    os.makedirs(work_dir, exist_ok=True)
    logger = TrainLogger(work_dir)
    rng_np = np.random.default_rng(0)

    # ------------------------------------------------------------- SER
    ser = AttConvRNN(num_emotions=NUM_EMOTIONS, dropout_prob=0.2)
    if args.synthetic_data:
        train_x, train_y = _synthetic_ser_split(rng_np)
        val_x, val_y = _synthetic_ser_split(rng_np, 16)
    else:
        data = iemocap.load_iemocap_data(
            jn(args.base_path, "..", "data"), args.dataset_ser
        )
        train_x, train_y = data["train_data_wav"], data["train_labels_cat"]
        val_x, val_y = data["val_data_wav"], data["val_labels_cat"]

    variables = ser.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(train_x[:2]),
    )
    from .models.ser import apply_reference_init

    variables = apply_reference_init(variables, jax.random.key(42))
    params, stats = variables["params"], variables["batch_stats"]
    opt = ser_trainer.make_ser_optimizer(
        args.optimizer, args.base_lr, args.weight_decay, args.nesterov
    )
    opt_state = opt.init(params)
    train_step = ser_trainer.make_ser_train_step(
        ser.apply, opt, emo_as_cats=args.emo_as_cats
    )
    eval_step = ser_trainer.make_ser_eval_step(ser.apply)

    key = jax.random.key(2)
    if args.train_ser:
        for epoch in range(args.ser_num_epoch):
            perm = rng_np.permutation(len(train_x))
            for i in range(0, len(perm) - args.batch_size + 1, args.batch_size):
                idx = perm[i : i + args.batch_size]
                key, sub = jax.random.split(key)
                params, stats, opt_state, metrics = train_step(
                    params, stats, opt_state,
                    jnp.asarray(train_x[idx]), jnp.asarray(train_y[idx]), sub,
                )
            _, _, accu = eval_step(params, stats, jnp.asarray(val_x),
                                   jnp.asarray(val_y))
            logger.print_log(
                f"SER epoch {epoch}: loss {float(metrics['loss']):.4f} "
                f"val_accuracy {float(accu):.4f}"
            )

    # ------------------------------------------------------------- s2eg
    if args.train_s2eg:
        if args.synthetic_data:
            videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=8.0)
            ds = ted_db.build_dataset_from_videos(videos, cfg)
        else:
            splits = ted_db.load_ted_db_data(
                jn(args.base_path, "..", "data", "ted_db"), cfg
            )
            ds = splits["train"]

        n_words = ds.lang_model.n_words
        n_speakers = ds.speaker_model.n_words
        gen = PoseGeneratorV1(
            num_emotions=NUM_EMOTIONS, n_words=n_words, n_speakers=n_speakers,
            hidden_size=cfg.hidden_size, n_layers=cfg.n_layers,
            dropout_prob=cfg.dropout_prob, z_type=cfg.z_type,
        )
        dis = AffDiscriminatorV1(num_emotions=NUM_EMOTIONS, n_poses=cfg.n_poses)
        sampler = ted_db.BatchSampler(ds, cfg.batch_size, seed=1)
        batch = next(iter(sampler))
        pre = jnp.zeros((cfg.batch_size, cfg.n_poses, C.POSE_DIM + 1))
        emo0 = jnp.zeros((cfg.batch_size, NUM_EMOTIONS))
        gvars = gen.init(
            {"params": jax.random.key(3), "noise": jax.random.key(4)},
            pre, jnp.asarray(batch["extended_word_seq"]),
            jnp.asarray(batch["audio"]), emo0,
            jnp.asarray(batch["vid_indices"]),
        )
        dvars = dis.init(jax.random.key(5), jnp.asarray(batch["vec_seq"]), emo0)
        gan_cfg = GanConfig(
            learning_rate=cfg.learning_rate, z_type=cfg.z_type,
            n_pre_poses=cfg.n_pre_poses, n_speakers=n_speakers,
        )
        state = create_train_state(gvars, dvars, gan_cfg)
        step = ser_trainer.make_s2eg_train_step(gen.apply, dis.apply, gan_cfg)
        for epoch in range(args.s2eg_num_epoch):
            for batch in ted_db.BatchSampler(ds, cfg.batch_size, seed=epoch):
                # predicted emotions from the (frozen) SER model
                blocks = jnp.zeros(
                    (cfg.batch_size, 300, 40, 3), jnp.float32
                )  # placeholder features when no IEMOCAP-aligned audio
                _, emo_one_hot, _ = eval_step(
                    params, stats, blocks,
                    jnp.zeros((cfg.batch_size, NUM_EMOTIONS)),
                )
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                batch["emo_labels"] = emo_one_hot
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, sub, gan_on=True)
            logger.print_log(
                f"s2eg epoch {epoch}: "
                + " | ".join(f"{k}: {float(v):.4f}" for k, v in metrics.items())
            )
    return logger


if __name__ == "__main__":
    main()
