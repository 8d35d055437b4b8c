"""CLI entry point — the framework's equivalent of reference `main_v2.py`.

Same public flag surface (main_v2.py:31-98) and flow: parse run args + YAML
model config, create work/output dirs, load the TED-db splits, build the
trainer, train (optional), then run batch evaluation and long-clip
synthesis on the test samples.

Run: python -m speech2affective_gestures_tpu.main_v2 -b BASE_PATH \
         -c config/multimodal_context_v2.yml [--train-s2ag true] ...

Works without lmdb by passing `--synthetic-data true` (tests/demos), which
swaps the TED lmdb for the synthetic corpus generator.
"""

from __future__ import annotations

import argparse
import os
from os.path import join as jn

import numpy as np

from .config import ModelConfig
from .data import ted_db
from .train.evaluator import EmbeddingSpaceEvaluator
from .train.trainer import Trainer


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Speech to Emotive Gestures (TPU)")
    p.add_argument("-b", "--base-path", required=True, type=str)
    p.add_argument("-c", "--config", required=True, type=str)
    p.add_argument("--dataset-s2ag", type=str, default="ted_db")
    p.add_argument("--dataset-test", type=str, default="ted_db")
    p.add_argument("-dap", "--dataset-s2ag-already-processed",
                   type=str2bool, default=True)
    p.add_argument("--frame-drop", type=int, default=2)
    p.add_argument("--train-s2ag", type=str2bool, default=True)
    p.add_argument("--use-multiple-gpus", type=str2bool, default=True,
                   help="use every visible device via the data mesh")
    p.add_argument("--s2ag-load-last-best", type=str2bool, default=True)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--num-worker", type=int, default=4)
    p.add_argument("--s2ag-start-epoch", type=int, default=0)
    p.add_argument("--s2ag-num-epoch", type=int, default=500)
    # parsed for reference-CLI compatibility; the reference itself never
    # applies either (its adjust_lr_s2ag call is commented out,
    # processor_v2.py:991, and gradient-clip is parsed-and-dropped). Pass
    # --apply-lr-decay/--apply-gradient-clip true to actually enable them.
    p.add_argument("--lr-s2ag-decay", type=float, default=0.999)
    p.add_argument("--gradient-clip", type=float, default=0.1)
    p.add_argument("--apply-lr-decay", type=str2bool, default=False,
                   help="enable per-epoch exponential LR decay by "
                        "--lr-s2ag-decay (off = reference parity)")
    p.add_argument("--apply-gradient-clip", type=str2bool, default=False,
                   help="enable global-norm gradient clipping at "
                        "--gradient-clip (off = reference parity)")
    p.add_argument("--loader", type=str, default="device",
                   choices=("device", "grain"),
                   help="training input pipeline: 'device' keeps the packed "
                        "split in HBM with on-device gathers; 'grain' uses "
                        "the multiprocess checkpointable grain loader "
                        "(mid-epoch resume)")
    p.add_argument("--mixed-precision", type=str2bool, default=False,
                   help="bf16 training step (f32 master weights, f32 BN "
                        "stats, f32 eval) — the standard TPU recipe; "
                        "default off for bit-level reference parity")
    p.add_argument("--fused-pass", type=str2bool, default=False,
                   help="run the G-step main + div-reg generator forwards "
                        "as ONE 2B-batch forward and the D-step real+fake "
                        "discriminator forwards as ONE 2B-batch forward "
                        "(same loss formulas; BN batch stats over the 2B "
                        "concat and one 2B-shaped noise/dropout draw) — "
                        "default off for reference parity")
    p.add_argument("--divreg-draw", type=str, default="permutation",
                   choices=("permutation", "fresh"),
                   help="diversity-regularizer second-pass speaker draw: "
                        "'permutation' = reference-exact torch.randperm over "
                        "the in-batch ids (processor_v2.py:902-903, default); "
                        "'fresh' = uniform draw excluding each sample's own "
                        "id (never fix-points)")
    p.add_argument("--remat", type=str, default="none",
                   choices=("none", "full", "dots"),
                   help="rematerialize network forwards in the backward "
                        "pass (trajectory-preserving: identical values and "
                        "gradients; trades recompute FLOPs for HBM "
                        "activation traffic — see docs/PERFORMANCE.md)")
    p.add_argument("--metrics-lag", type=int, default=8,
                   help="device metrics may stay un-fetched for this many "
                        "steps so host dispatch runs ahead of the "
                        "per-step device->host sync (pure scheduling — "
                        "identical logged numbers; 0 = fetch every step)")
    p.add_argument("--steps-per-program", type=int, default=1,
                   help="run K train steps as ONE device program (lax.scan "
                        "over presampled batch indices, gather in-program): "
                        "one dispatch + one metrics fetch per K steps. Same "
                        "draws and step formulas as the per-step loop, "
                        "equal to float rounding (XLA compiles the scan "
                        "body with different fusion choices) — opt-in; 1 = "
                        "bit-level parity. Needs the single-device "
                        "'device' loader and trimodal-metric-interval 1")
    p.add_argument("--trimodal-metric-interval", type=int, default=1,
                   help="compute the frozen-trimodal comparison metric "
                        "every K-th train step (1 = every step = reference "
                        "parity; the forward is metric-only and ~8%% of "
                        "step time)")
    p.add_argument("--val-interval", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=200)
    p.add_argument("--save-interval", type=int, default=10)
    p.add_argument("--torch-checkpoint", type=str, default="",
                   help="optional reference .pth.tar to convert and load")
    p.add_argument("--trimodal-checkpoint", type=str, default="",
                   help="frozen TriModal baseline trimodal_gen.pth.tar "
                        "(reference loads outputs/trimodal_gen.pth.tar, "
                        "processor_v2.py:1033); without it the comparator "
                        "metric uses a random-init baseline")
    p.add_argument("--embedding-net-checkpoint", type=str, default="",
                   help="frozen FGD embedding net .pth.tar")
    p.add_argument("--synthetic-data", type=str2bool, default=False,
                   help="use the synthetic corpus instead of TED lmdb")
    p.add_argument("--synthetic-videos", type=int, default=4,
                   help="synthetic corpus size: number of videos "
                        "(~41 windows per 30 s of video at the paper's "
                        "stride; only with --synthetic-data)")
    p.add_argument("--synthetic-seconds", type=float, default=12.0,
                   help="synthetic corpus: seconds per video "
                        "(only with --synthetic-data)")
    p.add_argument("--packed-data", type=str, default="",
                   help="directory of a tools/export_ted_cache.py archive "
                        "(manifest.json + pickle shards) — loads the TED "
                        "splits without lmdb/pyarrow-0.14")
    p.add_argument("--print-log", action="store_true", default=True)
    p.add_argument("--save-log", action="store_true", default=True)
    # --- reference-CLI compatibility no-ops (main_v2.py:58-98) ---
    # The reference parses all of these and uses NONE of them in the v2
    # path (they are SGD-era leftovers: the s2ag optimizer is Adam with
    # hardcoded betas, processor_v2.py:215-220; pavi logging is stubbed
    # out in torchlight/io.py:33-49; no-cuda is meaningless on TPU).
    # Accepting them keeps every reference command line working verbatim.
    for flag, typ, default in (
        ("--base-tr", float, 1.0),
        ("--nesterov", str2bool, True),
        ("--momentum", float, 0.9),
        ("--weight-decay", float, 5e-4),
        ("--upper-body-weight", float, 1.0),
        ("--affs-reg", float, 0.8),
        ("--quat-norm-reg", float, 0.1),
        ("--quat-reg", float, 1.2),
        ("--recons-reg", float, 1.2),
    ):
        p.add_argument(flag, type=typ, default=default,
                       help="no-op (reference parses but never uses it)")
    p.add_argument("--step", nargs="*", default=None,
                   help="no-op (reference parses but never uses it)")
    p.add_argument("--no-cuda", action="store_true", default=False,
                   help="no-op (accelerator choice is JAX's)")
    p.add_argument("--pavi-log", action="store_true", default=False,
                   help="no-op (stubbed in the reference too)")
    return p


def load_datasets(args, cfg: ModelConfig):
    if args.synthetic_data:
        videos = ted_db.make_synthetic_videos(
            n_videos=args.synthetic_videos,
            clip_seconds=args.synthetic_seconds,
        )
        full = ted_db.build_dataset_from_videos(videos, cfg, keep_sidecars=True)
        n = full.n_samples
        cut1, cut2 = int(n * 0.7), int(n * 0.85)
        idx = np.arange(n)

        def subset(sel, sidecars=False):
            # sidecars (full-window words/poses/audio) power clip stitching
            # for the long-clip synthesis path — kept on the test split only
            return ted_db.PackedDataset(
                extended_word_seq=full.extended_word_seq[sel],
                vec_seq=full.vec_seq[sel],
                audio=full.audio[sel],
                audio_max=full.audio_max[sel],
                mfcc_features=full.mfcc_features[sel],
                vid_indices=full.vid_indices[sel],
                speaker_model=full.speaker_model,
                lang_model=full.lang_model,
                word_seqs=([full.word_seqs[i] for i in sel]
                           if sidecars and full.word_seqs is not None else None),
                aux_info=([full.aux_info[i] for i in sel]
                          if sidecars and full.aux_info is not None else None),
                pose_seqs=(full.pose_seqs[sel]
                           if sidecars and full.pose_seqs is not None else None),
                raw_audio=(full.raw_audio[sel]
                           if sidecars and full.raw_audio is not None else None),
                raw_audio_max=(full.raw_audio_max[sel]
                               if sidecars and full.raw_audio_max is not None
                               else None),
            )

        return (subset(idx[:cut1]), subset(idx[cut1:cut2]),
                subset(idx[cut2:], sidecars=True))
    if args.packed_data:
        splits = ted_db.load_exported_data(
            args.packed_data, cfg, load_train_val=args.train_s2ag
        )
        return splits.get("train"), splits.get("val"), splits.get("test")
    data_path = jn(args.base_path, "..", "data")
    splits = ted_db.load_ted_db_data(
        jn(data_path, args.dataset_s2ag), cfg, load_train_val=args.train_s2ag
    )
    return splits.get("train"), splits.get("val"), splits.get("test")


def main(argv=None, variant: str = "s2ag"):
    # persistent XLA compile cache: full-size GAN programs take minutes to
    # compile on this host class and the epoch loop is otherwise compile-
    # dominated for short runs (S2AG_COMPILE_CACHE=0 opts out)
    from . import compile_cache

    compile_cache.enable()
    args = build_parser().parse_args(argv)
    cfg = ModelConfig.from_yaml(args.config, batch_size=args.batch_size)

    suffix = {"s2ag": "", "abl_audio": "_abl_audio", "abl_aff": "_abl_aff"}[variant]
    models_s2ag_path = jn(args.base_path, "models", f"s2ag_v2_mfcc_tpu{suffix}")
    work_dir = jn(models_s2ag_path, args.dataset_s2ag)
    os.makedirs(work_dir, exist_ok=True)
    video_save_path = jn(args.base_path, "outputs", args.dataset_test,
                         "videos_trimodal_style")
    os.makedirs(video_save_path, exist_ok=True)

    train_data, val_data, test_data = load_datasets(args, cfg)

    evaluator = None
    if args.embedding_net_checkpoint:
        evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(
            args.embedding_net_checkpoint
        )

    trainer = Trainer(
        cfg, work_dir,
        train_data=train_data, val_data=val_data, test_data=test_data,
        use_mesh=args.use_multiple_gpus,
        val_interval=args.val_interval,
        save_interval=args.save_interval,
        seed=cfg.random_seed,
        evaluator=evaluator,
        variant=variant,
        gradient_clip=args.gradient_clip if args.apply_gradient_clip else 0.0,
        lr_decay=args.lr_s2ag_decay if args.apply_lr_decay else 1.0,
        loader=args.loader,
        trimodal_metric_interval=args.trimodal_metric_interval,
        mixed_precision=args.mixed_precision,
        divreg_draw=args.divreg_draw,
        fused_pass=args.fused_pass,
        remat=args.remat,
        metrics_lag=args.metrics_lag,
        steps_per_program=args.steps_per_program,
    )
    trainer.logger.save_arg(vars(args))
    if not args.apply_lr_decay:
        trainer.logger.print_log(
            "--lr-s2ag-decay accepted for compatibility but UNUSED (the "
            "reference's adjust_lr_s2ag call is commented out, "
            "processor_v2.py:991); pass --apply-lr-decay true to enable."
        )
    if not args.apply_gradient_clip:
        trainer.logger.print_log(
            "--gradient-clip accepted for compatibility but UNUSED (the "
            "reference parses and drops it); pass --apply-gradient-clip "
            "true to enable."
        )

    if args.trimodal_checkpoint:
        trainer.load_trimodal_torch_checkpoint(args.trimodal_checkpoint)
    else:
        default_tri = jn(args.base_path, "outputs", "trimodal_gen.pth.tar")
        if os.path.exists(default_tri):
            trainer.load_trimodal_torch_checkpoint(default_tri)
        else:
            trainer.logger.print_log(
                "Warning: no trimodal_gen.pth.tar — the s2ag_vs_trimodal "
                "comparison uses a random-init baseline."
            )

    if args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    elif args.s2ag_load_last_best:
        trainer.load_checkpoint(
            "best" if args.s2ag_start_epoch == 0 else args.s2ag_start_epoch
        )

    if args.train_s2ag:
        trainer.train(epochs=args.s2ag_num_epoch)

    if test_data is not None and test_data.n_samples > 0:
        trainer.generate_gestures(
            batch_size=min(2048, test_data.n_samples), randomized=False
        )
    return trainer


if __name__ == "__main__":
    main()
