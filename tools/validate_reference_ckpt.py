#!/usr/bin/env python
"""One-command released-checkpoint validation.

The reference's de-facto verification procedure (README.md:67-70): download
the pretrained s2ag model + FGD embedding net (+ frozen TriModal baseline),
run eval mode, and inspect FGD / joint MAE / acceleration-difference
(printed at processor_v2.py:1113-1140). This script performs exactly that
against THIS framework: converts the released `.pth.tar` files
(convert/torch_ckpt.py), scores the test split, and prints the metrics —
closing the BASELINE.md north-star gate (FGD parity) whenever the released
artifacts are present.

    python tools/validate_reference_ckpt.py \
        --model-checkpoint outputs/epoch_..._model.pth.tar \
        --embedding-net outputs/embedding_net.pth.tar \
        --trimodal outputs/trimodal_gen.pth.tar \
        --packed-data exported/            # or --synthetic-data for a dry run

Checkpoint layouts handled (with or without DataParallel 'module.'
prefixes, torchlight/torchlight/io.py:65-66):
  model      {'gen_model_dict', 'dis_model_dict'}   processor_v2.py:1064-1069
  trimodal   {'trimodal_gen_dict'}                  processor_v2.py:1033
  embedding  {'embedding_dict'}                     embedding_space_evaluator.py:20
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from speech2affective_gestures_tpu.config import ModelConfig  # noqa: E402
from speech2affective_gestures_tpu.data import ted_db  # noqa: E402
from speech2affective_gestures_tpu.train.evaluator import (  # noqa: E402
    EmbeddingSpaceEvaluator,
)
from speech2affective_gestures_tpu.train.trainer import Trainer  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="validate released reference "
                                            "checkpoints (eval-mode parity)")
    p.add_argument("--model-checkpoint", required=True,
                   help="released epoch_*_model.pth.tar")
    p.add_argument("--embedding-net", default="",
                   help="released embedding_net.pth.tar (enables FGD)")
    p.add_argument("--trimodal", default="",
                   help="released trimodal_gen.pth.tar (baseline comparator)")
    p.add_argument("-c", "--config", default="")
    p.add_argument("--packed-data", default="",
                   help="tools/export_ted_cache.py archive with a test split")
    p.add_argument("--lmdb-base", default="",
                   help="directory with the original TED lmdb caches")
    p.add_argument("--synthetic-data", action="store_true",
                   help="synthetic test corpus (pipeline dry run — metrics "
                        "are NOT comparable to the paper)")
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--full-test", action="store_true",
                   help="score the whole test split in chunks instead of "
                        "the reference's single <=2048 random draw")
    p.add_argument("--variant", default="s2ag",
                   choices=("s2ag", "abl_audio", "abl_aff"))
    p.add_argument("--json", action="store_true",
                   help="print metrics as one JSON line")
    return p


def load_test_split(args, cfg: ModelConfig):
    if args.synthetic_data:
        videos = ted_db.make_synthetic_videos(n_videos=3, clip_seconds=10.0)
        return ted_db.build_dataset_from_videos(videos, cfg, keep_sidecars=True)
    if args.packed_data:
        splits = ted_db.load_exported_data(args.packed_data, cfg,
                                           load_train_val=False)
        return splits["test"]
    if args.lmdb_base:
        splits = ted_db.load_ted_db_data(args.lmdb_base, cfg,
                                         load_train_val=False)
        return splits["test"]
    raise SystemExit("one of --packed-data / --lmdb-base / --synthetic-data "
                     "is required")


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    cfg = (ModelConfig.from_yaml(args.config) if args.config else ModelConfig())

    test_data = load_test_split(args, cfg)

    evaluator = None
    if args.embedding_net:
        evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(
            args.embedding_net
        )

    work_dir = os.path.join(
        os.path.dirname(os.path.abspath(args.model_checkpoint)),
        "validate_tpu",
    )
    trainer = Trainer(cfg, work_dir, test_data=test_data,
                      evaluator=evaluator, variant=args.variant)
    trainer.load_torch_checkpoint(args.model_checkpoint)
    if args.trimodal:
        trainer.load_trimodal_torch_checkpoint(args.trimodal)

    result = trainer.generate_gestures(
        batch_size=min(args.batch_size, test_data.n_samples),
        randomized=False, full_test=args.full_test,
    )
    header = ("reference-checkpoint validation "
              f"({'synthetic dry run' if args.synthetic_data else 'TED test'})")
    print(header)
    for key in ("FGD", "feat_dist", "joint_mae", "accel", "l1"):
        if key in result:
            print(f"  {key:>10}: {result[key]:.6f}")
    print("  compare against the reference printout of "
          "processor_v2.py:1113-1140 run with the same artifacts "
          "(north star: FGD within 1%, BASELINE.md).")
    if args.json:
        print(json.dumps({k: float(v) for k, v in result.items()}))
    return result


if __name__ == "__main__":
    main()
