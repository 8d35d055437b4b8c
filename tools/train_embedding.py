"""Train the FGD gesture-embedding autoencoder and export it.

The reference consumes a pre-trained `outputs/embedding_net.pth.tar`
(net/embedding_space_evaluator.py:20-27) but ships no code to produce
one, so users bringing a new dataset cannot compute FGD at all. This CLI
closes the loop end-to-end:

    python tools/train_embedding.py --base-path DATA --config config/
        multimodal_context_v2.yml --epochs 20 --out embedding_net.pth.tar

trains `models/embedding_net.EmbeddingNet` (mode='pose') on the training
split's pose windows (train/embedding_trainer.py: one jitted donated Adam
step, dataset staged on-device) and writes BOTH formats:

- <out>.npz             — framework-native flax variables;
- <out> (.pth.tar)      — the reference's exact checkpoint layout
                          ({'embedding_dict': state_dict}), via the
                          reverse converter (convert/jax_to_torch.py), so
                          the reference harness can score with it too.

--synthetic-data trains on the synthetic corpus (no TED data needed; for
smoke-testing the pipeline).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.train.embedding_trainer import (
    train_pose_embedding,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--base-path", default=None,
                   help="TED db base path (as main_v2 --base-path)")
    p.add_argument("--config", default="config/multimodal_context_v2.yml")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--variational", action="store_true")
    p.add_argument("--max-windows", type=int, default=50000,
                   help="cap on training windows (device-memory bound)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="embedding_net.pth.tar")
    args = p.parse_args(argv)

    cfg = ModelConfig.from_yaml(args.config) if os.path.exists(args.config) \
        else ModelConfig()
    if args.synthetic_data or not args.base_path:
        videos = ted_db.make_synthetic_videos(n_videos=6, clip_seconds=12.0)
        ds = ted_db.build_dataset_from_videos(videos, cfg)
    else:
        ds = ted_db.load_ted_db_data(args.base_path, cfg)["train"]

    idx = np.arange(min(args.max_windows, ds.n_samples))
    windows = np.asarray(ted_db.decode_rows(ds, idx)["vec_seq"], np.float32)
    print(f"training on {len(windows)} pose windows "
          f"({args.epochs} epochs, bs {args.batch_size})", flush=True)
    result = train_pose_embedding(
        windows, epochs=args.epochs, batch_size=args.batch_size,
        learning_rate=args.learning_rate, variational=args.variational,
        seed=args.seed, log_every=1,
    )
    print(f"final reconstruction loss {result['final_loss']:.6f}")

    variables = result["variables"]
    flat = {}
    for scope, tree in variables.items():
        for path, leaf in _walk(tree):
            flat[f"{scope}/{path}"] = np.asarray(leaf)
    np.savez(args.out + ".npz", **flat)
    print(f"wrote {args.out}.npz (flax variables)")

    from speech2affective_gestures_tpu.convert import jax_to_torch as rev

    sd = rev.embedding_net_pose_inv(variables)
    try:
        rev.save_pth_tar({"embedding_dict": sd}, args.out)
        print(f"wrote {args.out} (reference embedding_net.pth.tar layout)")
    except ImportError:
        np.savez(args.out + ".statedict.npz", **sd)
        print(f"torch unavailable: wrote {args.out}.statedict.npz instead")


def _walk(tree, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if hasattr(v, "items"):
            yield from _walk(v, path)
        else:
            yield path, v


if __name__ == "__main__":
    main()
