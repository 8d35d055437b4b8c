"""CLI: convert reference .pth.tar checkpoints into framework orbax format.

Usage:
  python tools/convert_checkpoint.py s2ag epoch_000290_loss_X_model.pth.tar out_dir
  python tools/convert_checkpoint.py trimodal trimodal_gen.pth.tar out_dir
  python tools/convert_checkpoint.py embedding embedding_net.pth.tar out_dir
"""

import sys

import numpy as np


def main():
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    from speech2affective_gestures_tpu.convert import torch_ckpt as ck

    blob = ck.load_pth_tar(src)
    if kind == "s2ag":
        gen_vars, dis_vars = ck.convert_s2ag_checkpoint(blob)
        out = {"gen": gen_vars, "dis": dis_vars}
    elif kind == "trimodal":
        p, s = ck.pose_generator_trimodal(blob["trimodal_gen_dict"])
        out = {"tri": {"params": p, "batch_stats": s}}
    elif kind == "embedding":
        p, s = ck.embedding_net_pose(blob["embedding_dict"])
        out = {"embedding": {"params": p, "batch_stats": s}}
    else:
        raise SystemExit(f"unknown kind {kind}")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dst, out, force=True)
    ckptr.wait_until_finished()
    n_arrays = sum(1 for _ in _leaves(out))
    print(f"converted {src} -> {dst} ({n_arrays} arrays)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, np.ndarray):
        yield tree


if __name__ == "__main__":
    main()
