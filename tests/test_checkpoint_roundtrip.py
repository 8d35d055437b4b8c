"""Reverse checkpoint converter (convert/jax_to_torch): round-trip proofs.

Closes the parity loop from both ends (round-3 verdict #7): a TPU-trained
model can be exported as a reference-format .pth.tar and scored in the
reference harness the day real data/checkpoints are available.

Guarantees pinned here:
- torch -> jax -> torch is bit-identical on every tensor the forward
  conversion reads (num_batches_tracked is the documented exception);
- the emitted state dict loads into the reference's own modules with
  strict=True (so the reference harness accepts it, processor_v2.py:357);
- jax -> torch -> jax is bit-identical for framework-native (TPU-trained)
  variable trees, including the ablation discriminator and the FGD
  embedding net from train/embedding_trainer.py.
"""

import numpy as np
import jax
import pytest
import torch

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.convert import jax_to_torch as rev
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.train import builder

from _reference_oracle import reference_v2_nets

pytestmark = pytest.mark.slow  # reference-module imports + model inits

torch.manual_seed(3)


def _assert_tree_identical(a, b, path=""):
    """Bit-identical pytree comparison (dict trees of arrays)."""
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        va, vb = a[k], b[k]
        if hasattr(va, "items"):
            _assert_tree_identical(va, vb, f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb), err_msg=f"{path}/{k}"
            )


class _Args:
    n_pre_poses = 4
    n_poses = 34
    hidden_size = 300
    hidden_size_s2eg = 300
    n_layers = 4
    dropout_prob = 0.3
    input_context = "both"
    freeze_wordembed = False
    wordembed_dim = 300


def _randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.data.normal_(0, 0.2)
            m.running_var.data.uniform_(0.6, 1.4)


def test_torch_jax_torch_roundtrip_s2ag():
    """Reference-born checkpoint: torch -> jax -> torch recovers every
    tensor bit-identically and loads back with strict=True."""
    ref = reference_v2_nets()
    if ref is None:
        pytest.skip("reference v2 nets not importable")

    class FakeVocab:
        n_words = 50

    FakeVocab.__name__ = "Vocab"
    rng = np.random.default_rng(0)
    table = rng.standard_normal((50, 300)).astype(np.float32)
    tgen = ref.PoseGenerator(_Args, 27, 50, 300, table, mfcc_length=71,
                             num_mfcc=37, time_steps=34, z_obj=FakeVocab())
    tdis = ref.AffDiscriminator(27)
    _randomize_bn(tgen)
    _randomize_bn(tdis)

    blob1 = {
        "gen_model_dict": {f"module.{k}": v.numpy()
                           for k, v in tgen.state_dict().items()},
        "dis_model_dict": {f"module.{k}": v.numpy()
                           for k, v in tdis.state_dict().items()},
    }
    gen_vars, dis_vars = ck.convert_s2ag_checkpoint(blob1)
    blob2 = rev.to_s2ag_checkpoint(gen_vars, dis_vars)

    for which, tmod in (("gen_model_dict", tgen), ("dis_model_dict", tdis)):
        sd1, sd2 = blob1[which], blob2[which]
        assert set(sd1) == set(sd2), set(sd1) ^ set(sd2)
        for k in sd1:
            if k.endswith("num_batches_tracked"):
                continue  # documented exception (jax_to_torch docstring)
            np.testing.assert_array_equal(sd1[k], np.asarray(sd2[k]),
                                          err_msg=f"{which}:{k}")
        # and the reference module accepts the emitted dict verbatim
        tmod.load_state_dict(
            {k.removeprefix("module."): torch.from_numpy(np.asarray(v))
             for k, v in sd2.items()}, strict=True)

    # jax side of the same loop: converting the emitted blob back gives
    # bit-identical variable trees
    gen2, dis2 = ck.convert_s2ag_checkpoint(blob2)
    _assert_tree_identical(gen_vars, gen2)
    _assert_tree_identical(dis_vars, dis2)


def test_jax_torch_jax_roundtrip_framework_native():
    """TPU-trained (framework-initialized) weights survive export+reimport
    bit-identically — s2ag and the abl_aff ConvDiscriminator variant."""
    cfg = ModelConfig(hidden_size=64, hidden_size_s2eg=64, n_layers=2)
    for variant in ("s2ag", "abl_aff"):
        setup = builder.init_training(
            cfg, jax.random.key(0), n_words=40, n_speakers=8,
            with_trimodal=False, variant=variant,
        )
        st = jax.device_get(setup["state"])
        gen_vars = {"params": st.gen_params, "batch_stats": st.gen_stats}
        dis_vars = {"params": st.dis_params, "batch_stats": st.dis_stats}
        blob = rev.to_s2ag_checkpoint(gen_vars, dis_vars, variant=variant)
        gen2, dis2 = ck.convert_s2ag_checkpoint(blob, variant=variant,
                                                n_layers=cfg.n_layers)
        _assert_tree_identical(
            jax.tree.map(np.asarray, gen_vars), gen2, variant)
        _assert_tree_identical(
            jax.tree.map(np.asarray, dis_vars), dis2, variant)


def test_embedding_net_roundtrip_and_file(tmp_path):
    """The FGD evaluator loop: train_pose_embedding output -> reference
    .pth.tar file -> back, bit-identical; file is torch.load'able."""
    from speech2affective_gestures_tpu.train.embedding_trainer import (
        train_pose_embedding,
    )

    rng = np.random.default_rng(1)
    windows = rng.standard_normal((8, 34, 27)).astype(np.float32)
    trained = train_pose_embedding(windows, epochs=1, batch_size=4)
    variables = trained["variables"]

    sd = rev.embedding_net_pose_inv(variables)
    path = str(tmp_path / "embedding_net.pth.tar")
    rev.save_pth_tar({"embedding_dict": sd}, path)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd2 = {k: v.numpy() for k, v in blob["embedding_dict"].items()}
    params, stats = ck.embedding_net_pose(sd2)
    _assert_tree_identical(
        jax.tree.map(np.asarray, variables["params"]), params)
    _assert_tree_identical(
        jax.tree.map(np.asarray, variables["batch_stats"]), stats)
