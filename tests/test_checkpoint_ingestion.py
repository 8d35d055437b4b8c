"""File-level checkpoint ingestion: reference .pth.tar -> framework.

Covers the two load-bearing conversion paths end-to-end through actual
torch.save files:
- {'gen_model_dict','dis_model_dict'} -> Trainer.load_torch_checkpoint;
- {'embedding_dict'} -> EmbeddingSpaceEvaluator.from_torch_checkpoint,
  with full-forward parity against the reference's own EmbeddingNet
  (the FGD gate of BASELINE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.data import ted_db
from speech2affective_gestures_tpu.models.embedding_net import EmbeddingNet
from speech2affective_gestures_tpu.train.evaluator import EmbeddingSpaceEvaluator
from speech2affective_gestures_tpu.train.trainer import Trainer

from _reference_oracle import reference_v2_nets

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

HI = jax.default_matmul_precision("highest")
torch.manual_seed(9)


def _ref_embedding_net():
    if reference_v2_nets() is None:
        return None
    import importlib

    try:
        return importlib.import_module("net.embedding_net")
    except Exception:
        return None


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


def test_embedding_net_conversion_parity(rng):
    """The FGD evaluator's frozen net: converted weights must reproduce the
    reference EmbeddingNet(mode='pose') latents and reconstructions."""
    ref_en = _ref_embedding_net()
    if ref_en is None:
        pytest.skip("reference embedding_net not importable")
    tmod = ref_en.EmbeddingNet(_Args, 27, 34, n_words=50, word_embed_size=300,
                               word_embeddings=None, mode="pose")
    tmod.eval()
    for m in tmod.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.data.normal_(0, 0.2)
            m.running_var.data.uniform_(0.6, 1.4)

    poses = rng.standard_normal((4, 34, 27)).astype(np.float32) * 0.3
    pre = poses[:, :4]
    with torch.no_grad():
        (_, _, _, want_feat, _, _, want_recon) = tmod(
            None, None, torch.from_numpy(pre), torch.from_numpy(poses),
            "pose", variational_encoding=False,
        )

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = ck.embedding_net_pose(sd)
    mod = EmbeddingNet()
    with HI:
        (_, _, _, feat, _, _, recon) = mod.apply(
            {"params": params, "batch_stats": stats},
            None, None, jnp.asarray(pre), jnp.asarray(poses),
            variational_encoding=False, train=False,
        )
    np.testing.assert_allclose(np.asarray(feat), want_feat.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(recon), want_recon.numpy(),
                               rtol=2e-3, atol=3e-4)


def test_evaluator_from_torch_checkpoint_file(tmp_path, rng):
    ref_en = _ref_embedding_net()
    if ref_en is None:
        pytest.skip("reference embedding_net not importable")
    tmod = ref_en.EmbeddingNet(_Args, 27, 34, n_words=50, word_embed_size=300,
                               word_embeddings=None, mode="pose")
    path = str(tmp_path / "embedding_net.pth.tar")
    torch.save({"embedding_dict": tmod.state_dict()}, path)

    ev = EmbeddingSpaceEvaluator.from_torch_checkpoint(path)
    real = rng.standard_normal((16, 34, 27)).astype(np.float32) * 0.2
    ev.push_samples(real + 0.05, real)
    fgd, feat_dist = ev.get_scores()
    assert np.isfinite(fgd) and feat_dist > 0


def test_trainer_load_torch_checkpoint_file(tmp_path, rng):
    """Full s2ag .pth.tar (reference modules, DataParallel prefixes) through
    Trainer.load_torch_checkpoint + an eval pass."""
    ref = reference_v2_nets()
    if ref is None:
        pytest.skip("reference v2 nets not importable")

    videos = ted_db.make_synthetic_videos(n_videos=2, clip_seconds=8.0)
    cfg = ModelConfig()
    ds = ted_db.build_dataset_from_videos(videos, cfg, keep_sidecars=True)

    class FakeVocab:
        n_words = ds.speaker_model.n_words

    FakeVocab.__name__ = "Vocab"
    table = (ds.lang_model.word_embedding_weights
             if ds.lang_model.word_embedding_weights is not None
             else rng.standard_normal((ds.lang_model.n_words, 300)).astype(np.float32))
    tgen = ref.PoseGenerator(_Args, 27, ds.lang_model.n_words, 300, table,
                             mfcc_length=71, num_mfcc=37, time_steps=34,
                             z_obj=FakeVocab())
    tdis = ref.AffDiscriminator(27)
    path = str(tmp_path / "epoch_000290_loss_0.1_model.pth.tar")
    # simulate DataParallel 'module.' prefixes (torchlight io.py:65-66)
    torch.save({
        "gen_model_dict": {f"module.{k}": v for k, v in tgen.state_dict().items()},
        "dis_model_dict": {f"module.{k}": v for k, v in tdis.state_dict().items()},
    }, path)

    trainer = Trainer(cfg, str(tmp_path / "work"), train_data=ds, val_data=ds,
                      test_data=ds, seed=1)
    trainer.load_torch_checkpoint(path)
    result = trainer.generate_gestures(batch_size=8, randomized=False)
    assert np.isfinite(result["l1"])
    assert np.isfinite(result["joint_mae"])
