"""tools/validate_reference_ckpt.py against layout-exact fakes of the
released checkpoints (gen/dis model, trimodal baseline, FGD embedding net —
the exact key layouts of processor_v2.py:1064-1069, :1033 and
embedding_space_evaluator.py:20, including DataParallel 'module.'
prefixes)."""

import importlib.util
import os

import numpy as np
import pytest
import torch

from _reference_oracle import reference_v2_nets

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data import ted_db

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def _load_script():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "validate_reference_ckpt",
        os.path.join(here, "tools", "validate_reference_ckpt.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def test_validation_script_with_released_layout_fakes(tmp_path, rng):
    ref = reference_v2_nets()
    if ref is None:
        pytest.skip("reference v2 nets not importable")
    import importlib as _il

    ref_en = _il.import_module("net.embedding_net")
    script = _load_script()
    cfg = ModelConfig()

    # the script builds this exact corpus internally; mirror it to size the
    # fake checkpoints to the same vocabularies
    videos = ted_db.make_synthetic_videos(n_videos=3, clip_seconds=10.0)
    ds = ted_db.build_dataset_from_videos(videos, cfg, keep_sidecars=True)
    n_words, n_spk = ds.lang_model.n_words, ds.speaker_model.n_words

    class FakeVocab:
        n_words = n_spk

    FakeVocab.__name__ = "Vocab"
    table = rng.standard_normal((n_words, 300)).astype(np.float32)

    torch.manual_seed(3)
    tgen = ref.PoseGenerator(_Args, 27, n_words, 300, table,
                             mfcc_length=cfg.mfcc_length,
                             num_mfcc=cfg.num_mfcc_combined,
                             time_steps=34, z_obj=FakeVocab())
    tdis = ref.AffDiscriminator(27)
    ttri = ref.PoseGeneratorTriModal(_Args, 27, n_words, 300, table,
                                     z_obj=FakeVocab())
    temb = ref_en.EmbeddingNet(_Args, 27, 34, n_words=n_words,
                               word_embed_size=300, word_embeddings=None,
                               mode="pose")

    model_path = str(tmp_path / "epoch_000290_loss_0.0048_model.pth.tar")
    torch.save({
        # released checkpoints carry DataParallel prefixes
        "gen_model_dict": {f"module.{k}": v
                           for k, v in tgen.state_dict().items()},
        "dis_model_dict": {f"module.{k}": v
                           for k, v in tdis.state_dict().items()},
    }, model_path)
    tri_path = str(tmp_path / "trimodal_gen.pth.tar")
    torch.save({"trimodal_gen_dict": ttri.state_dict()}, tri_path)
    emb_path = str(tmp_path / "embedding_net.pth.tar")
    torch.save({"embedding_dict": temb.state_dict()}, emb_path)

    result = script.main([
        "--model-checkpoint", model_path,
        "--embedding-net", emb_path,
        "--trimodal", tri_path,
        "--synthetic-data", "--full-test", "--batch-size", "64",
    ])
    for key in ("FGD", "feat_dist", "joint_mae", "accel", "l1"):
        assert key in result, f"missing metric {key}"
        assert np.isfinite(result[key]), f"non-finite {key}"
    assert result["FGD"] >= 0
