"""Trajectory training-dynamics parity for the two paper ABLATIONS, plus
BatchNorm running-stat trajectories.

Extends tests/test_training_dynamics_parity.py (the v2 model) to the
ablation variants the reference trains with its cloned processors:

- abl_audio: raw-waveform WavEncoder generator + AffDiscriminator
  (processor_v2_abl_audio.py:25-26, use_mfcc=False at :132 so the generator
  consumes in_audio at :804);
- abl_aff: no-AffEncoder generator + plain ConvDiscriminator
  (processor_v2_abl_aff.py:25-26, net/multimodal_context_net_v2_abl_aff.py:394).

Both ablation processors run the IDENTICAL loss stack (their
forward_pass_s2ag is a byte-level clone of processor_v2.py:776-957 modulo
net choice), so the torch oracle below is the same transcription with the
variant's nets and input plugged in. After the trajectory, the BN running
statistics of generator AND discriminator are asserted against the torch
side's (converted through convert/torch_ckpt.py), not just loss scalars —
running stats only matter at eval time, so scalar-only checks can't see a
broken stat update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from _reference_oracle import reference_abl_nets

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.models import generator as G
from speech2affective_gestures_tpu.models.discriminator import (
    AffDiscriminator,
    ConvDiscriminator,
)
from speech2affective_gestures_tpu.models.generator import PoseGenerator
from speech2affective_gestures_tpu.train import builder, gan_step

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

N_WORDS, N_SPK, BATCH, STEPS = 30, 2, 4, 6
HID, LAYERS = 64, 2
W_REG, W_GAN, W_KLD, W_DIV = 500.0, 5.0, 0.1, 0.05
LR = 5e-4


class _Args:
    n_pre_poses = 4
    n_poses = 34
    hidden_size = HID
    hidden_size_s2eg = HID
    n_layers = LAYERS
    dropout_prob = 0.0
    input_context = "both"
    freeze_wordembed = False


class _FakeVocab:
    n_words = N_SPK


_FakeVocab.__name__ = "Vocab"


def _zero_dropout(*mods):
    for mod in mods:
        for m in mod.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if isinstance(m, torch.nn.GRU):
                m.dropout = 0.0
        mod.train()


def _batches(cfg, steps):
    rng = np.random.default_rng(11)
    out = []
    for _ in range(steps):
        b = builder.synthetic_batch(rng, BATCH, cfg, N_WORDS, N_SPK)
        b["vid_indices"] = (np.arange(BATCH) % N_SPK).astype(np.int32)
        out.append(b)
    return out


def _torch_step(tgen, tdis, gopt, dopt, b, rand_vids, gen_in):
    """forward_pass_s2ag transcription (identical in both ablation
    processors, e.g. processor_v2_abl_audio.py:780-941) with the variant's
    generator input."""
    text = torch.from_numpy(b["extended_word_seq"]).long()
    target = torch.from_numpy(b["vec_seq"])
    feats = torch.from_numpy(b[gen_in])
    vids = torch.from_numpy(b["vid_indices"]).long()
    rand_vids = torch.from_numpy(rand_vids).long()

    pre_seq = target.new_zeros((target.shape[0], target.shape[1],
                                target.shape[2] + 1))
    pre_seq[:, :4, :-1] = target[:, :4]
    pre_seq[:, :4, -1] = 1

    m = {}
    dopt.zero_grad()
    out, *_ = tgen(pre_seq, text, feats, vids)
    dis_real = tdis(target, text)
    dis_fake = tdis(out.detach(), text)
    dis_error = torch.sum(-torch.mean(
        torch.log(dis_real + 1e-8) + torch.log(1 - dis_fake + 1e-8)))
    dis_error.backward()
    dopt.step()
    m["dis"] = dis_error.item()

    gopt.zero_grad()
    out, z, mu, logvar = tgen(pre_seq, text, feats, vids)
    beta = 0.1
    huber = F.smooth_l1_loss(out / beta, target / beta) * beta
    dis_output = tdis(out, text)
    gen_error = -torch.mean(torch.log(dis_output + 1e-8))
    out_rand, z_rand, *_ = tgen(pre_seq, text, feats, rand_vids)
    beta2 = 0.05
    pose_l1 = (F.smooth_l1_loss(out / beta2, out_rand.detach() / beta2,
                                reduction="none") * beta2)
    pose_l1 = pose_l1.sum(dim=1).sum(dim=1)
    pose_l1 = pose_l1.view(pose_l1.shape[0], -1).mean(1)
    z_l1 = F.l1_loss(z.detach(), z_rand.detach(), reduction="none")
    z_l1 = z_l1.view(z_l1.shape[0], -1).mean(1)
    div_reg = torch.clamp(-(pose_l1 / (z_l1 + 1e-5)), min=-1000).mean()
    kld = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
    loss = W_REG * huber + W_KLD * kld + W_DIV * div_reg + W_GAN * gen_error
    loss.backward()
    gopt.step()
    m.update({"loss": (W_REG * huber).item(), "KLD": (W_KLD * kld).item(),
              "DIV_REG": (W_DIV * div_reg).item(),
              "gen": (W_GAN * gen_error).item()})
    return m


def _assert_stats_match(got_tree, want_tree, what: str):
    flat_got = jax.tree_util.tree_leaves_with_path(got_tree)
    want_map = dict(jax.tree_util.tree_leaves_with_path(want_tree))
    assert len(flat_got) > 0, f"no batch stats found for {what}"
    checked = 0
    for path, got in flat_got:
        want = want_map[path]
        # tolerance: cross-framework f32 drift compounds through the
        # trajectory into the batch means (losses match to ~1e-3, stats to
        # ~2e-2); the failure modes this guards against — wrong momentum,
        # a missed update, eval-mode freeze — show up as >10% diffs
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2,
            err_msg=f"{what} batch-stat {jax.tree_util.keystr(path)}",
        )
        checked += 1
    assert checked >= 4  # mean+var for at least 2 BN layers


def _setup(variant, table, cfg):
    ref = reference_abl_nets(variant)
    if ref is None:
        pytest.skip(f"reference {variant} nets not importable")
    import net.embedding_net as ref_en

    tgen = ref.PoseGenerator(_Args, C.POSE_DIM, N_WORDS, 300, table,
                             mfcc_length=cfg.mfcc_length,
                             num_mfcc=cfg.num_mfcc_combined,
                             time_steps=cfg.n_poses, z_obj=_FakeVocab())
    if variant == "abl_audio":
        tdis = ref.AffDiscriminator(C.POSE_DIM)
        gen = PoseGenerator(
            pose_dim=C.POSE_DIM, n_words=N_WORDS, word_embeddings=table,
            hidden_size=HID, n_layers=LAYERS, dropout_prob=0.0,
            emb_dropout=0.0, n_speakers=N_SPK, audio_encoder_type="wav",
        )
        dis = AffDiscriminator(n_poses=cfg.n_poses, dropout_prob=0.0)
        gen_in = "audio"
    else:
        tdis = ref.ConvDiscriminator(C.POSE_DIM)
        gen = PoseGenerator(
            pose_dim=C.POSE_DIM, n_words=N_WORDS, word_embeddings=table,
            hidden_size=HID, n_layers=LAYERS, dropout_prob=0.0,
            emb_dropout=0.0, n_speakers=N_SPK, use_aff_encoder=False,
        )
        dis = ConvDiscriminator(dropout_prob=0.0)
        gen_in = "mfcc_features"
    _zero_dropout(tgen, tdis)
    return ref_en, tgen, tdis, gen, dis, gen_in


def _convert(tgen, tdis, variant):
    sd_gen = {k: v.detach().numpy().copy() for k, v in
              tgen.state_dict().items()}
    sd_dis = {k: v.detach().numpy().copy() for k, v in
              tdis.state_dict().items()}
    gp, gs = ck.pose_generator(sd_gen, n_layers=LAYERS, variant=variant)
    if variant == "abl_audio":
        dp, ds = ck.aff_discriminator(sd_dis)
    else:
        dp, ds = ck.conv_discriminator_trimodal(sd_dis)
    return gp, gs, dp, ds


@pytest.mark.parametrize("variant", ["abl_audio", "abl_aff"])
def test_ablation_training_trajectory_matches_reference(
    rng, monkeypatch, variant
):
    torch.manual_seed(33)
    table = rng.standard_normal((N_WORDS, 300)).astype(np.float32)
    cfg = ModelConfig(hidden_size=HID, hidden_size_s2eg=HID,
                      n_layers=LAYERS, dropout_prob=0.0)
    ref_en, tgen, tdis, gen, dis, gen_in = _setup(variant, table, cfg)
    monkeypatch.setattr(ref_en, "re_parametrize", lambda mu, lv: mu)
    monkeypatch.setattr(G, "re_parametrize", lambda mu, lv, rng: mu)

    gopt = torch.optim.Adam(tgen.parameters(), lr=LR, betas=(0.5, 0.999))
    dopt = torch.optim.Adam(tdis.parameters(), lr=LR * 0.2,
                            betas=(0.5, 0.999))

    gp, gs, dp, ds = _convert(tgen, tdis, variant)
    # divreg_draw='fresh': deterministic exclude-own draw at V=2 so the torch
    # side sees identical ids (see test_training_dynamics_parity.py)
    gan_cfg = gan_step.GanConfig(n_speakers=N_SPK, generator_input=gen_in,
                                 divreg_draw="fresh")
    state = gan_step.create_train_state(
        {"params": gp, "batch_stats": gs},
        {"params": dp, "batch_stats": ds}, gan_cfg,
    )
    train_step, _ = gan_step.make_train_step(gen.apply, dis.apply, gan_cfg)

    key = jax.random.key(9)
    with jax.default_matmul_precision("highest"):
        for step, b in enumerate(_batches(cfg, STEPS)):
            rand_vids = (1 - b["vid_indices"]).astype(np.int64)
            want = _torch_step(tgen, tdis, gopt, dopt, b, rand_vids, gen_in)
            key, sub = jax.random.split(key)
            state, got = train_step(state, jax.device_put(b), sub,
                                    gan_on=True)
            got = {k: float(v) for k, v in got.items()}
            rtol = 2e-3 * (1 + step)
            for metric in ("dis", "loss", "KLD", "DIV_REG", "gen"):
                np.testing.assert_allclose(
                    got[metric], want[metric], rtol=rtol,
                    atol=1e-4 * (1 + step),
                    err_msg=f"{variant} step {step} metric {metric}",
                )

            if step == 2:
                # BN running stats, checked EARLY: GAN+Adam dynamics are
                # chaotic (drift amplifies ~5x/step through the D feedback
                # loop) so late-trajectory stat comparisons are meaningless,
                # while momentum/missed-update bugs are >=10% off after one
                # step (see test_training_dynamics_parity.py)
                gp2, gs2, dp2, ds2 = _convert(tgen, tdis, variant)
                _assert_stats_match(state.gen_stats, gs2,
                                    f"{variant} generator")
                _assert_stats_match(state.dis_stats, ds2,
                                    f"{variant} discriminator")
