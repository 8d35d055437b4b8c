"""Trajectory-level training-dynamics parity vs the reference's own modules.

Converts ONE random torch init, then runs N alternating D+G optimizer steps
on identical batches through (a) the reference's torch modules driven by a
literal transcription of forward_pass_s2ag (processor_v2.py:776-957, Adam
betas (0.5, 0.999) at :215-220) and (b) this framework's jitted
train_step — asserting the per-step loss components match. This upgrades
the piecewise loss-formula tests into "the training loop is the same
dynamical system".

Determinism setup:
- ALL dropout off, including the layers the reference hardcodes (D-GRU 0.3
  at net/multimodal_context_net_v2.py:560, TCN emb_dropout 0.1 at :64);
  z = mu (re_parametrize patched both sides);
- 2 speakers, so the diversity-regularizer's fresh exclude-own draw is the
  deterministic "other" id on our side; the torch side is fed the same ids
  (the reference's randperm draw differs only in the id distribution —
  gan_step.draw_other_speaker_ids docstring — not in the loss formula);
- BatchNorm running stats update in train mode on both sides (our BN
  mirrors torch momentum-0.1/unbiased-update semantics, models/layers.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from _reference_oracle import reference_v2_nets

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.models import generator as G
from speech2affective_gestures_tpu.models.discriminator import AffDiscriminator
from speech2affective_gestures_tpu.models.generator import PoseGenerator
from speech2affective_gestures_tpu.train import builder, gan_step

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

ref = reference_v2_nets()

N_WORDS, N_SPK, BATCH, STEPS = 30, 2, 4, 8
HID, LAYERS = 64, 2


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

W_REG, W_GAN, W_KLD, W_DIV = 500.0, 5.0, 0.1, 0.05
LR = 5e-4


def _batches(cfg, steps):
    rng = np.random.default_rng(7)
    out = []
    for _ in range(steps):
        b = builder.synthetic_batch(rng, BATCH, cfg, N_WORDS, N_SPK)
        b["vid_indices"] = (np.arange(BATCH) % N_SPK).astype(np.int32)
        out.append(b)
    return out


def _torch_step(tgen, tdis, gopt, dopt, b, rand_vids):
    """Literal transcription of forward_pass_s2ag (processor_v2.py:784-941),
    gan_on, z_type='speaker', use_mfcc=True; trimodal comparison omitted
    (metrics-only in the reference)."""
    text = torch.from_numpy(b["extended_word_seq"]).long()
    target = torch.from_numpy(b["vec_seq"])
    mfcc = torch.from_numpy(b["mfcc_features"])
    vids = torch.from_numpy(b["vid_indices"]).long()
    rand_vids = torch.from_numpy(rand_vids).long()

    pre_seq = target.new_zeros((target.shape[0], target.shape[1],
                                target.shape[2] + 1))           # :784-788
    pre_seq[:, :4, :-1] = target[:, :4]
    pre_seq[:, :4, -1] = 1

    m = {}
    dopt.zero_grad()                                            # :794
    out, *_ = tgen(pre_seq, text, mfcc, vids)                   # :798
    dis_real = tdis(target, text)                               # :808
    dis_fake = tdis(out.detach(), text)                         # :809
    dis_error = torch.sum(-torch.mean(
        torch.log(dis_real + 1e-8) + torch.log(1 - dis_fake + 1e-8)))  # :811
    dis_error.backward()
    dopt.step()
    m["dis"] = dis_error.item()

    gopt.zero_grad()                                            # :818
    out, z, mu, logvar = tgen(pre_seq, text, mfcc, vids)        # :823
    beta = 0.1
    huber = F.smooth_l1_loss(out / beta, target / beta) * beta  # :894
    dis_output = tdis(out, text)                                # :895
    gen_error = -torch.mean(torch.log(dis_output + 1e-8))       # :896
    out_rand, z_rand, *_ = tgen(pre_seq, text, mfcc, rand_vids)  # :909
    beta2 = 0.05                                                # :912-922
    pose_l1 = (F.smooth_l1_loss(out / beta2, out_rand.detach() / beta2,
                                reduction="none") * beta2)
    pose_l1 = pose_l1.sum(dim=1).sum(dim=1)
    pose_l1 = pose_l1.view(pose_l1.shape[0], -1).mean(1)
    z_l1 = F.l1_loss(z.detach(), z_rand.detach(), reduction="none")
    z_l1 = z_l1.view(z_l1.shape[0], -1).mean(1)
    div_reg = torch.clamp(-(pose_l1 / (z_l1 + 1e-5)), min=-1000).mean()
    kld = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())  # :926
    loss = W_REG * huber + W_KLD * kld + W_DIV * div_reg        # :927-931
    loss = loss + W_GAN * gen_error                             # :936-937
    loss.backward()
    gopt.step()
    m.update({"loss": (W_REG * huber).item(), "KLD": (W_KLD * kld).item(),
              "DIV_REG": (W_DIV * div_reg).item(),
              "gen": (W_GAN * gen_error).item()})
    return m


@pytest.mark.skipif(ref is None, reason="reference v2 nets not importable")
def test_training_trajectory_matches_reference(rng, monkeypatch):
    # z = mu on both sides
    import net.embedding_net as ref_en

    monkeypatch.setattr(ref_en, "re_parametrize", lambda mu, lv: mu)
    monkeypatch.setattr(G, "re_parametrize", lambda mu, lv, rng: mu)

    torch.manual_seed(21)
    table = rng.standard_normal((N_WORDS, 300)).astype(np.float32)
    cfg = ModelConfig(hidden_size=HID, hidden_size_s2eg=HID, n_layers=LAYERS,
                      dropout_prob=0.0)

    tgen = ref.PoseGenerator(_Args, C.POSE_DIM, N_WORDS, 300, table,
                             mfcc_length=cfg.mfcc_length,
                             num_mfcc=cfg.num_mfcc_combined,
                             time_steps=cfg.n_poses, z_obj=_FakeVocab())
    tdis = ref.AffDiscriminator(C.POSE_DIM)
    # zero even the hardcoded dropout (D-GRU 0.3, TCN 0.3/0.1) so both
    # trajectories are deterministic
    for mod in (tgen, tdis):
        for m in mod.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if isinstance(m, torch.nn.GRU):
                m.dropout = 0.0
        mod.train()
    gopt = torch.optim.Adam(tgen.parameters(), lr=LR, betas=(0.5, 0.999))
    dopt = torch.optim.Adam(tdis.parameters(), lr=LR * 0.2, betas=(0.5, 0.999))

    # our side: same modules at dropout zero, same init via the converter
    gen = PoseGenerator(
        pose_dim=C.POSE_DIM, n_words=N_WORDS, word_embeddings=table,
        hidden_size=HID, n_layers=LAYERS, dropout_prob=0.0, emb_dropout=0.0,
        n_speakers=N_SPK,
    )
    dis = AffDiscriminator(n_poses=cfg.n_poses, dropout_prob=0.0)
    # divreg_draw='fresh': with V=2 the exclude-own draw is deterministically
    # the other id, so the torch side can be fed the exact same ids (the
    # default 'permutation' draw is random and can't be mirrored per-sample)
    gan_cfg = gan_step.GanConfig(n_speakers=N_SPK, divreg_draw="fresh")
    # .copy(): .numpy() views torch's buffers, and the torch optimizer
    # updates them in place — without the copy our "converted init" would
    # silently track the torch side's training
    blob = {
        "gen_model_dict": {k: v.detach().numpy().copy()
                           for k, v in tgen.state_dict().items()},
        "dis_model_dict": {k: v.detach().numpy().copy()
                           for k, v in tdis.state_dict().items()},
    }
    gp, gs = ck.pose_generator(blob["gen_model_dict"], n_layers=LAYERS)
    dp, ds = ck.aff_discriminator(blob["dis_model_dict"])
    state = gan_step.create_train_state(
        {"params": gp, "batch_stats": gs},
        {"params": dp, "batch_stats": ds}, gan_cfg,
    )
    train_step, _ = gan_step.make_train_step(gen.apply, dis.apply, gan_cfg)

    batches = _batches(cfg, STEPS)
    key = jax.random.key(5)
    with jax.default_matmul_precision("highest"):
        for step, b in enumerate(batches):
            # V=2 -> our on-device exclude-own draw is deterministically the
            # other id; feed the torch side the same ids
            rand_vids = (1 - b["vid_indices"]).astype(np.int64)
            want = _torch_step(tgen, tdis, gopt, dopt, b, rand_vids)

            key, sub = jax.random.split(key)
            state, got = train_step(state, jax.device_put(b), sub, gan_on=True)
            got = {k: float(v) for k, v in got.items()}

            # tolerance grows with accumulated optimizer drift (f32)
            rtol = 2e-3 * (1 + step)
            for metric in ("dis", "loss", "KLD", "DIV_REG", "gen"):
                np.testing.assert_allclose(
                    got[metric], want[metric], rtol=rtol, atol=1e-4 * (1 + step),
                    err_msg=f"step {step} metric {metric}",
                )

            if step == 2:
                # BatchNorm RUNNING statistics, checked EARLY in the
                # trajectory: GAN+Adam dynamics are chaotic (f32 drift
                # amplifies ~5x/step through the D feedback loop), so a
                # post-8-step comparison is meaningless, while the errors
                # this guards against — wrong momentum, a missed update,
                # eval-mode freeze — are >=10% off after a single step.
                _assert_bn_stats_match(state, tgen, tdis)

    # parameters themselves stay aligned after N steps (spot-check the
    # generator output head). atol ~2*lr: near-zero-gradient elements
    # accumulate sign-level Adam noise (update ~= sign(grad)*lr) under f32
    # cross-framework drift — observed max |diff| is ~4e-4 after 8 steps.
    w_torch = tgen.state_dict()["out.2.weight"].numpy()
    w_ours = np.asarray(state.gen_params["out2"]["kernel"]).T
    np.testing.assert_allclose(w_ours, w_torch, rtol=5e-3, atol=1e-3)


def _assert_bn_stats_match(state, tgen, tdis):
    """Compare the COMPLETE batch_stats trees (running mean/var of every BN
    layer in both networks) against the torch side's, via the checkpoint
    converter. They only matter at eval time, so the loss-scalar checks
    cannot see a broken stat update."""
    gp2, gs2 = ck.pose_generator(
        {k: v.detach().numpy().copy() for k, v in tgen.state_dict().items()},
        n_layers=LAYERS,
    )
    dp2, ds2 = ck.aff_discriminator(
        {k: v.detach().numpy().copy() for k, v in tdis.state_dict().items()}
    )
    for got_tree, want_tree, what in (
        (state.gen_stats, gs2, "generator"),
        (state.dis_stats, ds2, "discriminator"),
    ):
        flat_got = jax.tree_util.tree_leaves_with_path(got_tree)
        want_map = dict(jax.tree_util.tree_leaves_with_path(want_tree))
        assert len(flat_got) >= 4, f"no batch stats found for {what}"
        for path, got in flat_got:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want_map[path]),
                rtol=2e-2, atol=2e-2,
                err_msg=f"{what} batch-stat {jax.tree_util.keystr(path)}",
            )
