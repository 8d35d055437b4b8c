"""Measure the reference's own GAN train step on torch-CPU as the benchmark
comparator for bench.py.

Imports the *actual reference modules* from /root/reference (read-only) with
two environment shims: librosa/fasttext stubbed (only imported transitively,
never called on this path) and Tensor.cuda() made a no-op (the reference
hard-codes .cuda() in AffEncoder init, net/multimodal_context_net_v2.py:104).

The measured step replicates forward_pass_s2ag (processor_v2.py:776-957):
D update (G fwd + 2 D fwd + backward) then G update (trimodal fwd + G fwd +
D fwd + div-reg G fwd + backward), batch 128, full paper config.

Usage: python tools/bench_torch_baseline.py [iters]
"""

import sys
import time
import types

import numpy as np
import torch
import torch.nn.functional as F

REF = "/root/reference"


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def main(iters=5, batch=128):
    # --- shims ---------------------------------------------------------
    for mod in ("librosa", "librosa.feature", "fasttext"):
        _stub(mod)
    sys.modules["librosa"].feature = sys.modules["librosa.feature"]
    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hard-codes .cuda()
    torch.manual_seed(0)
    sys.path.insert(0, REF)

    from net.multimodal_context_net_v2 import (  # noqa: E402
        AffDiscriminator, PoseGenerator, PoseGeneratorTriModal,
        ConvDiscriminatorTriModal,
    )

    class Args:
        n_pre_poses = 4
        n_poses = 34
        hidden_size = 300
        hidden_size_s2eg = 300
        n_layers = 4
        dropout_prob = 0.3
        input_context = "both"
        freeze_wordembed = False

    class FakeVocab:
        n_words = 100

    n_words, embed = 1000, 300
    word_table = np.random.randn(n_words, embed).astype(np.float32)
    z_obj = FakeVocab()
    # reference z-path checks __class__.__name__ == 'Vocab'
    FakeVocab.__name__ = "Vocab"

    gen = PoseGenerator(Args, 27, n_words, embed, word_table,
                        mfcc_length=71, num_mfcc=37, time_steps=34, z_obj=z_obj)
    dis = AffDiscriminator(27)
    tri = PoseGeneratorTriModal(Args, 27, n_words, embed, word_table, z_obj=z_obj)
    gen.train(), dis.train(), tri.train()

    g_opt = torch.optim.Adam(gen.parameters(), lr=5e-4, betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(dis.parameters(), lr=1e-4, betas=(0.5, 0.999))

    rng = np.random.default_rng(0)
    target = torch.from_numpy(rng.standard_normal((batch, 34, 27)).astype(np.float32) * 0.1)
    in_text = torch.from_numpy(rng.integers(0, n_words, (batch, 34))).long()
    in_mfcc = torch.from_numpy(rng.standard_normal((batch, 37, 71)).astype(np.float32))
    in_audio = torch.from_numpy(rng.standard_normal((batch, 36267)).astype(np.float32) * 0.1)
    vids = torch.from_numpy(rng.integers(0, 100, (batch,))).long()

    pre_seq = target.new_zeros((batch, 34, 28))
    pre_seq[:, :4, :-1] = target[:, :4]
    pre_seq[:, :4, -1] = 1

    def step():
        # D
        d_opt.zero_grad()
        out, *_ = gen(pre_seq, in_text, in_mfcc, vids)
        d_real = dis(target, in_text)
        d_fake = dis(out.detach(), in_text)
        d_err = -torch.mean(torch.log(d_real + 1e-8) + torch.log(1 - d_fake + 1e-8))
        d_err.backward()
        d_opt.step()
        # G
        g_opt.zero_grad()
        tri_out, *_ = tri(pre_seq, in_text, in_audio, vids)
        out, z, mu, logvar = gen(pre_seq, in_text, in_mfcc, vids)
        beta = 0.1
        huber = F.smooth_l1_loss(out / beta, target / beta) * beta
        gen_err = -torch.mean(torch.log(dis(out, in_text) + 1e-8))
        rand_vids = vids[torch.randperm(batch)]
        out_rand, z_rand, _, _ = gen(pre_seq, in_text, in_mfcc, rand_vids)
        b2 = 0.05
        pose_l1 = (F.smooth_l1_loss(out / b2, out_rand.detach() / b2,
                                    reduction="none") * b2).sum(1).sum(1)
        z_l1 = F.l1_loss(z.detach(), z_rand.detach(), reduction="none").mean(1)
        div = torch.clamp(-(pose_l1 / (z_l1 + 1e-5)), min=-1000).mean()
        kld = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        loss = 500 * huber + 0.1 * kld + 0.05 * div + 5.0 * gen_err
        loss.backward()
        g_opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    print(f"torch-CPU GAN step: {iters / dt:.4f} steps/s "
          f"({dt / iters:.2f} s/step, batch {batch}, "
          f"threads {torch.get_num_threads()})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
