"""Loss stack of the s2ag GAN and auxiliary metrics.

Exact-parity implementations of the reference objective
(`processor_v2.py:793-937` and `utils/losses.py`):

- ns-GAN D loss: -mean(log D(real) + log(1 - D(fake))), eps 1e-8;
- ns-GAN G term: -mean(log D(fake));
- scaled Huber: F.smooth_l1_loss(x/beta, y/beta) * beta with beta = 0.1;
- speaker-embedding KLD;
- speaker diversity regularizer: -pose_l1/(z_l1 + 1e-5) clamped at -1000;
- quaternion angle loss (wrap-around L1 + drift accumulation);
- joint MAE / acceleration-difference metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quaternions import qeuler

_EPS = 1e-8


def smooth_l1(x: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise smooth-L1 (torch beta=1)."""
    d = x - y
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def scaled_huber(x: jax.Array, y: jax.Array, beta: float) -> jax.Array:
    """mean(smooth_l1(x/beta, y/beta)) * beta (ref processor_v2.py:893-894)."""
    return jnp.mean(smooth_l1(x / beta, y / beta)) * beta


def dis_ns_gan(d_real: jax.Array, d_fake: jax.Array) -> jax.Array:
    """ref processor_v2.py:811."""
    return -jnp.mean(jnp.log(d_real + _EPS) + jnp.log(1.0 - d_fake + _EPS))


def gen_ns_gan(d_fake: jax.Array) -> jax.Array:
    """ref processor_v2.py:896."""
    return -jnp.mean(jnp.log(d_fake + _EPS))


def kld_speaker(z_mu: jax.Array, z_log_var: jax.Array) -> jax.Array:
    """ref processor_v2.py:926."""
    return -0.5 * jnp.mean(1.0 + z_log_var - z_mu**2 - jnp.exp(z_log_var))


def diversity_regularizer(
    out: jax.Array, out_rand: jax.Array, z: jax.Array, z_rand: jax.Array
) -> jax.Array:
    """Speaker-diversity term (ref processor_v2.py:908-922).

    All of out_rand / z / z_rand are treated as constants (the reference
    `.detach()`s them); gradients flow only through `out`.
    """
    out_rand = jax.lax.stop_gradient(out_rand)
    z = jax.lax.stop_gradient(z)
    z_rand = jax.lax.stop_gradient(z_rand)
    beta = 0.05
    pose_l1 = smooth_l1(out / beta, out_rand / beta) * beta
    pose_l1 = pose_l1.sum(axis=(1, 2))                      # (B,)
    z_l1 = jnp.abs(z - z_rand).reshape(z.shape[0], -1).mean(axis=1)
    div = -(pose_l1 / (z_l1 + 1.0e-5))
    return jnp.clip(div, min=-1000.0).mean()


def l1(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


def mae_joints(poses_target: np.ndarray, poses_predicted: np.ndarray) -> float:
    """ref utils/losses.py:8-10 (per-sample L1-norm mean)."""
    diff = np.reshape(poses_target - poses_predicted, (len(poses_predicted), -1))
    return float(np.mean(np.linalg.norm(diff, axis=1, ord=1)))


def quat_angle_loss(
    quats_pred: jax.Array,
    quats_target: jax.Array,
    num_joints: int,
    dims: int = 4,
    lower_body_start: int = 15,
    upper_body_weights: float = 1.0,
    drift_len: int = 20,
):
    """Wrap-around Euler L1 + drift term (ref utils/losses.py:29-45)."""
    qp = quats_pred.reshape(-1, quats_pred.shape[1], num_joints, dims)
    qt = quats_target.reshape(-1, quats_target.shape[1], num_joints, dims)
    ep = qeuler(qp, order="yzx", epsilon=1e-6)
    et = qeuler(qt, order="yzx", epsilon=1e-6)
    dist = jnp.mod(ep[:, 1:] - et[:, 1:] + jnp.pi, 2 * jnp.pi) - jnp.pi
    dist = dist.at[:, :, :lower_body_start].multiply(upper_body_weights)
    drift = jnp.zeros_like(dist)
    for idx in range(1, drift_len):
        upd = ep[:, idx:] - ep[:, :-idx] - et[:, idx:] + et[:, :-idx]
        drift = drift.at[:, idx - 1 :].add(upd)
    drift = drift.at[:, :, :lower_body_start].multiply(upper_body_weights)
    return jnp.mean(jnp.abs(dist)), jnp.mean(jnp.abs(drift))


class AverageMeter:
    """Running mean (ref utils/average_meter.py)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        fmt_str = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmt_str.format(**self.__dict__)
