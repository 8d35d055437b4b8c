"""Training loop for the FGD gesture-embedding autoencoder.

The reference consumes a PRE-TRAINED `outputs/embedding_net.pth.tar`
(net/embedding_space_evaluator.py:20-27) and ships no code to produce one —
users bringing a new dataset are stuck. This module closes that gap: it
trains `models/embedding_net.EmbeddingNet` (mode='pose', the FGD
configuration) as a reconstruction autoencoder over pose windows, the same
recipe the released checkpoint was produced with in Yoon et al.'s trimodal
codebase (Huber reconstruction + optional small KLD when variational).

TPU-first: one jitted Adam step over a donated train state; the whole
dataset is staged once in device memory and each step gathers its minibatch
on-device (no host round-trips inside the epoch loop).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import constants as C
from ..models.embedding_net import EmbeddingNet


class EmbedTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    stats: Any
    opt: Any


def make_embedding_train_step(net: EmbeddingNet, tx,
                              variational: bool = False,
                              kld_weight: float = 0.1):
    """One jitted AE update: Huber(recon, poses) (+ kld_weight * KLD)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: EmbedTrainState, poses: jax.Array, rng: jax.Array):
        def loss_fn(params, stats):
            (_, _, _, _, mu, log_var, recon), mut = net.apply(
                {"params": params, "batch_stats": stats},
                None, None, poses[:, : C.N_PRE_POSES], poses,
                variational_encoding=variational, train=True,
                rngs={"noise": rng},
                mutable=["batch_stats"],
            )
            huber = optax.huber_loss(recon, poses, delta=1.0).mean()
            loss = huber
            if variational:
                kld = -0.5 * jnp.mean(
                    1 + log_var - mu ** 2 - jnp.exp(log_var)
                )
                loss = loss + kld_weight * kld
            return loss, mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.stats
        )
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, stats=stats,
                          opt=opt),
            loss,
        )

    return train_step


def train_pose_embedding(
    pose_windows: np.ndarray,
    *,
    epochs: int = 20,
    batch_size: int = 64,
    learning_rate: float = 5e-4,
    variational: bool = False,
    seed: int = 0,
    pose_dim: int = C.POSE_DIM,
    n_frames: int = C.N_POSES,
    log_every: int = 0,
) -> dict:
    """Train the pose autoencoder on (N, T, pose_dim) windows; returns
    {"variables": <flax variables for EmbeddingSpaceEvaluator>,
     "final_loss": <last minibatch loss>}.

    Drop-in producer for what the reference can only load pre-made
    (outputs/embedding_net.pth.tar); `convert/torch_ckpt.py` maps between
    the two formats in both directions."""
    pose_windows = np.asarray(pose_windows, np.float32)
    n = len(pose_windows)
    if n < 2:
        raise ValueError("need at least 2 pose windows")
    batch_size = min(batch_size, n)

    net = EmbeddingNet(pose_dim=pose_dim, n_frames=n_frames, mode="pose")
    key = jax.random.key(seed)
    k_init, k_noise, key = jax.random.split(key, 3)
    variables = net.init(
        {"params": k_init, "noise": k_noise},
        None, None,
        jnp.zeros((2, C.N_PRE_POSES, pose_dim)),
        jnp.zeros((2, n_frames, pose_dim)),
    )
    tx = optax.adam(learning_rate)
    state = EmbedTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        stats=variables.get("batch_stats", {}),
        opt=tx.init(variables["params"]),
    )
    train_step = make_embedding_train_step(net, tx, variational=variational)

    data = jax.device_put(pose_windows)           # staged once
    steps_per_epoch = max(1, n // batch_size)
    rng = np.random.default_rng(seed)
    last = float("nan")
    for epoch in range(epochs):
        order = rng.permutation(n)
        for s in range(steps_per_epoch):
            idx = jnp.asarray(order[s * batch_size:(s + 1) * batch_size])
            key, sub = jax.random.split(key)
            state, loss = train_step(state, jnp.take(data, idx, axis=0), sub)
        last = float(loss)
        if log_every and (epoch + 1) % log_every == 0:
            print(f"[embedding] epoch {epoch + 1}/{epochs} "
                  f"recon loss {last:.6f}", flush=True)
    return {
        "variables": {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.stats),
        },
        "final_loss": last,
    }
