"""T2GNet training: text + affect tags -> gesture quaternion sequences.

The reference DEFINES T2GNet (net/T2GNet.py, net/T2GNet_glove.py) but can
neither feed nor train it: no processor imports it, and its data loader is
dead (loader_v2.py:782 calls a nonexistent method — see data/mpi_glove.py).
This module closes the loop: it turns an MPI-style corpus (the working
`mpi_glove.load_data_with_glove` output) into fixed-shape arrays, trains
`models/t2g.T2GNet` teacher-forced under the reference's own quaternion
objective (`losses.quat_angle_loss`, the `rec_loss` the reference binds at
processor_v2.py:40 but never calls), and synthesizes autoregressively.

TPU-first: one jitted Adam step over a donated train state; static shapes
throughout (text padded to S, quats padded to max_time_steps with identity
frames and masked out of the loss); autoregressive generation is a
`lax.fori_loop` over a fixed-length frame buffer inside ONE jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data import mpi_glove
from ..models.t2g import T2GNet, t2g_net_glove
from . import losses

IDENTITY_QUAT = np.array([1.0, 0.0, 0.0, 0.0], np.float32)


# --------------------------------------------------------------------------
# corpus -> fixed-shape arrays
# --------------------------------------------------------------------------

def tokenize(text: str, word2idx: dict) -> list[int]:
    """Alnum-token split (the same filter mpi_glove applies when building
    the vocab) -> BOS ids EOS, UNK fallback (ref utils/constant.py)."""
    words = [w for w in text.split() if w.isalnum()]
    return ([mpi_glove.BOS]
            + [word2idx.get(w, mpi_glove.UNK) for w in words]
            + [mpi_glove.EOS])


def prepare_t2g_arrays(data_dict: dict, word2idx: dict,
                       tag_categories: list, max_time_steps: int) -> dict:
    """mpi_glove data_dict -> static-shape training arrays.

    Returns {text (B,S) i32, tags [ (B,d) f32 ... + (B,1) age ],
    quat (B,T,J*4) f32, frame_mask (B,T) f32, offset_lengths (B,J) f32,
    clip_ids}. Quats are padded with identity frames past each clip's
    length; every clip must share one skeleton (true for MPI)."""
    clip_ids = sorted(data_dict)
    first = data_dict[clip_ids[0]]
    n_joints = len(first["joints_dict"]["joints_parents"])
    tok = [tokenize(data_dict[c]["Text"], word2idx) for c in clip_ids]
    s_max = max(len(t) for t in tok)
    b, t_max = len(clip_ids), int(max_time_steps)

    text = np.full((b, s_max), mpi_glove.PAD, np.int32)
    quat = np.tile(IDENTITY_QUAT, (b, t_max, n_joints, 1)).astype(np.float32)
    mask = np.zeros((b, t_max), np.float32)
    offsets = np.zeros((b, n_joints), np.float32)
    # tag_categories has one (string) category list per non-Text tag,
    # including Age — whose one-hot the loader replaces by value/100, so
    # its feature here is a single scalar column
    tag_names = [t for t in mpi_glove.RELEVANT_TAGS if t != "Text"]
    tags = [np.zeros((b, 1 if name == "Age" else len(cats)), np.float32)
            for name, cats in zip(tag_names, tag_categories)]

    for i, cid in enumerate(clip_ids):
        entry = data_dict[cid]
        text[i, : len(tok[i])] = tok[i]
        rot = np.asarray(entry["rotations"], np.float32)[:t_max]
        if rot.shape[1] != n_joints:
            raise ValueError(
                f"clip {cid} has {rot.shape[1]} joints, expected {n_joints}"
            )
        quat[i, : len(rot)] = rot
        mask[i, : len(rot)] = 1.0
        offsets[i] = np.linalg.norm(
            np.asarray(entry["joints_dict"]["joints_offsets_all"],
                       np.float32).reshape(n_joints, -1)[:, :3], axis=-1)
        for k, name in enumerate(tag_names):
            tags[k][i] = entry[name] if name != "Age" else [entry[name]]

    return {
        "text": text,
        "tags": tags,
        "quat": quat.reshape(b, t_max, n_joints * 4),
        "frame_mask": mask,
        "offset_lengths": offsets,
        "clip_ids": clip_ids,
        "n_joints": n_joints,
    }


def build_t2g_net(embedding_table: np.ndarray, arrays: dict,
                  **overrides) -> T2GNet:
    """T2GNet_glove configured from the prepared arrays (frozen GloVe
    table; quat/offset dims from the skeleton; tag dims from the corpus)."""
    kwargs = dict(
        quat_dim=arrays["quat"].shape[-1],
        offsets_dim=arrays["offset_lengths"].shape[-1],
        tag_dims=tuple(t.shape[-1] for t in arrays["tags"]),
        dropout=0.1,
    )
    kwargs.update(overrides)
    return t2g_net_glove(embedding_table, int(arrays["quat"].shape[1]),
                         **kwargs)


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

class T2GTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt: Any


def make_t2g_train_step(net: T2GNet, tx, n_joints: int):
    """One jitted teacher-forced update. Decoder input is the target
    sequence shifted right one frame (identity-quat start frame); the loss
    is the reference's quaternion objective `quat_angle_loss` (wrap-around
    Euler L1 + drift), masked by replacing padded-frame predictions with
    their targets so padding contributes zero."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: T2GTrainState, batch: dict, rng: jax.Array):
        start = jnp.tile(jnp.asarray(IDENTITY_QUAT), (n_joints,))
        teacher = jnp.concatenate(
            [jnp.broadcast_to(start, batch["quat"][:, :1].shape),
             batch["quat"][:, :-1]], axis=1,
        )

        def loss_fn(params):
            pred, _ = net.apply(
                {"params": params}, batch["text"], batch["tags"], teacher,
                batch["offset_lengths"], train=True,
                rngs={"dropout": rng},
            )
            m = batch["frame_mask"][..., None]
            pred = pred * m + batch["quat"] * (1.0 - m)
            angle, drift = losses.quat_angle_loss(
                pred, batch["quat"], num_joints=n_joints,
                lower_body_start=n_joints, drift_len=min(20, pred.shape[1]),
            )
            return angle + drift, (angle, drift)

        (loss, (angle, drift)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt=opt),
            {"loss": loss, "angle": angle, "drift": drift},
        )

    return train_step


def train_t2g(data_dict: dict, word2idx: dict, embedding_table: np.ndarray,
              tag_categories: list, max_time_steps: int, *,
              epochs: int = 50, batch_size: int = 8,
              learning_rate: float = 1e-3, seed: int = 0,
              net_overrides: dict | None = None) -> dict:
    """Full training loop over an mpi_glove corpus. Returns
    {'params', 'net', 'arrays', 'history', 'final_loss'}."""
    arrays = prepare_t2g_arrays(data_dict, word2idx, tag_categories,
                                max_time_steps)
    net = build_t2g_net(embedding_table, arrays, **(net_overrides or {}))
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    variables = net.init(
        {"params": init_rng, "dropout": init_rng},
        jnp.asarray(arrays["text"][:1]),
        [jnp.asarray(t[:1]) for t in arrays["tags"]],
        jnp.asarray(arrays["quat"][:1]),
        jnp.asarray(arrays["offset_lengths"][:1]),
    )
    tx = optax.adam(learning_rate)
    state = T2GTrainState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          opt=tx.init(variables["params"]))
    step_fn = make_t2g_train_step(net, tx, arrays["n_joints"])

    n = len(arrays["clip_ids"])
    device_arrays = {
        "text": jnp.asarray(arrays["text"]),
        "tags": [jnp.asarray(t) for t in arrays["tags"]],
        "quat": jnp.asarray(arrays["quat"]),
        "frame_mask": jnp.asarray(arrays["frame_mask"]),
        "offset_lengths": jnp.asarray(arrays["offset_lengths"]),
    }
    history = []
    np_rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = np_rng.permutation(n)
        epoch_loss = 0.0
        n_batches = 0
        for s in range(0, n, batch_size):
            sel = jnp.asarray(order[s: s + batch_size])
            batch = {
                "text": device_arrays["text"][sel],
                "tags": [t[sel] for t in device_arrays["tags"]],
                "quat": device_arrays["quat"][sel],
                "frame_mask": device_arrays["frame_mask"][sel],
                "offset_lengths": device_arrays["offset_lengths"][sel],
            }
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            epoch_loss += float(metrics["loss"])
            n_batches += 1
        history.append(epoch_loss / max(1, n_batches))
    return {"params": state.params, "net": net, "arrays": arrays,
            "history": history, "final_loss": history[-1] if history else None}


# --------------------------------------------------------------------------
# autoregressive synthesis
# --------------------------------------------------------------------------

# jitted decode programs cached per T2GNet instance (flax Modules are not
# hashable — list-typed fields — so neither static_argnums nor a
# WeakKeyDictionary works; key by id with weakref cleanup) and per
# n_frames; params flow in as a traced pytree, not baked constants, so
# repeated generation (validation epochs, serving) never re-traces
_DECODE_CACHE: dict = {}  # id(net) -> {n_frames: jitted fn}


def _get_decoder(net: T2GNet, n_frames: int):
    import weakref

    key = id(net)
    per_net = _DECODE_CACHE.get(key)
    if per_net is None:
        per_net = _DECODE_CACHE[key] = {}
        try:
            weakref.finalize(net, _DECODE_CACHE.pop, key, None)
        except TypeError:
            pass  # not weakref-able: entry lives for the process
    if n_frames not in per_net:
        t_max = net.max_time_steps

        @jax.jit
        def run(params, text, tags, offset_lengths):
            b = text.shape[0]
            d = params["text_offsets_to_gestures"]["kernel"].shape[-1]
            start = jnp.tile(jnp.asarray(IDENTITY_QUAT), (d // 4,))
            buf = jnp.broadcast_to(start, (b, t_max, d))

            def body(t, carry):
                buf, out = carry
                pred, _ = net.apply({"params": params}, text, tags, buf,
                                    offset_lengths, train=False)
                frame = jax.lax.dynamic_slice_in_dim(pred, t, 1, axis=1)
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, frame, t, axis=1)
                buf = jax.lax.dynamic_update_slice_in_dim(
                    buf, frame, jnp.minimum(t + 1, t_max - 1), axis=1)
                return buf, out

            _, out = jax.lax.fori_loop(
                0, n_frames, body, (buf, jnp.zeros((b, t_max, d))))
            return out

        per_net[n_frames] = run
    return per_net[n_frames]


def generate_quat_sequence(net: T2GNet, params, text, tags, offset_lengths,
                           n_frames: int | None = None) -> np.ndarray:
    """Greedy autoregressive decode: ONE jitted program running a
    lax.fori_loop over a fixed-length identity-initialized frame buffer —
    frame t's prediction is written at slot t+1 of the decoder input and
    the final buffer of predictions is returned (B, T, J*4), unit-norm
    per quaternion channel group."""
    t_max = net.max_time_steps
    n_frames = t_max if n_frames is None else min(int(n_frames), t_max)
    run = _get_decoder(net, n_frames)
    out = np.asarray(run(
        params, jnp.asarray(text), [jnp.asarray(t) for t in tags],
        jnp.asarray(offset_lengths),
    ))
    return out[:, :n_frames]
