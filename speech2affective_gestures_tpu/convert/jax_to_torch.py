"""JAX pytree -> torch checkpoint conversion (the reverse of torch_ckpt).

Lets a TPU-trained model be scored in the reference harness: the emitted
state dicts load into the reference's own modules
(`processor_v2.py:357-358` expects `{'gen_model_dict', 'dis_model_dict'}`;
`torchlight/torchlight/io.py:101-106` saves raw state dicts) and the whole
loop closes — `torch_ckpt` ingests what this module emits and vice versa.

Every mapper here is the exact inverse of its `torch_ckpt` counterpart
(same function name, `_inv` suffix): pure layout transforms (transposes /
reshapes), no recomputation, so torch->jax->torch round-trips are
bit-identical on every tensor the forward direction reads. The only keys
the reverse direction cannot recover are torch BN `num_batches_tracked`
counters (the forward mapper drops them — flax BatchNorm has no analog);
they are emitted as 0 so `load_state_dict(strict=True)` still succeeds.

All functions take/return numpy arrays; torch is only needed by
`save_pth_tar` at call time.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Array = np.ndarray


def add_module_prefix(state_dict: Mapping[str, Array]) -> dict[str, Array]:
    """Prepend DataParallel 'module.' prefixes (the reference wraps both
    nets in nn.DataParallel before state_dict(), processor_v2.py:305-310)."""
    return {f"module.{k}": v for k, v in state_dict.items()}


# --- primitive inverse mappers ---------------------------------------------
# Each inverts the same-named mapper in torch_ckpt (cited per function).


def linear_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.linear: kernel (in, out) -> weight (out, in)."""
    out = {f"{prefix}.weight": np.ascontiguousarray(np.asarray(p["kernel"]).T)}
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def conv1d_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.conv1d: (K, Cin, Cout) -> (Cout, Cin, K)."""
    out = {f"{prefix}.weight": np.ascontiguousarray(
        np.transpose(np.asarray(p["kernel"]), (2, 1, 0)))}
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def conv_transpose1d_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.conv_transpose1d: (K, Cin, Cout) -> (Cin, Cout, K)."""
    out = {f"{prefix}.weight": np.ascontiguousarray(
        np.transpose(np.asarray(p["kernel"]), (1, 2, 0)))}
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def conv2d_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.conv2d: (kh, kw, Cin, Cout) -> (Cout, Cin, kh, kw)."""
    out = {f"{prefix}.weight": np.ascontiguousarray(
        np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))}
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def conv_transpose2d_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.conv_transpose2d: (kh, kw, Cin, Cout) -> (Cin, Cout, kh, kw)."""
    out = {f"{prefix}.weight": np.ascontiguousarray(
        np.transpose(np.asarray(p["kernel"]), (2, 3, 0, 1)))}
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def wn_conv1d_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.wn_conv1d: v (K, Cin, Cout) -> weight_v
    (Cout, Cin, K); g (Cout,) -> weight_g (Cout, 1, 1). Exact — the flax
    module keeps the same (v, g) reparameterization torch weight_norm uses
    (models/tcn.py), so nothing is recomputed."""
    out = {
        f"{prefix}.weight_v": np.ascontiguousarray(
            np.transpose(np.asarray(p["v"]), (2, 1, 0))),
        f"{prefix}.weight_g": np.asarray(p["g"]).reshape(-1, 1, 1),
    }
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def batch_norm_inv(params: Mapping[str, Array], stats: Mapping[str, Array],
                   prefix: str) -> dict[str, Array]:
    """Inverse of torch_ckpt.batch_norm. num_batches_tracked is emitted as
    0 (information the jax side never carries; only used by torch when
    momentum=None, which the reference never does)."""
    return {
        f"{prefix}.weight": np.asarray(params["scale"]),
        f"{prefix}.bias": np.asarray(params["bias"]),
        f"{prefix}.running_mean": np.asarray(stats["mean"]),
        f"{prefix}.running_var": np.asarray(stats["var"]),
        f"{prefix}.num_batches_tracked": np.asarray(0, dtype=np.int64),
    }


def gru_inv(p: Mapping[str, Array], prefix: str,
            num_layers: int | None = None,
            bidirectional: bool | None = None) -> dict[str, Array]:
    """Inverse of torch_ckpt.gru (layers.GRU param dict -> nn.GRU keys).
    Layer count / directionality default to what the param dict contains
    (so callers don't have to thread the module config through)."""
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split("_l")[-1].removesuffix("_rev"))
            for k in p if k.startswith("w_ih_l")
        )
    if bidirectional is None:
        bidirectional = "w_ih_l0_rev" in p
    out: dict[str, Array] = {}
    dirs = ["", "_reverse"] if bidirectional else [""]
    for layer in range(num_layers):
        for d, suffix in enumerate(dirs):
            tag = f"l{layer}" + ("_rev" if d else "")
            out[f"{prefix}weight_ih_l{layer}{suffix}"] = np.ascontiguousarray(
                np.asarray(p[f"w_ih_{tag}"]).T)
            out[f"{prefix}weight_hh_l{layer}{suffix}"] = np.ascontiguousarray(
                np.asarray(p[f"w_hh_{tag}"]).T)
            out[f"{prefix}bias_ih_l{layer}{suffix}"] = np.asarray(
                p[f"b_ih_{tag}"])
            out[f"{prefix}bias_hh_l{layer}{suffix}"] = np.asarray(
                p[f"b_hh_{tag}"])
    return out


def embedding_inv(p: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    return {f"{prefix}.weight": np.asarray(p["embedding"])}


# --------------------------------------------------------------------------
# module-tree reverse walkers (flax trees -> reference state_dict keys)
# each mirrors the same-named torch_ckpt walker key-for-key
# --------------------------------------------------------------------------


def temporal_conv_net_inv(p: Mapping[str, Any], prefix: str) -> dict[str, Array]:
    """The reference's TemporalBlock registers each conv TWICE — as an
    attribute (`conv1`/`conv2`) and inside its `net` Sequential (indices 0
    and 4, net/tcn.py:20-32) — so its state_dict carries both key families
    over the same tensors. Emit both so `load_state_dict(strict=True)` on
    the reference module succeeds."""
    out: dict[str, Array] = {}
    net_idx = {1: 0, 2: 4}
    for name, block in p.items():
        i = int(name.removeprefix("block"))
        for j in (1, 2):
            conv = wn_conv1d_inv(block[f"conv{j}"]["WNConv1d_0"],
                                 f"{prefix}network.{i}.conv{j}")
            out.update(conv)
            out.update({
                k.replace(f".conv{j}.", f".net.{net_idx[j]}."): v
                for k, v in conv.items()
            })
        if "downsample" in block:
            out.update(conv1d_inv(block["downsample"],
                                  f"{prefix}network.{i}.downsample"))
    return out


def text_encoder_tcn_inv(p: Mapping[str, Any], prefix: str) -> dict[str, Array]:
    out = embedding_inv(p["embedding"], f"{prefix}embedding")
    out.update(temporal_conv_net_inv(p["tcn"], f"{prefix}tcn."))
    out.update(linear_inv(p["decoder"], f"{prefix}decoder"))
    return out


def st_graph_conv_inv(p: Mapping[str, Any], s: Mapping[str, Any],
                      prefix: str) -> dict[str, Array]:
    out = conv2d_inv(p["gcn"]["conv"], f"{prefix}gcn.conv")
    out.update(batch_norm_inv(p["tcn_bn1"], s["tcn_bn1"], f"{prefix}tcn.0"))
    out.update(conv2d_inv(p["tcn_conv"], f"{prefix}tcn.2"))
    out.update(batch_norm_inv(p["tcn_bn2"], s["tcn_bn2"], f"{prefix}tcn.3"))
    if "res_conv" in p:
        out.update(conv2d_inv(p["res_conv"], f"{prefix}residual.0"))
        out.update(batch_norm_inv(p["res_bn"], s["res_bn"],
                                  f"{prefix}residual.1"))
    return out


def aff_encoder_inv(p: Mapping[str, Any], s: Mapping[str, Any],
                    prefix: str) -> dict[str, Array]:
    out: dict[str, Array] = {}
    for name in ("st_gcn1", "st_gcn2"):
        out.update(st_graph_conv_inv(p[name], s[name], f"{prefix}{name}."))
    for name in ("batch_norm1", "batch_norm2", "bn3", "bn4"):
        ref = {"bn3": "batch_norm3", "bn4": "batch_norm4"}.get(name, name)
        out.update(batch_norm_inv(p[name], s[name], f"{prefix}{ref}"))
    out.update(conv1d_inv(p["conv3"], f"{prefix}conv3"))
    out.update(conv1d_inv(p["conv4"], f"{prefix}conv4"))
    return out


def mfcc_encoder_inv(p: Mapping[str, Any], s: Mapping[str, Any],
                     prefix: str) -> dict[str, Array]:
    out = linear_inv(p["linear1"], f"{prefix}linear1")
    for i in range(1, 5):
        out.update(conv1d_inv(p[f"conv{i}"], f"{prefix}conv{i}"))
        out.update(batch_norm_inv(p[f"bn{i}"], s[f"bn{i}"],
                                  f"{prefix}batch_norm{i}"))
    return out


def wav_encoder_inv(p: Mapping[str, Any], s: Mapping[str, Any],
                    prefix: str) -> dict[str, Array]:
    conv_idx = {"conv1": 0, "conv2": 3, "conv3": 6, "conv4": 9}
    bn_idx = {"bn1": 1, "bn2": 4, "bn3": 7}
    out: dict[str, Array] = {}
    for name, i in conv_idx.items():
        out.update(conv1d_inv(p[name], f"{prefix}feat_extractor.{i}"))
    for name, i in bn_idx.items():
        out.update(batch_norm_inv(p[name], s[name],
                                  f"{prefix}feat_extractor.{i}"))
    return out


def speaker_z_inv(p: Mapping[str, Any], prefix_embed: str, prefix_mu: str,
                  prefix_logvar: str) -> dict[str, Array]:
    out = embedding_inv(p["embedding"], f"{prefix_embed}.0")
    out.update(linear_inv(p["proj"], f"{prefix_embed}.1"))
    out.update(linear_inv(p["mu"], prefix_mu))
    out.update(linear_inv(p["log_var"], prefix_logvar))
    return out


def pose_generator_inv(variables: Mapping[str, Any], n_layers: int = 4,
                       variant: str = "s2ag") -> dict[str, Array]:
    """Inverse of torch_ckpt.pose_generator for all three variants."""
    p, s = variables["params"], variables.get("batch_stats", {})
    out: dict[str, Array] = {}
    if variant == "abl_audio":
        out.update(wav_encoder_inv(p["audio_encoder"], s["audio_encoder"],
                                   "audio_encoder."))
    else:
        out.update(mfcc_encoder_inv(p["audio_encoder"], s["audio_encoder"],
                                    "audio_encoder."))
    out.update(text_encoder_tcn_inv(p["text_encoder"], "text_encoder."))
    if variant != "abl_aff":
        out.update(aff_encoder_inv(p["aff_encoder"], s["aff_encoder"],
                                   "aff_encoder."))
    if "speaker_z" in p:
        out.update(speaker_z_inv(p["speaker_z"], "speaker_embedding",
                                 "speaker_mu", "speaker_log_var"))
    out.update(gru_inv(p["gru"], "gru."))
    out.update(linear_inv(p["out1"], "out.0"))
    out.update(linear_inv(p["out2"], "out.2"))
    return out


def pose_generator_trimodal_inv(variables: Mapping[str, Any],
                                n_layers: int = 4) -> dict[str, Array]:
    p, s = variables["params"], variables.get("batch_stats", {})
    out = wav_encoder_inv(p["audio_encoder"], s["audio_encoder"],
                          "audio_encoder.")
    out.update(text_encoder_tcn_inv(p["text_encoder"], "text_encoder."))
    if "speaker_z" in p:
        out.update(speaker_z_inv(p["speaker_z"], "speaker_embedding",
                                 "speaker_mu", "speaker_log_var"))
    out.update(gru_inv(p["gru"], "gru."))
    out.update(linear_inv(p["out1"], "out.0"))
    out.update(linear_inv(p["out2"], "out.2"))
    return out


def pose_generator_v1_inv(variables: Mapping[str, Any],
                          n_layers: int = 4) -> dict[str, Array]:
    """v1 generator shares the trimodal parameter structure
    (torch_ckpt.pose_generator_v1)."""
    return pose_generator_trimodal_inv(variables, n_layers)


def aff_discriminator_inv(variables: Mapping[str, Any]) -> dict[str, Array]:
    p, s = variables["params"], variables.get("batch_stats", {})
    out = aff_encoder_inv(p["aff_encoder"], s["aff_encoder"], "aff_encoder.")
    out.update(gru_inv(p["gru"], "gru."))
    out.update(linear_inv(p["out"], "out"))
    out.update(linear_inv(p["out2"], "out2"))
    return out


def conv_discriminator_trimodal_inv(variables: Mapping[str, Any]
                                    ) -> dict[str, Array]:
    p, s = variables["params"], variables.get("batch_stats", {})
    out = conv1d_inv(p["pre_conv1"], "pre_conv.0")
    out.update(batch_norm_inv(p["pre_bn1"], s["pre_bn1"], "pre_conv.1"))
    out.update(conv1d_inv(p["pre_conv2"], "pre_conv.3"))
    out.update(batch_norm_inv(p["pre_bn2"], s["pre_bn2"], "pre_conv.4"))
    out.update(conv1d_inv(p["pre_conv3"], "pre_conv.6"))
    out.update(gru_inv(p["gru"], "gru."))
    out.update(linear_inv(p["out"], "out"))
    out.update(linear_inv(p["out2"], "out2"))
    return out


def aff_discriminator_v1_inv(variables: Mapping[str, Any]) -> dict[str, Array]:
    p, s = variables["params"], variables.get("batch_stats", {})
    out: dict[str, Array] = {}
    for name in ("st_gcn1", "st_gcn2"):
        out.update(st_graph_conv_inv(p[name], s[name], f"{name}."))
    out.update(conv1d_inv(p["conv1"], "conv1"))
    out.update(conv1d_inv(p["conv2"], "conv2"))
    out.update(batch_norm_inv(p["bn1"], s["bn1"], "batch_norm1"))
    out.update(batch_norm_inv(p["bn2"], s["bn2"], "batch_norm2"))
    out.update(gru_inv(p["gru"], "gru."))
    out.update(linear_inv(p["out"], "out"))
    out.update(linear_inv(p["out2"], "out2"))
    return out


def att_conv_rnn_inv(variables: Mapping[str, Any]) -> dict[str, Array]:
    p, s = variables["params"], variables.get("batch_stats", {})
    out: dict[str, Array] = {}
    for i in range(1, 7):
        out.update(conv2d_inv(p[f"conv{i}"], f"conv{i}"))
    out.update(linear_inv(p["linear1"], "linear1"))
    out.update(batch_norm_inv(p["bn_linear1"], s["bn_linear1"],
                              "batch_norm_linear1"))
    out.update(gru_inv(p["lstm"], "gru."))
    out.update(linear_inv(p["attention"]["Dense_0"], "attention.linear1"))
    out.update(linear_inv(p["attention"]["Dense_1"], "attention.linear2"))
    out.update(linear_inv(p["linear2"], "linear2"))
    out.update(linear_inv(p["linear3"], "linear3"))
    return out


def embedding_net_pose_inv(variables: Mapping[str, Any]) -> dict[str, Array]:
    """Inverse of torch_ckpt.embedding_net_pose (the FGD evaluator weights
    — lets train/embedding_trainer.py output feed the reference's
    embedding_space_evaluator directly)."""
    p, s = variables["params"], variables.get("batch_stats", {})
    enc, enc_s = p["pose_encoder"], s["pose_encoder"]
    out: dict[str, Array] = {}
    for i in range(3):
        out.update(conv1d_inv(enc[f"net{i}"]["conv"],
                              f"pose_encoder.net.{i}.0"))
        out.update(batch_norm_inv(enc[f"net{i}"]["bn"],
                                  enc_s[f"net{i}"]["bn"],
                                  f"pose_encoder.net.{i}.1"))
    out.update(conv1d_inv(enc["net3"], "pose_encoder.net.3"))
    out.update(linear_inv(enc["out_net0"], "pose_encoder.out_net.0"))
    out.update(batch_norm_inv(enc["out_bn0"], enc_s["out_bn0"],
                              "pose_encoder.out_net.1"))
    out.update(linear_inv(enc["out_net1"], "pose_encoder.out_net.3"))
    out.update(batch_norm_inv(enc["out_bn1"], enc_s["out_bn1"],
                              "pose_encoder.out_net.4"))
    out.update(linear_inv(enc["out_net2"], "pose_encoder.out_net.6"))
    out.update(linear_inv(enc["fc_mu"], "pose_encoder.fc_mu"))
    out.update(linear_inv(enc["fc_log_var"], "pose_encoder.fc_log_var"))

    dec, dec_s = p["decoder"], s["decoder"]
    out.update(linear_inv(dec["pre0"], "decoder.pre_net.0"))
    out.update(batch_norm_inv(dec["pre_bn0"], dec_s["pre_bn0"],
                              "decoder.pre_net.1"))
    out.update(linear_inv(dec["pre1"], "decoder.pre_net.3"))
    out.update(conv_transpose1d_inv(dec["net0"], "decoder.net.0"))
    out.update(batch_norm_inv(dec["bn0"], dec_s["bn0"], "decoder.net.1"))
    out.update(conv_transpose1d_inv(dec["net1"], "decoder.net.3"))
    out.update(batch_norm_inv(dec["bn1"], dec_s["bn1"], "decoder.net.4"))
    out.update(conv1d_inv(dec["net2"], "decoder.net.6"))
    out.update(conv1d_inv(dec["net3"], "decoder.net.7"))
    return out


# --------------------------------------------------------------------------
# checkpoint assembly
# --------------------------------------------------------------------------


def to_s2ag_checkpoint(gen_variables: Mapping[str, Any],
                       dis_variables: Mapping[str, Any],
                       variant: str = "s2ag",
                       data_parallel: bool = True) -> dict[str, Any]:
    """Flax variable trees -> the reference's save blob
    `{'gen_model_dict', 'dis_model_dict'}` (processor_v2.py:1066-1067).
    data_parallel=True prepends 'module.' (the reference always saves
    through nn.DataParallel wrappers)."""
    gen_sd = pose_generator_inv(gen_variables, variant=variant)
    if variant == "abl_aff":
        dis_sd = conv_discriminator_trimodal_inv(dis_variables)
    else:
        dis_sd = aff_discriminator_inv(dis_variables)
    if data_parallel:
        gen_sd, dis_sd = add_module_prefix(gen_sd), add_module_prefix(dis_sd)
    return {"gen_model_dict": gen_sd, "dis_model_dict": dis_sd}


def save_pth_tar(blob: Mapping[str, Any], path: str) -> None:
    """Write a blob of numpy state dicts as a reference-loadable .pth.tar
    (torch.load'able; tensors on CPU). Requires torch at call time."""
    import torch

    def to_t(v):
        if isinstance(v, np.ndarray) or np.isscalar(v):
            # copy: jax.device_get buffers are read-only, torch wants writable
            return torch.from_numpy(np.array(v))
        if hasattr(v, "items"):
            return {k: to_t(x) for k, x in v.items()}
        return v

    torch.save({k: to_t(v) for k, v in blob.items()}, path)
