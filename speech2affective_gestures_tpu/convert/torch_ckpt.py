"""Torch checkpoint -> JAX pytree conversion.

The reference saves `{'gen_model_dict', 'dis_model_dict'}` state dicts
(`processor_v2.py:1064-1069`), possibly with DataParallel 'module.' prefixes
(`torchlight/torchlight/io.py:65-66,104-105`).  This module provides:

- primitive layout mappers from torch tensor layouts to the layouts used by
  `models/layers.py` (channel-last kernels, (in, out) dense kernels);
- state-dict walkers that assemble full flax param/batch_stats trees for the
  framework's models.

All mappers take/return numpy arrays, so conversion runs without torch
installed when fed pre-exported arrays (np.savez of a state_dict).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def strip_module_prefix(state_dict: StateDict) -> dict[str, Array]:
    """Drop DataParallel 'module.' prefixes (torchlight io.py:65-66)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }


# --- primitive layout mappers ----------------------------------------------

def linear(w: Array, b: Array | None = None) -> dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def conv1d(w: Array, b: Array | None = None) -> dict[str, Array]:
    # torch (Cout, Cin, K) -> (K, Cin, Cout)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def conv_transpose1d(w: Array, b: Array | None = None) -> dict[str, Array]:
    # torch (Cin, Cout, K) -> (K, Cin, Cout)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 0, 1)))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def conv2d(w: Array, b: Array | None = None) -> dict[str, Array]:
    # torch (Cout, Cin, kh, kw) -> (kh, kw, Cin, Cout)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def conv_transpose2d(w: Array, b: Array | None = None) -> dict[str, Array]:
    # torch (Cin, Cout, kh, kw) -> (kh, kw, Cin, Cout)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def wn_conv1d(w_v: Array, w_g: Array, b: Array | None = None) -> dict[str, Array]:
    # torch weight_norm(Conv1d): weight_v (Cout, Cin, K), weight_g (Cout,1,1)
    out = {
        "v": np.ascontiguousarray(np.transpose(w_v, (2, 1, 0))),
        "g": np.asarray(w_g).reshape(-1),
    }
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def batch_norm(
    weight: Array, bias: Array, running_mean: Array, running_var: Array
) -> tuple[dict[str, Array], dict[str, Array]]:
    params = {"scale": np.asarray(weight), "bias": np.asarray(bias)}
    stats = {"mean": np.asarray(running_mean), "var": np.asarray(running_var)}
    return params, stats


def gru(state_dict: StateDict, prefix: str, num_layers: int, bidirectional: bool
        ) -> dict[str, Array]:
    """Map torch nn.GRU parameters to the `layers.GRU` param dict."""
    out: dict[str, Array] = {}
    dirs = ["", "_reverse"] if bidirectional else [""]
    for layer in range(num_layers):
        for d, suffix in enumerate(dirs):
            tag = f"l{layer}" + ("_rev" if d else "")
            out[f"w_ih_{tag}"] = np.ascontiguousarray(
                np.asarray(state_dict[f"{prefix}weight_ih_l{layer}{suffix}"]).T
            )
            out[f"w_hh_{tag}"] = np.ascontiguousarray(
                np.asarray(state_dict[f"{prefix}weight_hh_l{layer}{suffix}"]).T
            )
            out[f"b_ih_{tag}"] = np.asarray(state_dict[f"{prefix}bias_ih_l{layer}{suffix}"])
            out[f"b_hh_{tag}"] = np.asarray(state_dict[f"{prefix}bias_hh_l{layer}{suffix}"])
    return out


def embedding(w: Array) -> dict[str, Array]:
    return {"embedding": np.asarray(w)}


# --------------------------------------------------------------------------
# module-tree walkers (reference state_dict prefixes -> flax param trees)
#
# Each returns (params, batch_stats) dicts matching the corresponding module
# in models/. Reference key structure cited per function.
# --------------------------------------------------------------------------

def _bn(sd: StateDict, prefix: str):
    return batch_norm(
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
        sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
    )


def _conv1d(sd: StateDict, prefix: str):
    return conv1d(sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"))


def _conv2d(sd: StateDict, prefix: str):
    return conv2d(sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"))


def _linear(sd: StateDict, prefix: str):
    return linear(sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"))


def temporal_conv_net(sd: StateDict, prefix: str, n_levels: int):
    """TemporalConvNet (ref net/tcn.py:49-64; keys network.{i}.conv1.weight_g
    / weight_v / bias, conv2.*, downsample.*)."""
    params: dict[str, Any] = {}
    for i in range(n_levels):
        block: dict[str, Any] = {}
        for j in (1, 2):
            block[f"conv{j}"] = {
                "WNConv1d_0": wn_conv1d(
                    sd[f"{prefix}network.{i}.conv{j}.weight_v"],
                    sd[f"{prefix}network.{i}.conv{j}.weight_g"],
                    sd[f"{prefix}network.{i}.conv{j}.bias"],
                )
            }
        if f"{prefix}network.{i}.downsample.weight" in sd:
            block["downsample"] = _conv1d(sd, f"{prefix}network.{i}.downsample")
        params[f"block{i}"] = block
    return params


def text_encoder_tcn(sd: StateDict, prefix: str, n_layers: int):
    """TextEncoderTCN (ref net/multimodal_context_net_v2.py:61-91)."""
    params = {
        "embedding": embedding(sd[f"{prefix}embedding.weight"]),
        "tcn": temporal_conv_net(sd, f"{prefix}tcn.", n_layers),
        "decoder": _linear(sd, f"{prefix}decoder"),
    }
    return params, {}


def st_graph_conv(sd: StateDict, prefix: str, transpose: bool = False):
    """STGraphConv (ref net/utils/tgcn.py:133-218): gcn.conv, tcn.{0,2,3},
    residual.{0,1}."""
    cv = conv_transpose2d if transpose else conv2d

    def conv(p):
        return cv(sd[f"{p}.weight"], sd.get(f"{p}.bias"))

    params: dict[str, Any] = {"gcn": {"conv": conv(f"{prefix}gcn.conv")}}
    stats: dict[str, Any] = {}
    p, s = _bn(sd, f"{prefix}tcn.0")
    params["tcn_bn1"], stats["tcn_bn1"] = p, s
    params["tcn_conv"] = conv(f"{prefix}tcn.2")
    p, s = _bn(sd, f"{prefix}tcn.3")
    params["tcn_bn2"], stats["tcn_bn2"] = p, s
    if f"{prefix}residual.0.weight" in sd:
        params["res_conv"] = conv(f"{prefix}residual.0")
        p, s = _bn(sd, f"{prefix}residual.1")
        params["res_bn"], stats["res_bn"] = p, s
    return params, stats


def aff_encoder(sd: StateDict, prefix: str):
    """AffEncoder (ref net/multimodal_context_net_v2.py:94-175)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for name in ("st_gcn1", "st_gcn2"):
        p, s = st_graph_conv(sd, f"{prefix}{name}.")
        params[name], stats[name] = p, s
    for name in ("batch_norm1", "batch_norm2", "bn3", "bn4"):
        ref = {"bn3": "batch_norm3", "bn4": "batch_norm4"}.get(name, name)
        p, s = _bn(sd, f"{prefix}{ref}")
        params[name], stats[name] = p, s
    params["conv3"] = _conv1d(sd, f"{prefix}conv3")
    params["conv4"] = _conv1d(sd, f"{prefix}conv4")
    return params, stats


def mfcc_encoder(sd: StateDict, prefix: str):
    """MFCCEncoder (ref net/multimodal_context_net_v2.py:36-58)."""
    params: dict[str, Any] = {"linear1": _linear(sd, f"{prefix}linear1")}
    stats: dict[str, Any] = {}
    for i in range(1, 5):
        params[f"conv{i}"] = _conv1d(sd, f"{prefix}conv{i}")
        p, s = _bn(sd, f"{prefix}batch_norm{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    return params, stats


def wav_encoder(sd: StateDict, prefix: str):
    """WavEncoder (ref net/multimodal_context_net_v2.py:14-33; Sequential
    feat_extractor indices 0,1,3,4,6,7,9)."""
    conv_idx = {"conv1": 0, "conv2": 3, "conv3": 6, "conv4": 9}
    bn_idx = {"bn1": 1, "bn2": 4, "bn3": 7}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for name, i in conv_idx.items():
        params[name] = _conv1d(sd, f"{prefix}feat_extractor.{i}")
    for name, i in bn_idx.items():
        p, s = _bn(sd, f"{prefix}feat_extractor.{i}")
        params[name], stats[name] = p, s
    return params, stats


def speaker_z(sd: StateDict, prefix_embed: str, prefix_mu: str, prefix_logvar: str):
    """speaker_embedding Sequential(Embedding, Linear) + mu/log_var heads
    (ref net/multimodal_context_net_v2.py:470-475)."""
    return {
        "embedding": embedding(sd[f"{prefix_embed}.0.weight"]),
        "proj": _linear(sd, f"{prefix_embed}.1"),
        "mu": _linear(sd, prefix_mu),
        "log_var": _linear(sd, prefix_logvar),
    }


def pose_generator(sd: StateDict, n_layers: int = 4, variant: str = "s2ag"):
    """PoseGenerator state dict -> (params, batch_stats).

    variant: 's2ag' (MFCC + AffEncoder), 'abl_audio' (WavEncoder audio
    path, net/multimodal_context_net_v2_abl_audio.py), 'abl_aff' (raw
    pre-seq, no AffEncoder, ..._abl_aff.py)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    if variant == "abl_audio":
        params["audio_encoder"], stats["audio_encoder"] = wav_encoder(
            sd, "audio_encoder."
        )
    else:
        params["audio_encoder"], stats["audio_encoder"] = mfcc_encoder(
            sd, "audio_encoder."
        )
    params["text_encoder"], _ = text_encoder_tcn(sd, "text_encoder.", n_layers)
    if variant != "abl_aff":
        params["aff_encoder"], stats["aff_encoder"] = aff_encoder(sd, "aff_encoder.")
    if "speaker_embedding.0.weight" in sd:
        params["speaker_z"] = speaker_z(
            sd, "speaker_embedding", "speaker_mu", "speaker_log_var"
        )
    params["gru"] = gru(sd, "gru.", n_layers, bidirectional=True)
    params["out1"] = _linear(sd, "out.0")
    params["out2"] = _linear(sd, "out.2")
    return params, stats


def pose_generator_trimodal(sd: StateDict, n_layers: int = 4):
    """PoseGeneratorTriModal state dict -> (params, batch_stats)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["audio_encoder"], stats["audio_encoder"] = wav_encoder(sd, "audio_encoder.")
    params["text_encoder"], _ = text_encoder_tcn(sd, "text_encoder.", n_layers)
    if "speaker_embedding.0.weight" in sd:
        params["speaker_z"] = speaker_z(
            sd, "speaker_embedding", "speaker_mu", "speaker_log_var"
        )
    params["gru"] = gru(sd, "gru.", n_layers, bidirectional=True)
    params["out1"] = _linear(sd, "out.0")
    params["out2"] = _linear(sd, "out.2")
    return params, stats


def aff_discriminator(sd: StateDict):
    """AffDiscriminator state dict -> (params, batch_stats)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["aff_encoder"], stats["aff_encoder"] = aff_encoder(sd, "aff_encoder.")
    params["gru"] = gru(sd, "gru.", 4, bidirectional=True)
    params["out"] = _linear(sd, "out")
    params["out2"] = _linear(sd, "out2")
    return params, stats


def conv_discriminator_trimodal(sd: StateDict):
    """ConvDiscriminatorTriModal state dict (pre_conv indices 0,1,3,4,6)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {
        "pre_conv1": _conv1d(sd, "pre_conv.0"),
        "pre_conv2": _conv1d(sd, "pre_conv.3"),
        "pre_conv3": _conv1d(sd, "pre_conv.6"),
        "gru": gru(sd, "gru.", 4, bidirectional=True),
        "out": _linear(sd, "out"),
        "out2": _linear(sd, "out2"),
    }
    stats: dict[str, Any] = {}
    p, s = _bn(sd, "pre_conv.1")
    params["pre_bn1"], stats["pre_bn1"] = p, s
    p, s = _bn(sd, "pre_conv.4")
    params["pre_bn2"], stats["pre_bn2"] = p, s
    return params, stats


def pose_generator_v1(sd: StateDict, n_layers: int = 4):
    """v1 emotion-conditioned PoseGenerator (net/multimodal_context_net_v1.py
    :261-360) — identical parameter structure to the trimodal generator
    (emotion conditioning happens at forward time only)."""
    return pose_generator_trimodal(sd, n_layers)


def aff_discriminator_v1(sd: StateDict):
    """v1 AffDiscriminator (net/multimodal_context_net_v1.py:363-463):
    two ST-GCN stages (no per-node BN), conv1/conv2 + BN, emotion-aware GRU."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for name in ("st_gcn1", "st_gcn2"):
        p, s = st_graph_conv(sd, f"{name}.")
        params[name], stats[name] = p, s
    params["conv1"] = _conv1d(sd, "conv1")
    params["conv2"] = _conv1d(sd, "conv2")
    p, s = _bn(sd, "batch_norm1")
    params["bn1"], stats["bn1"] = p, s
    p, s = _bn(sd, "batch_norm2")
    params["bn2"], stats["bn2"] = p, s
    params["gru"] = gru(sd, "gru.", 4, bidirectional=True)
    params["out"] = _linear(sd, "out")
    params["out2"] = _linear(sd, "out2")
    return params, stats


def att_conv_rnn(sd: StateDict):
    """v1 SER AttConvRNN (net/ser_att_conv_rnn_v1.py:37-150)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {
        f"conv{i}": _conv2d(sd, f"conv{i}") for i in range(1, 7)
    }
    params["linear1"] = _linear(sd, "linear1")
    p, s = _bn(sd, "batch_norm_linear1")
    params["bn_linear1"] = p
    stats = {"bn_linear1": s}
    # the reference names its LSTM 'gru'; layout matches the GRU mapper
    params["lstm"] = gru(sd, "gru.", 1, bidirectional=True)
    params["attention"] = {
        "Dense_0": _linear(sd, "attention.linear1"),
        "Dense_1": _linear(sd, "attention.linear2"),
    }
    params["linear2"] = _linear(sd, "linear2")
    params["linear3"] = _linear(sd, "linear3")
    return params, stats


def embedding_net_pose(sd: StateDict):
    """EmbeddingNet(mode='pose') state dict (ref net/embedding_net.py:262-274;
    the frozen FGD weights in outputs/embedding_net.pth.tar)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    enc: dict[str, Any] = {}
    enc_stats: dict[str, Any] = {}
    for i in range(3):  # ConvNormRelu blocks: net.{i}.0 conv, net.{i}.1 BN
        blk = {"conv": _conv1d(sd, f"pose_encoder.net.{i}.0")}
        p, s = _bn(sd, f"pose_encoder.net.{i}.1")
        blk["bn"] = p
        enc[f"net{i}"] = blk
        enc_stats[f"net{i}"] = {"bn": s}
    enc["net3"] = _conv1d(sd, "pose_encoder.net.3")
    enc["out_net0"] = _linear(sd, "pose_encoder.out_net.0")
    p, s = _bn(sd, "pose_encoder.out_net.1")
    enc["out_bn0"], enc_stats["out_bn0"] = p, s
    enc["out_net1"] = _linear(sd, "pose_encoder.out_net.3")
    p, s = _bn(sd, "pose_encoder.out_net.4")
    enc["out_bn1"], enc_stats["out_bn1"] = p, s
    enc["out_net2"] = _linear(sd, "pose_encoder.out_net.6")
    enc["fc_mu"] = _linear(sd, "pose_encoder.fc_mu")
    enc["fc_log_var"] = _linear(sd, "pose_encoder.fc_log_var")
    params["pose_encoder"], stats["pose_encoder"] = enc, enc_stats

    dec: dict[str, Any] = {}
    dec_stats: dict[str, Any] = {}
    dec["pre0"] = _linear(sd, "decoder.pre_net.0")
    p, s = _bn(sd, "decoder.pre_net.1")
    dec["pre_bn0"], dec_stats["pre_bn0"] = p, s
    dec["pre1"] = _linear(sd, "decoder.pre_net.3")
    dec["net0"] = conv_transpose1d(sd["decoder.net.0.weight"], sd["decoder.net.0.bias"])
    p, s = _bn(sd, "decoder.net.1")
    dec["bn0"], dec_stats["bn0"] = p, s
    dec["net1"] = conv_transpose1d(sd["decoder.net.3.weight"], sd["decoder.net.3.bias"])
    p, s = _bn(sd, "decoder.net.4")
    dec["bn1"], dec_stats["bn1"] = p, s
    dec["net2"] = _conv1d(sd, "decoder.net.6")
    dec["net3"] = _conv1d(sd, "decoder.net.7")
    params["decoder"], stats["decoder"] = dec, dec_stats
    return params, stats


def load_pth_tar(path: str):
    """Load a reference checkpoint file; requires torch at call time."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return {
        k: {kk: vv.numpy() for kk, vv in v.items()} if hasattr(v, "items") else v
        for k, v in blob.items()
    }


def convert_s2ag_checkpoint(blob: Mapping[str, Any], variant: str = "s2ag",
                            n_layers: int = 4):
    """{'gen_model_dict', 'dis_model_dict'} -> flax variable trees for
    (PoseGenerator, AffDiscriminator | ConvDiscriminator);
    ref processor_v2.py:1064-1069 and the ablation processors.
    n_layers: generator GRU depth / TCN level count (reference default 4)."""
    gp, gs = pose_generator(blob["gen_model_dict"], n_layers=n_layers,
                            variant=variant)
    if variant == "abl_aff":  # plain ConvDiscriminator (abl_aff.py:394)
        dp, ds = conv_discriminator_trimodal(blob["dis_model_dict"])
    else:
        dp, ds = aff_discriminator(blob["dis_model_dict"])
    return (
        {"params": gp, "batch_stats": gs},
        {"params": dp, "batch_stats": ds},
    )

