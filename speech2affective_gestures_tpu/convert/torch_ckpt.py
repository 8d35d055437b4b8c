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
