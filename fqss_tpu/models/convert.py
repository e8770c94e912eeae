"""Torch-checkpoint import: map reference float state_dicts to flax params.

Lets users of the reference framework bring their pretrained float models
(e.g. asteroid ConvTasNet .pth files consumed by
train_env/train_utils.py:8-27) into this framework. Input is a flat
``{name: np.ndarray}`` dict (call ``{k: v.numpy() for k, v in sd.items()}``
on a torch state_dict) — torch itself is not required here.

Layout transforms:
* Conv1d   [Co, Ci, k]  -> (k, Ci, Co)
* ConvT1d  [Ci, Co, k]  -> (k, Ci, Co)
* Conv2d   [Co, Ci, kh, kw] -> (kh, kw, Ci, Co)
* Linear   [out, in]    -> (in, out)
* GroupNorm/LayerNorm weight -> scale
* PReLU weight -> alpha
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def conv1d_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def convt1d_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


def conv2d_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convt2d_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w))


def _conv(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": conv1d_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"norm": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def convtasnet_params_from_torch(sd: Mapping[str, np.ndarray], n_repeats: int = 3, n_blocks: int = 8) -> dict:
    """Map a reference float ConvTasNetQ state_dict (convtasnetq.py:118-288)
    onto the flax param tree of :class:`fqss_tpu.models.convtasnet.ConvTasNet`."""
    params: dict = {}
    params["encoder"] = {"conv": {"kernel": conv1d_w(sd["encoder.weight"])}}
    masker: dict = {
        "bottleneck_norm": _norm(sd, "masker.bottleneck.0"),
        "bottleneck_conv": _conv(sd, "masker.bottleneck.1"),
        "mask_prelu": {"nl": {"alpha": sd["masker.mask_net.0.weight"]}},
        "mask_conv": _conv(sd, "masker.mask_net.1"),
    }
    idx = 0
    for s in range(n_repeats):
        for layer in range(n_blocks):
            p = f"masker.TCN.{idx}"
            masker[f"tcn_{s}_{layer}"] = {
                "conv_in": {**_conv(sd, f"{p}.shared_block.0"), "nl": {"alpha": sd[f"{p}.shared_block.1.weight"]}},
                "norm_in": _norm(sd, f"{p}.shared_block.2"),
                "conv_dw": {**_conv(sd, f"{p}.shared_block.3"), "nl": {"alpha": sd[f"{p}.shared_block.4.weight"]}},
                "norm_dw": _norm(sd, f"{p}.shared_block.5"),
                "res_conv": _conv(sd, f"{p}.res_conv"),
                "skip_conv": _conv(sd, f"{p}.skip_conv"),
            }
            idx += 1
    params["masker"] = masker
    params["decoder"] = {"kernel": convt1d_w(sd["decoder.weight"])}
    return params
