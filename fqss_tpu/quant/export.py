"""Deploy-grid export: freeze learned quantizer ranges to integer grids.

Equivalent of the reference's torch-export wrappers
(reference: quantization/qat/qat_quant.py:15-72 TorchWeightFakeQuantize /
TorchActivationFakeQuantize and the replacers at qat_utils.py:334-351):
after QAT, the learned (min, max) ranges are frozen into the integer-grid
(scale, zero_point) parameters a deployment runtime consumes, and the
frozen grid can be replayed with
:func:`fqss_tpu.quant.fake_quant.torch_fake_quantize_per_tensor` /
``..._per_channel`` to verify bit-exactness against the QAT model.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax

from fqss_tpu.quant.quantizers import QPARAMS


def freeze_weight_grid(min_range: np.ndarray, max_range: np.ndarray, n_bits: int = 8, sign: bool = True) -> dict:
    """Per-channel symmetric grid (TorchWeightFakeQuantize, qat_quant.py:15-35)."""
    max_abs = np.maximum(np.abs(min_range), np.abs(max_range))
    scales = max_abs / (2 ** (n_bits - int(sign)))
    return {
        "scales": scales.reshape(-1).astype(np.float32),
        "zero_points": np.zeros(scales.size, np.int32),
        "quant_min": -(2 ** (n_bits - 1)) if sign else 0,
        "quant_max": 2 ** (n_bits - 1) - 1 if sign else 2**n_bits - 1,
        "kind": "per_channel",
    }


def freeze_activation_grid(min_range: np.ndarray, max_range: np.ndarray, n_bits: int = 8) -> dict:
    """Per-tensor asymmetric grid (TorchActivationFakeQuantize, qat_quant.py:38-53).

    zp = round(min/scale), negated when min < 0 (the reference's sign fix)."""
    mn = float(np.asarray(min_range).reshape(-1)[0])
    mx = float(np.asarray(max_range).reshape(-1)[0])
    scale = (mx - mn) / (2**n_bits - 1)
    zp = int(round(mn / scale)) if scale > 0 else 0
    zp = -zp if mn < 0 else zp
    return {
        "scale": np.float32(scale),
        "zero_point": np.int32(zp),
        "quant_min": 0,
        "quant_max": 2**n_bits - 1,
        "kind": "per_tensor",
    }


def export_quantizer_grids(variables: dict, weight_n_bits: int = 8, act_n_bits: int = 8) -> dict:
    """Walk the qparams tree and freeze every quantizer's grid.

    Returns a nested dict mirroring the module tree where each quantizer
    node becomes its frozen grid parameters — the handoff artifact for an
    integer deployment runtime.
    """
    if QPARAMS not in variables:
        return {}
    qparams = jax.device_get(variables[QPARAMS])

    def walk(node: Any, key: str = "") -> Any:
        if not isinstance(node, dict):
            return node
        if "min_range" in node and "max_range" in node:
            mn = np.asarray(node["min_range"])
            mx = np.asarray(node["max_range"])
            # Dispatch on the quantizer's scope name, not on range size: a
            # per-channel weight quantizer with a single output channel
            # (e.g. a Co=1 decoder ConvTranspose) has size-1 ranges but must
            # still get the symmetric per-channel grid, not the asymmetric
            # per-tensor activation grid.
            if key.startswith(("weight_fake_quantize", "wq_")):
                return freeze_weight_grid(mn, mx, weight_n_bits)
            if "mu" in node:  # mu-law quantizer: export ranges + mu
                return {
                    "kind": "mulaw",
                    "min_range": np.float32(mn.reshape(-1)[0]),
                    "max_range": np.float32(mx.reshape(-1)[0]),
                    "mu": np.float32(np.asarray(node["mu"]).reshape(-1)[0]),
                    "n_bits": act_n_bits,
                }
            return freeze_activation_grid(mn, mx, act_n_bits)
        return {k: walk(v, k) for k, v in node.items()}

    return walk(jax.tree_util.tree_map(np.asarray, qparams))
