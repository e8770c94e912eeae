"""Fold weight fake-quantization into the parameters for serving.

At inference the weight quantizers are pure functions of frozen (weight,
range) pairs, so their quant-dequant can be applied ONCE at load instead of
on every forward (the reference keeps it per-forward; its torch-export path
freezes grids but still re-applies them — qat_utils.py:334-351). Works for
every model family: walk the params tree alongside qparams, apply the
per-channel symmetric grid wherever a ``weight_fake_quantize*`` / ``wq_*``
sibling exists, and serve with a spec whose ``weight_quant`` is off.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.quant.fake_quant import linear_fake_quant

# weight-quantizer scope names used across the layer library -> the param
# they quantize inside the PARENT scope.
_WQ_TO_PARAM = {
    # residual_encoder_kernel: _ResidualErrorBlockDense names its quantizer
    # "weight_fake_quantize" on that param (nn/io_layers.py:271-272).
    "weight_fake_quantize": ("kernel", "embedding", "residual_encoder_kernel"),
    "weight_fake_quantize_in": ("in_proj_kernel",),
    "weight_fake_quantize_out": ("out_proj_kernel",),
    "weight_fake_quantize_dec": ("residual_decoder_kernel",),
    "wq_ih": ("w_ih",),
    "wq_hh": ("w_hh",),
}


def fold_quantized_weights(model, variables: dict, n_bits: int | None = None):
    """Returns (serving_model, serving_variables) with weight fq pre-applied.

    serving_model is the same module class with ``q.weight_quant=False``;
    serving_variables carries params whose weights already sit on their
    per-channel symmetric grids (bitwise the values the QAT forward computes
    every call). Activation quantizers are untouched.
    """
    q = model.q
    if not (q.qat and q.weight_quant):
        return model, variables
    n_bits = q.weight_n_bits if n_bits is None else n_bits

    params = variables["params"]
    qparams = variables.get("qparams", {})

    def fold(p_node, q_node):
        if not isinstance(p_node, dict):
            return p_node
        out = dict(p_node)
        q_node = q_node if isinstance(q_node, dict) else {}
        for wq_name, param_names in _WQ_TO_PARAM.items():
            rngs = q_node.get(wq_name)
            if not (isinstance(rngs, dict) and "min_range" in rngs):
                continue
            for pname in param_names:
                if pname in out:
                    w = jnp.asarray(out[pname])
                    out[pname] = np.asarray(
                        linear_fake_quant(
                            w,
                            jnp.asarray(rngs["min_range"]),
                            jnp.asarray(rngs["max_range"]),
                            n_bits,
                            True,
                            True,  # per-channel symmetric grid
                        )
                    )
        for k, v in p_node.items():
            if isinstance(v, dict):
                out[k] = fold(v, q_node.get(k, {}))
        return out

    folded = fold(jax.device_get(params), jax.device_get(qparams))
    serving_model = model.clone(q=dataclasses.replace(q, weight_quant=False))
    serving_vars = dict(variables)
    serving_vars["params"] = folded
    return serving_model, serving_vars
