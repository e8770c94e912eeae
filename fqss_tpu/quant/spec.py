"""Declarative quantization plan.

The reference configures quantization via a YAML ``quantization`` dict and
applies it by runtime module surgery (reference:
quantization/qat/models/load_model.py:53-74, qat_utils.py:273-332). In this
framework the same schema becomes a static dataclass threaded into the model
constructors — every quantizable primitive reads its bit-widths and toggles
from here, so the quantized and float (teacher) models are the same module
code with ``qat`` flipped.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Mirror of the YAML ``model_cfg.quantization`` schema.

    Field names/defaults match load_model.quantize_model
    (load_model.py:53-74) so existing reference configs load unchanged.
    """

    qat: bool = False
    gradient_based: bool = True
    weight_quant: bool = True
    weight_n_bits: int = 8
    act_quant: bool = True
    act_n_bits: int = 8
    in_quant: bool = False
    in_act_n_bits: int = 8
    out_quant: bool = False
    out_act_n_bits: int = 8
    n_splitter: int = 1
    n_combiner: int = 1
    inout_nl_quant: bool = False
    observer: bool = True
    train_res_dec: bool = False
    # TPU-build extensions (reference equivalents are code-level choices):
    act_quantizer: str = "linear"  # 'linear' | 'mse'
    # Observer window length (EMA steps / histogram observations) — the
    # reference hard-codes 50 (qat_quant.py:219 max_iter_to_observe);
    # configurable here so smoke configs can close the window quickly.
    max_observations: int = 50
    lstm_mode: str = "fused"  # 'fused' | 'static' | 'dynamic' (qat_layers.py:571-862)
    # Route the quantizer hot ops through the custom-VJP Pallas training
    # kernels (ops/pallas_qat.py): fwd AND bwd are single-VMEM-pass kernels
    # whose gradients match jax.grad of the XLA path. Off by default: on the
    # throttled bench device XLA fusion is already at the measured ceiling;
    # the kernels target full-rate silicon.
    pallas_qat: bool = False
    # Route fused-mode LSTM recurrences through the Pallas kernel
    # (ops/pallas_lstm.py): time loop inside the kernel grid, h/c and W_hh
    # resident in VMEM — attacks the per-step dispatch floor of scan-based
    # LSTMs (DPTNet's dual-path FFN, Demucs BLSTM). Training-safe: backward
    # rematerializes via the scan path (custom_vjp).
    pallas_lstm: bool = False
    # Route the attention core (QK^T -> softmax -> AV -> head-quant) through
    # the fused Pallas kernel (ops/pallas_attention.py): the [L, L] logits
    # stay in VMEM instead of round-tripping HBM between einsums. Gradients
    # rematerialize via the XLA composition (custom_vjp). Assumes quantizer
    # ranges are past the observer window (serving/eval, or QAT fine-tuning
    # after calibration).
    pallas_attn: bool = False
    # MXU compute dtype for convs/matmuls: 'float32' | 'bfloat16'. The v5e
    # MXU runs bf16 ~4x faster than f32; quantizer grid math stays f32 and
    # accumulation is f32 (preferred_element_type), so only the 8-bit-grid
    # operand values round to bf16 (<=2^-8 relative) — the serving/bench
    # fast path. Default f32 keeps QAT bit-faithful to the reference.
    compute_dtype: str = "float32"

    @property
    def mxu_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @classmethod
    def from_config(cls, cfg: Mapping[str, Any] | None) -> "QuantSpec":
        """Build from a YAML ``quantization`` dict; unknown keys are ignored."""
        if not cfg:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in fields})

    @property
    def enabled(self) -> bool:
        return self.qat

    def disabled(self) -> "QuantSpec":
        """The float-teacher view of this plan (splitter/combiner off too)."""
        return dataclasses.replace(self, qat=False, n_splitter=1, n_combiner=1)


FLOAT = QuantSpec()  # convenience: fully-float plan
