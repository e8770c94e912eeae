"""Quantization core: bit-faithful fake-quant math, STE rules, quantizer modules."""

from fqss_tpu.quant.calibration import calibrate_mse_quantizers, has_pending_mse, run_observer
from fqss_tpu.quant.fake_quant import (
    fix_range_to_include_zero,
    linear_fake_quant,
    mulaw_fake_quant,
    qrange,
    splitter_quantize,
    torch_fake_quantize_per_channel,
    torch_fake_quantize_per_tensor,
)
from fqss_tpu.quant.quantizers import (
    QPARAMS,
    QSTATS,
    ActQuantizer,
    MseActQuantizer,
    WeightQuantizer,
    dynamic_act_quant,
)
from fqss_tpu.quant.spec import FLOAT, QuantSpec
from fqss_tpu.quant.ste import clip_ste, floor_ste, grad_scale, grad_sign, round_ste

__all__ = [
    "ActQuantizer",
    "MseActQuantizer",
    "WeightQuantizer",
    "dynamic_act_quant",
    "QuantSpec",
    "FLOAT",
    "QPARAMS",
    "QSTATS",
    "run_observer",
    "calibrate_mse_quantizers",
    "has_pending_mse",
    "linear_fake_quant",
    "mulaw_fake_quant",
    "splitter_quantize",
    "fix_range_to_include_zero",
    "qrange",
    "torch_fake_quantize_per_tensor",
    "torch_fake_quantize_per_channel",
    "round_ste",
    "floor_ste",
    "grad_sign",
    "grad_scale",
    "clip_ste",
]
