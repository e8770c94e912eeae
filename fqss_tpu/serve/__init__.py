"""Serving/deployment runtime: integer inference engines for QAT models.

The reference's deployment story stops at freezing grids into torch.ao
fake-quant modules (reference: quantization/qat/qat_utils.py:334-351) — the
actual integer execution is left to an external runtime. Here the TPU build
goes further: :mod:`fqss_tpu.serve` consumes a QAT checkpoint and runs true
int8 MXU matmuls (s8 x s8 -> s32) for the FLOP-dominant layers, bit-matching
the fake-quant forward while hitting the v5e's double-rate int8 MXU path.
"""

from fqss_tpu.serve.convtasnet_int8 import ConvTasNetInt8Engine
from fqss_tpu.serve.fold import fold_quantized_weights

__all__ = ["ConvTasNetInt8Engine", "fold_quantized_weights"]
