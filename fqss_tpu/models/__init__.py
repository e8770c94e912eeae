"""Quantized model zoo."""

from fqss_tpu.models.convtasnet import ConvTasNet

__all__ = ["ConvTasNet"]
