"""Quantized model zoo (reference parity: load_model.py:21-51)."""

from fqss_tpu.models.convtasnet import ConvTasNet
from fqss_tpu.models.convtasnet_music import ConvTasNetMusic
from fqss_tpu.models.dptnet import DPTNet
from fqss_tpu.models.factory import create_model, create_model_and_teacher, create_pretrained_model
from fqss_tpu.models.htdemucs import HTDemucs
from fqss_tpu.models.sepformer import Sepformer

__all__ = [
    "ConvTasNet",
    "ConvTasNetMusic",
    "DPTNet",
    "Sepformer",
    "HTDemucs",
    "create_model",
    "create_pretrained_model",
    "create_model_and_teacher",
]
