"""FQSS-TPU: a TPU-native quantization-aware-training framework for audio
source separation.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
FQSS framework (IEEE OJSP 2024): fake-quantized model zoo (ConvTasNet,
DPTNet, Sepformer, ConvTasNet-music, HTDemucs), learned-range quantizers with
observer calibration, the input-splitter / output-combiner MSB+LSB mechanism,
sensitivity-weighted knowledge-distillation training, and OLA chunked
inference — built on pjit/shard_map data parallelism over TPU meshes.
"""

__version__ = "0.1.0"
