"""Compute-path ops: STFT/iSTFT, Pallas kernels."""

from fqss_tpu.ops.stft import ispectro, istft, spectro, stft

__all__ = ["stft", "istft", "spectro", "ispectro"]
