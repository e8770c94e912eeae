"""Separation-domain machinery: splitter/combiner, losses, metrics, OLA inference."""

from fqss_tpu.separation.splitter import postprocess, preprocess, split_msb_lsb

__all__ = ["preprocess", "postprocess", "split_msb_lsb"]
