"""Data front-end: dataset loaders, augmentation, synthetic generators."""

from fqss_tpu.data.synthetic import synth_band_batch, synth_band_sources, synth_batch, synth_sources

__all__ = ["synth_band_batch", "synth_band_sources", "synth_batch", "synth_sources"]
