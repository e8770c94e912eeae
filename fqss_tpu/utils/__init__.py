"""Shared utilities: audio I/O, config loading, logging."""

from fqss_tpu.utils.audio import (
    normalize_audio,
    read_audio,
    resample_audio,
    save_audio,
    set_seed,
    wav_info,
)

__all__ = ["read_audio", "save_audio", "wav_info", "resample_audio", "normalize_audio", "set_seed"]
