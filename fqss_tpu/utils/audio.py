"""Audio I/O and resampling utilities (host-side).

Replaces the reference's torchaudio/soundfile-backed helpers
(reference: utils.py:24-60): WAV read/write via scipy/stdlib, polyphase
resampling via scipy.signal. These feed the host->device input pipeline;
nothing here runs on TPU.
"""

from __future__ import annotations

import os
import wave

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def read_audio(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 [C, T] in [-1, 1], sample_rate)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T  # scipy returns [T, C]
    return np.ascontiguousarray(data), int(sr)


def save_audio(path: str, waveform: np.ndarray, sample_rate: int) -> None:
    """Write float32 [C, T] (or [T]) to a 16-bit PCM WAV."""
    waveform = np.asarray(waveform, np.float32)
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    pcm = np.clip(waveform.T * 32767.0, -32768, 32767).astype(np.int16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wavfile.write(path, sample_rate, pcm if pcm.shape[1] > 1 else pcm[:, 0])


def wav_info(path: str) -> tuple[int, int, int]:
    """(n_frames, sample_rate, n_channels) without reading samples."""
    with wave.open(path, "rb") as f:
        return f.getnframes(), f.getframerate(), f.getnchannels()


def resample_audio(waveform: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis (reference resample=0.5 path,
    librimix_dataset.py on-the-fly 16k->8k)."""
    if orig_sr == new_sr:
        return waveform
    g = np.gcd(int(orig_sr), int(new_sr))
    return resample_poly(waveform, new_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def normalize_audio(waveform: np.ndarray, axis: int = -1) -> np.ndarray:
    """Peak-normalize (process.py:54-55)."""
    peak = np.max(np.abs(waveform), axis=axis, keepdims=True)
    return waveform / np.maximum(peak, 1e-12)


def set_seed(seed: int) -> None:
    """Seed numpy/python RNGs (utils.py:9-14). JAX keys are explicit."""
    import random

    np.random.seed(seed)
    random.seed(seed)
