"""Native (C++) runtime components, exposed over ctypes.

Currently: the WAV segment decoder (wavio.cpp) used by the data loaders'
random-crop hot path. Builds on demand with make/g++; every entry point has
a pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libwavio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,  # per-channel allocation stride (frames)
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_read_f32.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> tuple[int, int, int]:
    """(n_frames, sample_rate, channels); falls back to the wave module."""
    lib = _load()
    if lib is None:
        from fqss_tpu.utils.audio import wav_info as py_info

        return py_info(path)
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    fr = ctypes.c_int64()
    rc = lib.wav_info(path.encode(), ctypes.byref(ch), ctypes.byref(sr), ctypes.byref(fr))
    if rc != 0:
        raise OSError(f"wav_info({path}) failed: {rc}")
    return int(fr.value), int(sr.value), int(ch.value)


def read_wav_segment(path: str, offset: int = 0, n_frames: int = -1) -> tuple[np.ndarray, int]:
    """float32 [C, n] segment + sample rate; seeks straight to the segment.

    Fallback: scipy full-file read + slice (utils.audio.read_audio).
    """
    lib = _load()
    if lib is None:
        from fqss_tpu.utils.audio import read_audio

        wav, sr = read_audio(path)
        if n_frames < 0:
            return np.ascontiguousarray(wav[:, offset:]), sr
        return np.ascontiguousarray(wav[:, offset : offset + n_frames]), sr

    if n_frames < 0:
        total, _, _ = wav_info(path)
        n_frames = max(0, total - offset)
    _, _, ch_guess = wav_info(path)
    out = np.empty((ch_guess, n_frames), np.float32)
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    got = lib.wav_read_f32(
        path.encode(), offset, n_frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_frames,  # allocation stride: requested frames, not the EOF-clamped count
        ctypes.byref(ch), ctypes.byref(sr),
    )
    if got < 0:
        raise OSError(f"wav_read_f32({path}) failed: {got}")
    return out[:, : int(got)], int(sr.value)
