"""Synthetic mixture generator for smoke tests and benchmarks.

The reference has no synthetic data path (it points at LibriMix/MUSDB on
disk); this generator provides deterministic multi-speaker mixtures so the
end-to-end QAT loop is testable without datasets — part of the test pyramid
the reference lacks (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def synth_sources(
    rng: np.random.Generator,
    batch: int,
    n_src: int,
    length: int,
    sample_rate: int = 8000,
) -> np.ndarray:
    """Band-limited random 'speech-like' sources [B, S, T] with AM envelopes."""
    t = np.arange(length) / sample_rate
    out = np.zeros((batch, n_src, length), np.float32)
    for b in range(batch):
        for s in range(n_src):
            sig = np.zeros(length, np.float32)
            for _ in range(4):
                f0 = rng.uniform(80, 1200)
                sig += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
            env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t + rng.uniform(0, 2 * np.pi)))
            sig = sig * env + 0.01 * rng.standard_normal(length)
            out[b, s] = 0.5 * sig / (np.abs(sig).max() + 1e-8)
    return out


def synth_batch(
    rng: np.random.Generator, batch: int, n_src: int, length: int, sample_rate: int = 8000
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (mixture [B, T], sources [B, S, T])."""
    src = synth_sources(rng, batch, n_src, length, sample_rate)
    mix = src.sum(axis=1)
    peak = np.abs(mix).max(axis=-1, keepdims=True) + 1e-8
    scale = np.minimum(1.0, 0.9 / peak)
    return (mix * scale).astype(np.float32), (src * scale[:, None]).astype(np.float32)


def synth_band_sources(
    rng: np.random.Generator,
    batch: int,
    length: int,
    sample_rate: int = 8000,
    bands: tuple[tuple[float, float], ...] = ((150.0, 1300.0), (2700.0, 3800.0)),
    n_tones: int = 6,
) -> np.ndarray:
    """Band-disjoint 2-source task for the QAT quality experiment.

    Each source is a sum of sinusoids confined to its own frequency band with
    a wide guard gap, plus a slow AM envelope — an *easy* separation task a
    small float model solves to 30+ dB SI-SDR. That head-room is the point:
    it exposes the SDR ceiling that 8-bit input/output quantization imposes
    (the failure mode the FQSS splitter/combiner exists to lift — reference
    README.md:3-7), which a hard task (float plateauing near 7 dB) cannot.
    """
    t = np.arange(length) / sample_rate
    out = np.zeros((batch, len(bands), length), np.float32)
    for b in range(batch):
        for s, (f_lo, f_hi) in enumerate(bands):
            sig = np.zeros(length, np.float64)
            for _ in range(n_tones):
                f0 = rng.uniform(f_lo, f_hi)
                sig += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
            env = 1.0 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t + rng.uniform(0, 2 * np.pi))
            sig = sig * env
            out[b, s] = rng.uniform(0.4, 1.0) * sig / (np.abs(sig).max() + 1e-8)
    return out


def synth_band_batch(
    rng: np.random.Generator, batch: int, length: int, sample_rate: int = 8000
) -> tuple[np.ndarray, np.ndarray]:
    """(mixture [B, T], sources [B, 2, T]) for the band-disjoint task."""
    src = synth_band_sources(rng, batch, length, sample_rate)
    mix = src.sum(axis=1)
    peak = np.abs(mix).max(axis=-1, keepdims=True) + 1e-8
    scale = np.minimum(1.0, 0.9 / peak)
    return (mix * scale).astype(np.float32), (src * scale[:, None]).astype(np.float32)
