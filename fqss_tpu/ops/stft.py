"""STFT / iSTFT with torch.stft-parity semantics, on XLA FFTs.

The HTDemucs loss is time-domain *through* the iSTFT, so both transforms are
built from differentiable primitives (gather -> window -> rfft, and
irfft -> window -> scatter-add OLA) that XLA maps to batched TPU FFTs.

Semantics match ``torch.stft(..., window=hann(n_fft), normalized=True,
center=True, pad_mode='reflect', return_complex=True)`` and the matching
``torch.istft`` — the convention the reference inherits via demucs's
spectro/ispectro helpers (used at htdemucsq.py:948,959).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def hann_window(n: int) -> np.ndarray:
    """torch.hann_window(n, periodic=True)."""
    return (0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))).astype(np.float32)


def _frame(x: Array, n_fft: int, hop: int) -> Array:
    """[..., T] -> [..., frames, n_fft] via a static gather."""
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(x: Array, n_fft: int, hop: int, window: Array | None = None, normalized: bool = True) -> Array:
    """[..., T] -> complex [..., n_fft//2 + 1, frames] (center, reflect pad)."""
    if window is None:
        window = jnp.asarray(hann_window(n_fft))
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n_fft, axis=-1)
    if normalized:
        spec = spec * (1.0 / np.sqrt(n_fft))
    return jnp.swapaxes(spec, -1, -2)  # [..., freq, frames]


def istft(
    z: Array,
    n_fft: int,
    hop: int,
    window: Array | None = None,
    normalized: bool = True,
    length: int | None = None,
) -> Array:
    """complex [..., n_fft//2 + 1, frames] -> [..., length] (center)."""
    if window is None:
        window = jnp.asarray(hann_window(n_fft))
    z = jnp.swapaxes(z, -1, -2)  # [..., frames, freq]
    if normalized:
        z = z * np.sqrt(n_fft)
    frames = jnp.fft.irfft(z, n_fft, axis=-1) * window  # [..., frames, n_fft]

    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    # Scatter-add OLA of both the signal and the squared window envelope.
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(*frames.shape[:-2], -1)
    y = jnp.zeros((*frames.shape[:-2], out_len), frames.dtype).at[..., idx].add(flat)
    win_sq = (window**2)[None, :].repeat(n_frames, 0).reshape(-1)
    env = jnp.zeros((out_len,), frames.dtype).at[idx].add(win_sq)
    y = y / jnp.maximum(env, 1e-11)

    pad = n_fft // 2
    y = y[..., pad:]
    if length is not None:
        y = y[..., :length]
    else:
        y = y[..., : out_len - 2 * pad]
    return y


def spectro(x: Array, n_fft: int, hop: int) -> Array:
    """demucs spectro: flatten leading dims, torch-stft, restore dims."""
    return stft(x, n_fft, hop)


def ispectro(z: Array, hop: int, length: int | None = None) -> Array:
    """demucs ispectro: n_fft inferred from the onesided freq count."""
    freqs = z.shape[-2]
    n_fft = 2 * (freqs - 1)
    return istft(z, n_fft, hop, length=length)
