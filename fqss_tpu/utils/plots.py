"""Waveform / spectrogram / PSD plots (reference: utils.py:24-100 helpers).

Host-side matplotlib; best-effort (Agg backend, optional import).
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_waveform(waveform: np.ndarray, sample_rate: int, path: str, title: str = "waveform") -> None:
    plt = _plt()
    w = np.atleast_2d(waveform)
    t = np.arange(w.shape[-1]) / sample_rate
    fig, axes = plt.subplots(w.shape[0], 1, squeeze=False, figsize=(10, 2 * w.shape[0]))
    for c in range(w.shape[0]):
        axes[c, 0].plot(t, w[c])
        axes[c, 0].set_ylabel(f"ch{c}")
    axes[0, 0].set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


def plot_spectrogram(waveform: np.ndarray, sample_rate: int, path: str, n_fft: int = 512, title: str = "spectrogram") -> None:
    plt = _plt()
    w = np.asarray(waveform).reshape(-1)
    hop = n_fft // 4
    frames = 1 + max(0, (len(w) - n_fft)) // hop
    idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
    spec = np.abs(np.fft.rfft(w[idx] * np.hanning(n_fft), axis=-1)) ** 2
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(10 * np.log10(spec.T + 1e-10), origin="lower", aspect="auto",
              extent=[0, len(w) / sample_rate, 0, sample_rate / 2])
    ax.set_title(title)
    ax.set_xlabel("s")
    ax.set_ylabel("Hz")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


def plot_psd(waveform: np.ndarray, sample_rate: int, path: str, n_fft: int = 1024, title: str = "PSD") -> None:
    plt = _plt()
    w = np.asarray(waveform).reshape(-1)
    from scipy.signal import welch

    f, pxx = welch(w, fs=sample_rate, nperseg=n_fft)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.semilogy(f, pxx)
    ax.set_title(title)
    ax.set_xlabel("Hz")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
