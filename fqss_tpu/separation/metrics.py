"""Separation quality metrics: SI-SNR, SDR (BSS-eval style), NSDR, STOI.

TPU-native reimplementation of the reference metric stack (reference:
process.py:64-152 backed by torchmetrics + museval). The per-pair formulas
run as jit-able JAX; the FIR-projection SDR solves its Toeplitz system with
jnp.linalg.solve (batched, fine on TPU for the 512-tap default).

``metric_evaluation`` reproduces the reference's best-permutation matching
by SI-SNR (process.py:125-152); ``swap_channel_order`` the eval-time
per-chunk PIT re-alignment (process.py:105-123).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def si_snr_db(est: Array, target: Array, zero_mean: bool = True, eps: float = 1e-8) -> Array:
    """Scale-invariant SNR in dB over the last axis (torchmetrics semantics)."""
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    dot = jnp.sum(est * target, axis=-1, keepdims=True)
    energy = jnp.sum(target**2, axis=-1, keepdims=True) + eps
    proj = dot * target / energy
    noise = est - proj
    ratio = (jnp.sum(proj**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio)


def snr_db(est: Array, target: Array, eps: float = 1e-8) -> Array:
    ratio = (jnp.sum(target**2, axis=-1) + eps) / (jnp.sum((est - target) ** 2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio)


def nsisdr_db(sig: Array, ref: Array, eps: float = 1e-7) -> Array:
    """Normalized SI-SDR used for music KD weights (process.py:64-68)."""
    alpha = jnp.sum(ref * sig, axis=-1) / jnp.sum(ref**2, axis=-1)
    alpha = alpha[..., None]
    num = jnp.sum((alpha * ref) ** 2, axis=-1) + eps
    den = jnp.sum((sig - alpha * ref) ** 2, axis=-1) + eps
    return 10.0 * jnp.log10(num / den)


def sdr_db(est: Array, target: Array, filter_length: int = 512, zero_mean: bool = False, eps: float = 1e-8) -> Array:
    """FIR-projection SDR (torchmetrics SignalDistortionRatio semantics,
    fast-bss-eval style): allows a ``filter_length``-tap distortion filter on
    the reference. est/target: [..., T]."""
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)

    # autocorrelation of target (Toeplitz) and crosscorrelation with est,
    # computed via FFT over the last axis.
    t_len = est.shape[-1]
    n_fft = int(2 ** np.ceil(np.log2(t_len + filter_length)))
    tf = jnp.fft.rfft(target, n_fft)
    ef = jnp.fft.rfft(est, n_fft)
    acf = jnp.fft.irfft(tf * jnp.conj(tf), n_fft)[..., :filter_length]
    xcorr = jnp.fft.irfft(ef * jnp.conj(tf), n_fft)
    # b_j = sum_t est[t] target[t - j] = xcorr at lag j
    b = xcorr[..., :filter_length]

    # Solve the Toeplitz system R h = b (R from acf) as a dense solve.
    idx = jnp.abs(jnp.arange(filter_length)[:, None] - jnp.arange(filter_length)[None, :])
    R = acf[..., idx]
    R = R + eps * acf[..., :1, None] * jnp.eye(filter_length)
    h = jnp.linalg.solve(R, b[..., None])[..., 0]

    # SDR = coherent energy ratio: ||proj||^2 / (||est||^2 - ||proj||^2).
    # The residual is clamped at a relative floor: perfect reconstruction
    # cancels catastrophically in f32, capping the metric at -10*log10(eps).
    proj_energy = jnp.sum(h * b, axis=-1)
    est_energy = jnp.sum(est**2, axis=-1)
    residual = jnp.maximum(est_energy - proj_energy, 0.0) + eps * est_energy + eps
    return 10.0 * jnp.log10((proj_energy + eps) / residual)


def swap_channel_order(sep: np.ndarray, clean: np.ndarray) -> np.ndarray:
    """Per-chunk PIT re-alignment with sign fix (process.py:105-123).

    sep/clean: [n_src, T] numpy. For each model output channel, place it at
    the index of the clean source it best matches by SI-SNR; if swapped, the
    signal is negated (faithful to the reference's sign-fix quirk).
    """
    n_src = clean.shape[0]
    if n_src == 1:
        return sep
    new_sep = sep.copy()
    sisnr = np.asarray(si_snr_db(jnp.asarray(sep)[:, None, :], jnp.asarray(clean)[None, :, :]))
    for src in range(n_src):
        best = int(np.argmax(sisnr[src]))
        new_sep[best] = sep[src] if src == best else -sep[src]
    return new_sep


def metric_evaluation(
    sep: np.ndarray, clean: np.ndarray, sample_rate: int = 16000, compute_stoi: bool = True
) -> tuple[float, float, float]:
    """Best-permutation SI-SNR / SDR / STOI per source, averaged
    (process.py:125-152). sep/clean: [n_src, T] numpy."""
    from fqss_tpu.separation.stoi import stoi as stoi_fn

    n_src = clean.shape[0]
    sisnrs, sdrs, stois = np.zeros(n_src), np.zeros(n_src), np.zeros(n_src)
    pair_sisnr = np.asarray(si_snr_db(jnp.asarray(sep)[:, None, :], jnp.asarray(clean)[None, :, :]))
    for src in range(n_src):
        best = int(np.argmax(pair_sisnr[src]))
        ref = clean[best]
        sisnrs[src] = pair_sisnr[src, best]
        sdrs[src] = float(sdr_db(jnp.asarray(sep[src]), jnp.asarray(ref)))
        stois[src] = stoi_fn(sep[src], ref, sample_rate) if compute_stoi else np.nan
    return float(sisnrs.mean()), float(sdrs.mean()), float(stois.mean())
