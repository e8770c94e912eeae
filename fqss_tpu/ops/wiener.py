"""Wiener filtering (EM with spatial covariances) for spectrogram masking.

TPU reimplementation of the openunmix expectation-maximization Wiener
filter the reference's HDemucs path calls (reference: hdemucsq.py:678-704
``_wiener`` with 300-frame windows; `from openunmix.filtering import
wiener`). The HTDemucs default (cac=True, wiener_iters=0) bypasses it, but
HDemucs-style magnitude-mask models use it at eval.

All complex math runs on-device; inputs/outputs stay complex inside jit
(the axon tunnel cannot fetch complex arrays to host — take .real/.imag at
the boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

EPS = 1e-10


def _covariance(y: Array) -> Array:
    """[..., C] complex -> [..., C, C] outer products y y^H."""
    return y[..., :, None] * jnp.conj(y[..., None, :])


def wiener(
    targets_mag: Array,
    mix_stft: Array,
    n_iter: int = 1,
    residual: bool = False,
    scale_factor: float = 10.0,
) -> Array:
    """EM Wiener filter.

    targets_mag: [F, T, C, S] non-negative source magnitude estimates.
    mix_stft:    [F, T, C] complex mixture STFT.
    Returns complex source STFTs [F, T, C, S(+1 if residual)].
    """
    f, t, c = mix_stft.shape
    # normalize like openunmix (scale down to avoid overflow)
    max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(mix_stft)) / scale_factor)
    mix = mix_stft / max_abs
    mag = targets_mag / max_abs

    if residual:
        res = jnp.maximum(0.0, jnp.abs(mix)[..., None] - jnp.sum(mag, axis=-1, keepdims=True))
        mag = jnp.concatenate([mag, res], axis=-1)
    s = mag.shape[-1]

    # init: ratio-mask estimates
    total = jnp.sum(mag, axis=-1, keepdims=True) + EPS
    y = (mag / total) * mix[..., None]  # [F, T, C, S]

    for _ in range(n_iter):
        # M-step: source PSDs v_j [F, T, S] and spatial covariances R_j [F, C, C]
        v = jnp.mean(jnp.abs(y) ** 2, axis=2)  # [F, T, S]
        yc = jnp.moveaxis(y, -1, 0)  # [S, F, T, C]
        cov = _covariance(yc)  # [S, F, T, C, C]
        weight = v.transpose(2, 0, 1)[..., None, None] + EPS  # [S, F, T, 1, 1]
        R = jnp.sum(cov / weight, axis=2) / t  # [S, F, C, C] (frame-avg)

        # E-step: Wiener gains
        # Cxx = sum_j v_j R_j  [F, T, C, C]
        Cxx = jnp.einsum("ftj,jfab->ftab", v, R) + EPS * jnp.eye(c)
        inv_Cxx = jnp.linalg.inv(Cxx)
        # gain_j = v_j R_j inv(Cxx); y_j = gain_j x
        gains = jnp.einsum("ftj,jfab,ftbc->jftac", v, R, inv_Cxx)  # [S, F, T, C, C]
        y = jnp.einsum("jftac,ftc->ftaj", gains, mix)  # [F, T, C, S]

    return y * max_abs


def apply_wiener_windowed(
    targets_mag: Array, mix_stft: Array, n_iter: int, win_len: int = 300, residual: bool = False
) -> Array:
    """Frame-windowed Wiener like HDemucs._wiener (hdemucsq.py:678-698):
    the EM runs independently on win_len-frame windows of the track."""
    f, t, c = mix_stft.shape
    outs = []
    for start in range(0, t, win_len):
        sl = slice(start, min(start + win_len, t))
        outs.append(wiener(targets_mag[:, sl], mix_stft[:, sl], n_iter, residual))
    return jnp.concatenate(outs, axis=1)
