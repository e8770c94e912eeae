"""BSS Eval v4 (images, framewise): SDR / ISR / SIR / SAR.

TPU-native implementation of the museval metrics the reference consumes
through ``museval.eval_mus_track`` + ``EvalStore.agg_frames_tracks_scores``
(reference: val.py:134-181). Definitions follow Vincent et al.'s BSS Eval
images variant as shipped in museval/bsseval v4:

Given true source images s_j [C, W] and estimates e_j [C, W], each window
builds the least-squares projections of every estimate channel onto the
{0..L-1}-shifted copies of (a) source j's channels and (b) ALL sources'
channels (distortion filter length L = 512 by default). Following museval's
``_bss_decomp_mtifilt_images`` exactly, the decomposition lives on the
zero-padded support [0, W+L-1): s_true and e_j are zero-padded and the
projections keep their filter-ringing tail:

    s_true   = pad(s_j)
    e_spat   = P_j(e_j)   - s_true
    e_interf = P_all(e_j) - P_j(e_j)
    e_artif  = pad(e_j)   - P_all(e_j)

    SDR = 10 log10 |s_true|^2 / |e_spat + e_interf + e_artif|^2
    ISR = 10 log10 |s_true|^2 / |e_spat|^2
    SIR = 10 log10 |s_true + e_spat|^2 / |e_interf|^2
    SAR = 10 log10 |s_true + e_spat + e_interf|^2 / |e_artif|^2

The Gram/cross-correlation systems are assembled with FFTs and solved as
one batched linear system on device — the per-window kernel is jittable
with static (n_src, n_chan, window, filter) shapes, so a whole track's
windows evaluate as a single vmapped call on the MXU instead of museval's
per-window numpy Toeplitz loops.

Framewise protocol (museval defaults): window = hop = 1 s, metrics per
window, NaN for windows whose reference is silent; aggregation is median
over frames then median over tracks (museval.aggregate).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("filter_length",))
def _bss_eval_window(refs: Array, ests: Array, filter_length: int = 512):
    """One window: refs/ests [S, C, W] -> (sdr, isr, sir, sar) each [S].

    All estimates are evaluated against all references in one batched solve.
    """
    s, c, w = refs.shape
    m = s * c
    L = filter_length
    nfft = _next_pow2(w + L - 1)

    rf = jnp.fft.rfft(refs.reshape(m, w), nfft)  # [M, F]
    ef = jnp.fft.rfft(ests.reshape(s, c, w), nfft)  # [S, C, F]

    # cross-correlations c_{ij}(d) = sum_t x_i[t] x_j[t+d] for all ref pairs
    cross = jnp.fft.irfft(jnp.conj(rf)[:, None] * rf[None, :], nfft)  # [M, M, nfft]
    lag = (jnp.arange(L)[:, None] - jnp.arange(L)[None, :]) % nfft  # a-b mod nfft
    G = cross[:, :, lag]  # [M, M, L, L]; G[(i,a),(j,b)] = c_{ij}(a-b)
    G = G.transpose(0, 2, 1, 3).reshape(m * L, m * L)
    # Tikhonov jitter keeps the solve stable when references are correlated
    eps = 1e-8 * (jnp.trace(G) / (m * L) + 1e-12)
    G = G + eps * jnp.eye(m * L, dtype=G.dtype)

    # D[(j,a), (s,c)] = sum_t ref_j[t-a] est_sc[t]
    D = jnp.fft.irfft(jnp.conj(rf)[:, None, None, :] * ef[None, :, :, :], nfft)[..., :L]
    D = D.transpose(0, 3, 1, 2).reshape(m * L, s * c)  # [M*L, S*C]

    coef_all = jnp.linalg.solve(G, D)  # projection onto ALL refs' shifts

    wp = w + L - 1  # padded support (museval keeps the projection tail)

    def _apply(coef: Array) -> Array:
        """coef [M*L, S*C] -> projected time series [S, C, W+L-1]."""
        h = coef.reshape(m, L, s * c)
        hf = jnp.fft.rfft(h, nfft, axis=1)  # [M, F, S*C]
        pf = jnp.einsum("mf,mfk->kf", rf, hf)
        return jnp.fft.irfft(pf, nfft)[:, :wp].reshape(s, c, wp)

    p_all = _apply(coef_all)  # [S, C, W] for every estimate

    # per-source projection: solve the j-th diagonal sub-block for est j only
    Gb = G.reshape(s, c * L, s, c * L)
    Db = D.reshape(s, c * L, s, c)
    diag_idx = jnp.arange(s)
    Gjj = Gb[diag_idx, :, diag_idx]  # [S, C*L, C*L]
    Djj = Db[diag_idx, :, diag_idx]  # [S, C*L, C]
    coef_j = jnp.linalg.solve(Gjj, Djj)  # [S, C*L, C]

    rfb = rf.reshape(s, c, -1)

    def _apply_j(coef: Array, j_rf: Array) -> Array:
        h = coef.reshape(c, L, c)
        hf = jnp.fft.rfft(h, nfft, axis=1)  # [C, F, C]
        pf = jnp.einsum("mf,mfk->kf", j_rf, hf)
        return jnp.fft.irfft(pf, nfft)[:, :wp]

    p_j = jax.vmap(_apply_j)(coef_j, rfb)  # [S, C, W+L-1]

    pad = ((0, 0), (0, 0), (0, L - 1))
    s_true = jnp.pad(refs, pad)
    ests_p = jnp.pad(ests, pad)
    e_spat = p_j - s_true
    e_interf = p_all - p_j
    e_artif = ests_p - p_all

    def energy(x):
        return jnp.sum(x**2, axis=(1, 2))

    eps_e = 1e-12
    sdr = 10.0 * jnp.log10((energy(s_true) + eps_e) / (energy(ests_p - s_true) + eps_e))
    isr = 10.0 * jnp.log10((energy(s_true) + eps_e) / (energy(e_spat) + eps_e))
    sir = 10.0 * jnp.log10((energy(s_true + e_spat) + eps_e) / (energy(e_interf) + eps_e))
    sar = 10.0 * jnp.log10((energy(s_true + e_spat + e_interf) + eps_e) / (energy(e_artif) + eps_e))
    return sdr, isr, sir, sar


def bss_eval_images_framewise(
    refs: np.ndarray,
    ests: np.ndarray,
    window: int,
    hop: int | None = None,
    filter_length: int = 512,
    silence_eps: float = 1e-10,
) -> dict[str, np.ndarray]:
    """Framewise BSS Eval v4 over a whole track.

    refs/ests: [S, C, T]. Returns {"SDR","ISR","SIR","SAR"}: [S, n_frames]
    with NaN for frames whose reference source is silent (museval skips
    those from the median).
    """
    refs = np.asarray(refs, np.float32)
    ests = np.asarray(ests, np.float32)
    if refs.ndim == 2:  # [S, T] mono
        refs = refs[:, None, :]
        ests = ests[:, None, :]
    s, c, t = refs.shape
    hop = hop or window
    n_frames = max(1, (t - window) // hop + 1) if t >= window else 0
    if n_frames == 0:  # short track: one window over everything
        n_frames, window, hop = 1, t, t

    out = {k: np.full((s, n_frames), np.nan, np.float32) for k in ("SDR", "ISR", "SIR", "SAR")}
    for f in range(n_frames):
        sl = slice(f * hop, f * hop + window)
        r = refs[..., sl]
        e = ests[..., sl]
        flen = min(filter_length, r.shape[-1])
        sdr, isr, sir, sar = _bss_eval_window(jnp.asarray(r), jnp.asarray(e), filter_length=flen)
        vals = {"SDR": np.asarray(sdr), "ISR": np.asarray(isr), "SIR": np.asarray(sir), "SAR": np.asarray(sar)}
        silent = np.sum(r**2, axis=(1, 2)) < silence_eps
        for k in out:
            out[k][:, f] = np.where(silent, np.nan, vals[k])
    return out


def aggregate_frames(scores: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Median over frames per source (museval EvalStore frame aggregation)."""
    return {k: np.nanmedian(v, axis=1) for k, v in scores.items()}
