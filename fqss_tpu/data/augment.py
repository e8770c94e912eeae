"""Mixing augmentations (host-side numpy).

Reimplements the reference's SNR-controlled remixing
(reference: process.py:57-103, train_env/train_utils.py:30-52): random-SNR
2/3-source remixes and noise mixing with 0.9 peak clipping.
"""

from __future__ import annotations

import numpy as np


def max_clip(x: np.ndarray, max_check: float = 0.9, max_clip_val: float = 0.9) -> np.ndarray:
    x_max = np.max(np.abs(x))
    if x_max >= max_check:
        x = x * (max_clip_val / x_max)
    return x


def generate_2mix_snr(sig1: np.ndarray, sig2: np.ndarray, snr: float, clip: bool = True) -> np.ndarray:
    e1, e2 = float(np.mean(sig1**2)), float(np.mean(sig2**2))
    if e1 > 0.0 and e2 > 0.0:
        current_snr = 10 * np.log10(e1 / e2)
        if current_snr < snr:
            sig2 = sig2 * np.sqrt((e1 / e2) * 10 ** (-snr / 10))
        else:
            sig1 = sig1 * np.sqrt((e2 / e1) * 10 ** (snr / 10))
    mix = sig1 + sig2
    return max_clip(mix) if clip else mix


def generate_3mix_snr(s1, s2, s3, snr1_23: float, snr2_3: float) -> np.ndarray:
    mix23 = generate_2mix_snr(s2, s3, snr2_3)
    return generate_2mix_snr(s1, mix23, snr1_23)


def generate_mix_noise(sig: np.ndarray, noise: np.ndarray, snr: float) -> np.ndarray:
    es, en = float(np.mean(sig**2)), float(np.mean(noise**2))
    gain = np.sqrt((es / en) / (10 ** (snr / 10))) if es > 0 else 1.0
    return max_clip(sig + gain * noise)


def augmentation_2mix(rng: np.random.Generator, sig1, sig2, cfg: dict) -> np.ndarray:
    if cfg.get("distribution") == "uniform":
        snr = rng.uniform(cfg.get("param0"), cfg.get("param1"))
        return generate_2mix_snr(sig1, sig2, snr)
    raise ValueError(f"Augmentation distribution not supported: {cfg.get('distribution')}")


def augmentation_3mix(rng: np.random.Generator, s1, s2, s3, cfg: dict) -> np.ndarray:
    if cfg.get("distribution") == "uniform":
        snr1_23 = rng.uniform(cfg.get("param0"), cfg.get("param1"))
        snr2_3 = rng.uniform(cfg.get("param0"), cfg.get("param1"))
        return generate_3mix_snr(s1, s2, s3, snr1_23, snr2_3)
    raise ValueError(f"Augmentation distribution not supported: {cfg.get('distribution')}")


def speed_perturb(rng: np.random.Generator, wav: np.ndarray, speeds=(95, 100, 105)) -> np.ndarray:
    """Speed perturbation by resampling (the speechbrain recipe's
    TimeDomainSpecAugment speed-perturb, speechbrain_librimix_trainer.py's
    augment path). Host-side; output length varies with the chosen speed."""
    from fqss_tpu.utils.audio import resample_audio

    speed = int(rng.choice(list(speeds)))
    if speed == 100:
        return wav
    return resample_audio(wav, 100, speed)


def repitch(rng: np.random.Generator, wav: np.ndarray, max_pitch: int = 2, max_tempo: float = 12.0,
            sample_rate: int = 44100) -> np.ndarray:
    """Repitch/retempo augmentation (the htdemucs recipe's RepitchedWrapper):
    approximated by polyphase resampling with a random combined
    pitch (semitones) + tempo (percent) factor, then length restored by crop
    or pad. Host-side."""
    from fqss_tpu.utils.audio import resample_audio

    semitones = rng.integers(-max_pitch, max_pitch + 1)
    tempo = rng.uniform(-max_tempo, max_tempo)
    factor = (2.0 ** (semitones / 12.0)) * (1.0 + tempo / 100.0)
    if abs(factor - 1.0) < 1e-3:
        return wav
    t = wav.shape[-1]
    out = resample_audio(wav, 1000, max(1, int(round(1000 * factor))))
    if out.shape[-1] >= t:
        return out[..., :t]
    return np.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, t - out.shape[-1])])
