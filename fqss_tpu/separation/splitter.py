"""Input splitter / output combiner — the FQSS MSB+LSB I/O mechanism.

Jittable reimplementation of preprocess/postprocess
(reference: process.py:16-52) and the teacher-side MSB/LSB split
(train_env/asteroid_librimix/mysystem.py:16-22).

The splitter represents the input waveform as ``n_splitter`` 8-bit streams:
the floor-quantized signal (MSB) followed by its quantization residual
rescaled to full range (LSB), recursively. The combiner reconstructs the
output from ``n_combiner`` decoder planes as
``plane0 + sum_i plane_i * (0.5 * delta)^i``. Together they lift the SDR
ceiling imposed by 8-bit model I/O.

Layout note: these functions use the reference's channel-first audio layout
[batch, channels, time] at the model boundary; models transpose to NTC
internally for TPU-friendly convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fqss_tpu.quant.fake_quant import splitter_quantize

Array = jax.Array


def preprocess(x: Array, n_splitter: int = 1, n_bits: int = 8, sign: bool = True, normalize: bool = True) -> Array:
    """Split the input into MSB + residual streams (reference process.py:16-37).

    x: [B, T] or [B, C, T] -> [B, C * n_splitter, T]. The max-abs is taken
    over the *whole* tensor (including batch), faithful to the reference.
    """
    if x.ndim == 2:
        x = x[:, None, :]
    if n_splitter <= 1:
        return x

    max_abs = jnp.maximum(jnp.abs(jnp.min(x)), jnp.abs(jnp.max(x)))
    if normalize:
        x = x / max_abs
        threshold = jnp.asarray(1.0, x.dtype)
    else:
        threshold = max_abs
    delta = threshold / (2 ** (n_bits - int(sign)))

    streams = []
    for _ in range(n_splitter):
        x_quant = splitter_quantize(x, threshold=threshold, n_bits=n_bits, sign=sign)
        streams.append(x_quant)
        # error = x - x_quant is in [0, delta); remap to [-threshold, threshold].
        x = 2.0 * (x - x_quant) * threshold / delta - threshold
    return jnp.concatenate(streams, axis=1)


def postprocess(x: Array, n_combiner: int = 1, n_bits: int = 8, sign: bool = True) -> Array:
    """Recombine decoder output planes (reference process.py:39-52).

    x: [n_combiner, B, S, C, T] -> [B, S, T] (C==1) or [B, S, C, T].
    """
    if n_combiner == 1:
        y = x[0] if x.ndim >= 1 else x
    else:
        delta = 1.0 / (2 ** (n_bits - int(sign)))
        y = x[0]
        for i in range(1, n_combiner):
            y = y + x[i] * (0.5 * delta) ** i
    if y.ndim <= 4 and y.shape[-2] == 1:
        y = jnp.squeeze(y, axis=-2)
    return y


def split_msb_lsb(x: Array, n_bits: int = 8, sign: bool = True) -> tuple[Array, Array]:
    """Teacher-output MSB/LSB split for distillation (mysystem.py:16-22).

    x: [B, ...] -> (msb, lsb) each [B, ...]. The reference indexes x[0]
    because its distill path runs batch-1; here the threshold is computed
    per sample (max-abs over the non-batch axes) — identical at B=1, and a
    B>1 caller gets each sample split against itself instead of silently
    distilling every batch element against sample 0's planes.
    """
    axes = tuple(range(1, x.ndim))
    threshold = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    x_msb = splitter_quantize(x, threshold=threshold, n_bits=n_bits, sign=sign)
    delta = 1.0 / (2 ** (n_bits - int(sign)))
    x_lsb = (x - x_msb) / (0.5 * delta)
    return x_msb, x_lsb
