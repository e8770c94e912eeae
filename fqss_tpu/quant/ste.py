"""Straight-through-estimator (STE) primitives.

TPU-native reimplementation of the reference STE ops
(reference: quantization/qat/qat_quant.py:88-122). Each op computes a
non-differentiable value in the forward pass while letting gradients pass
through (optionally rescaled) in the backward pass, expressed with
``jax.lax.stop_gradient`` so XLA fuses them into surrounding elementwise work.

All functions are pure and jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def round_ste(x: Array) -> Array:
    """Round-to-nearest-even forward, identity gradient.

    ``jnp.round`` matches torch.round (banker's rounding), which defines the
    reference's fake-quant grid (qat_quant.py:88-89).
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x: Array) -> Array:
    """Floor forward, identity gradient (qat_quant.py:92-93)."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def grad_sign(x: Array, scale: float | Array = 1.0) -> Array:
    """sign(x) forward; gradient of ``scale * x`` backward (qat_quant.py:96-98)."""
    x_scaled = x * scale
    return x_scaled + jax.lax.stop_gradient(jnp.sign(x) - x_scaled)


def grad_scale(x: Array, scale: float | Array) -> Array:
    """Identity forward; gradient scaled by ``scale`` backward (qat_quant.py:101-103).

    Used for LSQ-style learned-step-size gradient rescaling.
    """
    x_scaled = x * scale
    return x_scaled + jax.lax.stop_gradient(x - x_scaled)


def clip_ste(x: Array, min_val: float | Array = -1.0, max_val: float | Array = 1.0) -> Array:
    """Clip forward, identity gradient (qat_quant.py:106-107)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, min_val, max_val) - x)
