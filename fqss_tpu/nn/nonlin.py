"""Nonlinearities used by the quantized layer library.

Covers the activation set the reference fuses into its wrappers
(reference: quantization/qat/qat_layers.py:511-518 NlQ and the fused
Conv/Linear+NL variants): PReLU (learnable, torch-init 0.25), ReLU,
LeakyReLU, Sigmoid, Tanh, GELU, GLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Nl(nn.Module):
    """Named nonlinearity; ``kind=None``/"identity" is a no-op.

    GLU splits ``axis`` (default: channel-last) in half: a * sigmoid(b),
    matching torch.nn.GLU on the channel dim of the reference's NCL layout.
    PReLU carries a learnable slope (torch default: 1 shared param, 0.25).
    """

    kind: str | None = None
    glu_axis: int = -1
    negative_slope: float = 0.01  # LeakyReLU

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = (self.kind or "identity").lower()
        if k in ("identity", "none"):
            return x
        if k == "relu":
            return jax.nn.relu(x)
        if k == "prelu":
            alpha = self.param("alpha", lambda rng: jnp.full((1,), 0.25, jnp.float32))
            return jnp.where(x >= 0, x, alpha * x)
        if k == "leaky_relu":
            return jax.nn.leaky_relu(x, self.negative_slope)
        if k == "sigmoid":
            return jax.nn.sigmoid(x)
        if k == "tanh":
            return jnp.tanh(x)
        if k == "gelu":
            return jax.nn.gelu(x, approximate=False)
        if k == "glu":
            a, b = jnp.split(x, 2, axis=self.glu_axis)
            return a * jax.nn.sigmoid(b)
        raise ValueError(f"Unsupported nonlinearity: {self.kind}")
