"""Bit-faithful fake-quantization math.

Pure-function TPU reimplementation of the reference quantizer grid
(reference: quantization/qat/qat_quant.py:110-164 and process.py:10-14).
These functions define the integer grid the whole framework must bit-match:

* ``linear_fake_quant``  — symmetric (signed max-abs) and uniform
  (asymmetric min/max, zero-point = min) fake quantizers with STE rounding
  and optional LSQ-style gradient scaling.
* ``mulaw_fake_quant``   — mu-law companded fake quantizer with learnable mu.
* ``fix_range_to_include_zero`` — grid alignment used by exported quantizers.
* ``splitter_quantize``  — the floor-based quantizer the input splitter uses.
* ``torch_fake_quantize_per_tensor`` / ``..._per_channel`` — frozen-grid
  semantics equal to ``torch.fake_quantize_per_{tensor,channel}_affine``
  (qat_quant.py:15-72), used for deploy-grid export checks.

All ops are elementwise; under jit XLA fuses them into the surrounding
matmul/conv epilogues, so no dedicated Pallas kernel is needed for the
fake-quant itself (the fusion *with* convs is handled in fqss_tpu.ops).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from fqss_tpu.quant.ste import grad_scale, grad_sign, round_ste

Array = jax.Array


def qrange(n_bits: int, sign: bool) -> tuple[int, int]:
    """Integer grid limits: signed -> [-2^(n-1), 2^(n-1)-1], unsigned [0, 2^n-1]."""
    if sign:
        return -(2 ** (n_bits - 1)), 2 ** (n_bits - 1) - 1
    return 0, 2**n_bits - 1


def fix_range_to_include_zero(range_min: Array, range_max: Array, n_bits: int) -> tuple[Array, Array]:
    """Shift (min, max) so that zero lands exactly on the integer grid.

    Matches reference qat_quant.py:110-122: when the range straddles zero the
    min is snapped to a grid multiple of the scale; single-sided ranges are
    clamped at zero on the appropriate side.
    """
    min_positive = range_min > 0
    max_negative = range_max < 0
    mid_range = jnp.logical_and(jnp.logical_not(min_positive), jnp.logical_not(max_negative))
    min_positive = min_positive.astype(range_min.dtype)
    max_negative = max_negative.astype(range_min.dtype)
    mid_range = mid_range.astype(range_min.dtype)
    scale = (range_max - range_min) / (2**n_bits - 1)
    min_range_adj = scale * jnp.round(range_min / scale)
    max_range_adj = range_max - range_min + min_range_adj
    min_range_adj = min_range_adj * mid_range + max_negative * range_min
    max_range_adj = max_range_adj * mid_range + min_positive * range_max
    return min_range_adj, max_range_adj


def linear_fake_quant(
    x: Array,
    min_range: Array,
    max_range: Array,
    n_bits: int,
    sign: bool | Array = True,
    sym: bool = False,
    scale_grad: bool = False,
) -> Array:
    """Linear fake quantization with STE (reference qat_quant.py:125-147).

    sym=True : symmetric grid from per-channel max-abs; ``sign`` selects the
               signed/unsigned integer window (may be a traced bool array).
    sym=False: uniform asymmetric grid, zero-point = min_range; ``sign`` is
               ignored (faithful to the reference's uniform branch).
    """
    if sym:
        # Symmetric quantizer. sign may be traced -> compute both windows.
        qmin_s, qmax_s = qrange(n_bits, True)
        qmin_u, qmax_u = qrange(n_bits, False)
        sign_arr = jnp.asarray(sign)
        qmin = jnp.where(sign_arr, qmin_s, qmin_u).astype(x.dtype)
        qmax = jnp.where(sign_arr, qmax_s, qmax_u).astype(x.dtype)
        max_abs_range = jnp.maximum(jnp.abs(min_range), jnp.abs(max_range))
        delta = 2.0 * max_abs_range / (2**n_bits - 1)
        if scale_grad:
            # Reference uses the *signed* Qmax constant here regardless of sign.
            scale_factor = 1.0 / math.sqrt(qmax_s * max_abs_range.size)
            delta = grad_scale(delta, scale_factor)
        X = round_ste(x / delta)
        return delta * jnp.clip(X, qmin, qmax)
    else:
        # Uniform (asymmetric) quantizer.
        qmin, qmax = 0, 2**n_bits - 1
        delta = (max_range - min_range) / (2**n_bits - 1)
        if scale_grad:
            n_channels = int(x.shape[-1])
            scale_factor = 1.0 / math.sqrt(qmax * n_channels)
            delta = grad_scale(delta, scale_factor)
        zp = min_range
        X = round_ste((x - zp) / delta)
        return delta * jnp.clip(X, qmin, qmax) + zp


def mulaw_fake_quant(
    x: Array,
    min_range: Array,
    max_range: Array,
    mu: Array,
    n_bits: int,
    scale_grad: bool = False,
) -> Array:
    """Mu-law companded fake quantization (reference qat_quant.py:150-164).

    normalize -> mu-law compress -> uniform fake-quant on [-1, 1] -> expand.
    ``mu`` is a learnable companding parameter.
    """
    max_abs_range = jnp.maximum(jnp.abs(min_range), jnp.abs(max_range))
    x_norm = x / max_abs_range
    x_mu = grad_sign(x_norm) * jnp.log1p(mu * jnp.abs(x_norm)) / jnp.log1p(mu)
    one = jnp.ones((1,), dtype=x.dtype)
    # Reference calls linear_quantize with default sym=False, sign=True.
    x_mu_q = linear_fake_quant(x_mu, -one, one, n_bits, sign=True, sym=False, scale_grad=scale_grad)
    y_norm = grad_sign(x_mu_q) * (jnp.power(1.0 + mu, jnp.abs(x_mu_q)) - 1.0) / mu
    return y_norm * max_abs_range


def splitter_quantize(x: Array, threshold: float | Array = 1.0, n_bits: int = 8, sign: bool = True) -> Array:
    """Floor-based uniform quantizer used by the input splitter.

    Matches reference process.py:10-14 exactly:
    delta = threshold / 2^(n_bits - sign); y = clip(floor(x/delta), Qmin, Qmax) * delta.
    """
    delta = threshold / (2 ** (n_bits - int(sign)))
    min_val = -(2 ** (n_bits - int(sign))) if sign else 0
    max_val = 2 ** (n_bits - int(sign)) - 1
    return jnp.clip(jnp.floor(x / delta), min_val, max_val) * delta


# ---------------------------------------------------------------------------
# Frozen torch-grid semantics (deploy/export check).
# ---------------------------------------------------------------------------


def torch_fake_quantize_per_tensor(
    x: Array, scale: float, zero_point: int, quant_min: int, quant_max: int
) -> Array:
    """Equivalent of torch.fake_quantize_per_tensor_affine.

    q = clamp(round(x / scale) + zp, qmin, qmax); y = (q - zp) * scale with
    round-half-to-even, matching reference qat_quant.py:38-53 exports.
    """
    q = jnp.clip(jnp.round(x / scale) + zero_point, quant_min, quant_max)
    return (q - zero_point) * scale


def torch_fake_quantize_per_channel(
    x: Array, scales: Array, zero_points: Array, axis: int, quant_min: int, quant_max: int
) -> Array:
    """Equivalent of torch.fake_quantize_per_channel_affine (qat_quant.py:15-35)."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    scales = scales.reshape(shape)
    zero_points = zero_points.reshape(shape)
    q = jnp.clip(jnp.round(x / scales) + zero_points, quant_min, quant_max)
    return (q - zero_points) * scales
