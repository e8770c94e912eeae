"""Shared primitives for the int8 serving engines.

The engines (serve/convtasnet_int8.py, serve/convtasnet_music_int8.py,
serve/sepformer_int8.py, serve/dptnet_int8.py) all build on the same
exact-grid machinery: after QAT every activation-quantizer output lies on
its 8-bit uniform grid ``y = delta * X + mn`` with integer ``X in [0, 255]``
(quant/fake_quant.py:93-103; reference qat_quant.py:125-147), and every
weight-quantizer output on a per-out-channel symmetric grid
``w = s_w[c] * W`` with ``W in [-128, 127]``. A matmul of grid values is
therefore computable EXACTLY in int8/int32 on the MXU:

    out[n] = delta * s_w[n] * dot(X - 128, W)[n]
           + (mn + 128 * delta) * s_w[n] * sum_k(W[k, n]) + bias[n]

This module holds the frozen-grid containers (:class:`Grid`,
:class:`Int8Weight`), the int8 activation carrier (:class:`QAct` — 1
byte/elem between stages, 4x less HBM traffic than f32), and the host-side
weight preparation (:func:`int8_weight`, :func:`dequant_weight`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


@dataclasses.dataclass
class Grid:
    """Frozen per-tensor activation grid: y = delta * X + mn, X in [0, 255]."""

    delta: float
    mn: float


@dataclasses.dataclass
class Int8Weight:
    """Per-out-channel symmetric int8 weight for a 1x1 conv / dense ([K, N])."""

    w_int: np.ndarray  # [K, N] int8
    scale: np.ndarray  # [N] f32, s_w
    sum_w: np.ndarray  # [N] f32, sum_k W[k, n]
    bias: np.ndarray | None  # [N] f32


def act_grid(qp: dict, n_bits: int = 8) -> Grid:
    """Freeze an activation quantizer's qparams into a :class:`Grid`.

    f32 arithmetic throughout: the fake-quant path computes
    ``delta = (mx - mn) / 255`` in f32 on device, and a grid constant that
    differs in the 8th decimal shifts round() tie boundaries, flipping
    occasional one-LSB requant results vs the QAT forward.
    """
    mn = np.float32(np.asarray(qp["min_range"], np.float32).reshape(-1)[0])
    mx = np.float32(np.asarray(qp["max_range"], np.float32).reshape(-1)[0])
    delta = np.float32(mx - mn) / np.float32(2**n_bits - 1)
    return Grid(delta=np.float32(delta), mn=mn)


def int8_weight(kernel: np.ndarray, wq: dict, bias: np.ndarray | None, n_bits: int = 8) -> Int8Weight:
    """kernel: (..., K, N) 1x1-conv/dense kernel; wq: weight_fake_quantize qparams."""
    w = np.asarray(kernel, np.float32).reshape(kernel.shape[-2], kernel.shape[-1])  # [K, N]
    mn = np.asarray(wq["min_range"], np.float32).reshape(-1)
    mx = np.asarray(wq["max_range"], np.float32).reshape(-1)
    max_abs = np.maximum(np.abs(mn), np.abs(mx))  # [N]
    scale = 2.0 * max_abs / (2**n_bits - 1)
    safe = np.where(scale > 0, scale, 1.0)
    w_int = np.clip(np.round(w / safe[None, :]), -(2 ** (n_bits - 1)), 2 ** (n_bits - 1) - 1)
    return Int8Weight(
        w_int=w_int.astype(np.int8),
        scale=scale.astype(np.float32),
        sum_w=w_int.sum(axis=0).astype(np.float32),
        bias=None if bias is None else np.asarray(bias, np.float32),
    )


def dequant_weight(kernel: np.ndarray, wq: dict | None, ch_axis: int, n_bits: int = 8) -> np.ndarray:
    """Fold the weight fake-quant once (host-side) for the f32/bf16 convs.

    ``ch_axis`` documents the per-channel axis; the stored ranges already
    carry the keepdims shape, so the grid broadcasts without reshaping.
    """
    w = np.asarray(kernel, np.float32)
    if wq is None:
        return w
    mn = np.asarray(wq["min_range"], np.float32)
    mx = np.asarray(wq["max_range"], np.float32)
    max_abs = np.maximum(np.abs(mn), np.abs(mx))
    delta = 2.0 * max_abs / (2**n_bits - 1)
    delta = np.where(delta > 0, delta, 1.0)
    q = np.clip(np.round(w / delta), -(2 ** (n_bits - 1)), 2 ** (n_bits - 1) - 1)
    return (delta * q).astype(np.float32)


class QAct:
    """A quantized activation stored as the int8 plane Xs = X - 128.

    Materializing activations at 1 byte/elem cuts the HBM traffic of every
    producer/consumer boundary 4x vs the f32 fake-quant tensor; the f32 view
    (exactly equal to the fake-quant output) is reconstructed in-register by
    whatever elementwise chain consumes it.
    """

    __slots__ = ("Xs", "grid")

    def __init__(self, Xs: Array, grid: Grid):
        self.Xs = Xs  # int8, X - 128 with X on the [0, 255] grid
        self.grid = grid

    @property
    def f32(self) -> Array:
        g = self.grid
        # X = Xs + 128 is exact integer arithmetic in f32, so this equals the
        # fake-quant path's delta * X + mn bit-for-bit.
        X = self.Xs.astype(jnp.float32) + 128.0
        return g.delta * X + g.mn

    @property
    def int8(self) -> Array:
        return self.Xs


def requant(x: Array, g: Grid) -> QAct:
    """Snap an on-grid (or about-to-be-quantized) f32 tensor to int8 form."""
    X = jnp.clip(jnp.round((x - g.mn) / g.delta), 0.0, 255.0)
    return QAct((X - 128.0).astype(jnp.int8), g)


def int8_matmul(qa: QAct, w: Int8Weight) -> Array:
    """Exact int8 matmul over the last axis: [..., K] x [K, N] -> [..., N] f32."""
    *lead, k = qa.Xs.shape
    acc = lax.dot_general(
        qa.int8.reshape(-1, k),
        jnp.asarray(w.w_int),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    scale = jnp.asarray(qa.grid.delta * w.scale)  # [N]
    corr = jnp.asarray((qa.grid.mn + 128.0 * qa.grid.delta) * w.scale * w.sum_w)  # [N]
    out = acc * scale + corr
    if w.bias is not None:
        out = out + jnp.asarray(w.bias)
    return out.reshape(*lead, -1)


def prelu(x: Array, alpha: Array) -> Array:
    return jnp.where(x >= 0, x, alpha * x)


def gn1(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    """GroupNorm(num_groups=1): normalize over all non-batch axes,
    per-feature affine on the last axis (flax nn.GroupNorm semantics)."""
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * scale + bias


def layer_norm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    """LayerNorm over the last axis (flax nn.LayerNorm semantics)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * scale + bias


def conv1d(x: Array, w, dt, stride: int = 1, padding: int = 0, dilation: int = 1, groups: int = 1) -> Array:
    """NWC conv with host-folded weights in the engine compute dtype."""
    return lax.conv_general_dilated(
        x.astype(dt),
        jnp.asarray(w, dt),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def conv_transpose1d(x: Array, w, dt, stride: int, kernel_size: int) -> Array:
    """NWC transposed conv (torch semantics, zero padding/output_padding)."""
    pad = kernel_size - 1
    return lax.conv_general_dilated(
        x.astype(dt),
        jnp.flip(jnp.asarray(w, dt), axis=0),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )


def check_8bit_spec(q) -> None:
    """Common engine preconditions: full fake-quant on 8-bit linear grids."""
    if not (q.qat and q.act_quant and q.weight_quant):
        raise ValueError("int8 engine requires a fully fake-quantized model")
    if q.act_n_bits != 8 or q.weight_n_bits != 8 or q.out_act_n_bits != 8:
        raise NotImplementedError("the int8 engine maps 8-bit grids onto s8 hardware")
    if q.in_quant and (q.in_act_n_bits != 8 or q.inout_nl_quant):
        raise NotImplementedError(
            "the int8 engine's input requant assumes a linear 8-bit input grid"
        )
