"""Fused fake-quant attention Pallas kernel (SURVEY §7.3d).

The dual-path transformers (Sepformer/DPTNet intra+inter blocks, HTDemucs
cross-transformer) spend their attention time not in FLOPs but in HBM
traffic: XLA materializes the [B*h, Lq, Lk] attention logits between the
QK^T einsum, the softmax, and the AV einsum (reference quant placement:
quantization/qat/qat_layers.py:924-947). For Sepformer shapes
(B*h ≈ 4k, L = 250) that is ~1 GB of logits written + read per forward on
an HBM-bound device.

This kernel runs the whole attention core for one (batch·head, q-tile) in
a single VMEM pass — Q·Kᵀ on the MXU, key-padding mask, softmax, attn·V,
and the output-head fake-quantizer (the reference's
``activation_fake_quantize_head`` site, qat_layers.py:944-947) — so the
logits never leave VMEM. The attn/softmax quantizer sites between the two
matmuls are **no-ops in the reference** (the ``attn - ...`` vs
``attn = ...`` typo, qat_layers.py:934,936), which is exactly what makes
this fusion legal without extra range inputs; the ``fix_attn_quant=True``
variant falls back to the XLA path.

Inputs are the post-in-proj, post-div-quant heads (the q/√d scaling and
its quantizer run outside — they are one cheap elementwise pass over
[BH, L, d], not the bandwidth problem). The head fake-quant is the uniform
(asymmetric) grid of :func:`fqss_tpu.quant.fake_quant.linear_fake_quant`
with per-tensor learned (min, max).

Gradients: :func:`fused_attention` carries a ``jax.custom_vjp`` whose
backward rematerializes the XLA composition and differentiates through it
(including the STE rules and the range gradients), so enabling the kernel
(``QuantSpec.pallas_attn``) is training-safe; like the serving engines it
assumes quantizer ranges are past the observer phase (it applies the grid
unconditionally, where the module path returns the float value during the
EMA window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fqss_tpu.quant.fake_quant import linear_fake_quant

Array = jax.Array

_LANE = 128
_SUB = 8
# VMEM ceiling for one grid step (f32 words): q/k/v/out tiles + logits.
_MAX_VMEM_WORDS = 3 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(lq: int, lk: int, d: int) -> bool:
    """Shapes where the fusion fits in VMEM AND is profitable.

    Profitability: the kernel pads Lk and d up to the 128-lane tile, so for
    short sequences (e.g. Sepformer's inter-chunk attention, L ≈ n_chunks ≈
    32) the padding waste plus per-grid-step overhead loses to XLA's batched
    bmm — measured 2.6x slower at the full-Sepformer level when fused
    unconditionally, vs 44x faster on the long intra-chunk shapes. Gate on
    the [Lq, Lk] logit panel being at least one full 128x128 tile: that is
    exactly when XLA's HBM round-trip of the logits is material.

    Small heads: d < 32 pads the lane dim >= 4x with zeros (DPTNet's
    d_head=16 wastes 8x of every MXU pass), measured as a 1.3x FULL-MODEL
    regression (739 vs 569 ms, BENCH_models_r05) — fall back to XLA there
    until the kernel packs multiple heads per lane tile (PARITY.md round-5
    DPTNet ablation).
    """
    dp = _round_up(d, _LANE)
    lkp = _round_up(lk, _LANE)
    tq = min(_round_up(lq, _SUB), 512)
    words = tq * dp + 2 * lkp * dp + tq * lkp + tq * dp
    return 32 <= d <= 2 * _LANE and lq >= _LANE and lk >= _LANE and words <= _MAX_VMEM_WORDS


def _attn_kernel(q_ref, k_ref, v_ref, mn_ref, mx_ref, o_ref, *, n_bits: int, lk: int, lkp: int):
    q = q_ref[0]  # [TQ, Dp]
    k = k_ref[0]  # [Lkp, Dp]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, Lkp]
    if lkp != lk:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < lk, logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    heads = jnp.dot(attn, v_ref[0], preferred_element_type=jnp.float32)  # [TQ, Dp]
    # Uniform fake-quant epilogue (linear_fake_quant sym=False semantics).
    mn = mn_ref[0, 0]
    mx = mx_ref[0, 0]
    delta = (mx - mn) / (2**n_bits - 1)
    X = jnp.round((heads - mn) / delta)
    o_ref[0] = delta * jnp.clip(X, 0, 2**n_bits - 1) + mn


def _attention_xla(qs: Array, k: Array, v: Array, mn: Array, mx: Array, n_bits: int) -> Array:
    """Reference XLA composition — same math, used for bwd + fallback."""
    logits = jnp.einsum("bqd,bkd->bqk", qs, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    heads = jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32)
    return linear_fake_quant(heads, mn, mx, n_bits, sign=mn < 0, sym=False)


def _attn_pallas_fwd(qs: Array, k: Array, v: Array, mn: Array, mx: Array, n_bits: int) -> Array:
    BH, Lq, D = qs.shape
    Lk = k.shape[1]
    if not supported(Lq, Lk, D):
        return _attention_xla(qs, k, v, mn, mx, n_bits)
    dt = qs.dtype
    Dp = _round_up(D, _LANE)
    Lkp = _round_up(Lk, _LANE)
    TQ = min(_round_up(Lq, _SUB), 512)
    Lqp = _round_up(Lq, TQ)

    def pad(x, rows):
        return jnp.pad(
            x.astype(jnp.float32),
            ((0, 0), (0, rows - x.shape[1]), (0, Dp - D)),
        )

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_bits=n_bits, lk=Lk, lkp=Lkp),
        grid=(BH, Lqp // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lqp, Dp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lqp * Lkp * Dp,
            bytes_accessed=4 * BH * (2 * Lqp * Dp + 2 * Lkp * Dp),
            transcendentals=BH * Lqp * Lkp,
        ),
    )(
        pad(qs, Lqp),
        pad(k, Lkp),
        pad(v, Lkp),
        mn.reshape(1, 1).astype(jnp.float32),
        mx.reshape(1, 1).astype(jnp.float32),
    )
    return out[:, :Lq, :D].astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention(qs: Array, k: Array, v: Array, mn: Array, mx: Array, n_bits: int = 8) -> Array:
    """softmax(qs·kᵀ)·v with a fused uniform head fake-quant epilogue.

    qs: [BH, Lq, d] — query heads, already scaled by 1/√d and div-quantized;
    k, v: [BH, Lk, d]; mn/mx: (1,)-shaped learned head-quantizer range.
    Pallas forward (logits never touch HBM); XLA-rematerialized backward.
    """
    return _attn_pallas_fwd(qs, k, v, mn, mx, n_bits)


def _vjp_fwd(qs, k, v, mn, mx, n_bits):
    return _attn_pallas_fwd(qs, k, v, mn, mx, n_bits), (qs, k, v, mn, mx)


def _vjp_bwd(n_bits, res, g):
    qs, k, v, mn, mx = res
    _, pullback = jax.vjp(lambda *a: _attention_xla(*a, n_bits), qs, k, v, mn, mx)
    return pullback(g)


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
