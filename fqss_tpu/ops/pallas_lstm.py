"""Pallas TPU kernel for the LSTM recurrence (SURVEY §7.3c).

DPTNet's latency is dominated by its dual-path LSTM-FFN scans
(reference: quantization/qat/models/dptnetq.py:60-97): 12 bidirectional
LSTM layers -> 24 directional scans of ~130-250 serial steps, each step a
tiny [B,H]@[H,4H] matmul plus elementwise gates. Under ``lax.scan`` every
step is a separate HLO matmul in a device loop, so fixed per-op overhead
-- not FLOPs -- sets the latency floor.

This kernel moves the **time loop into the Pallas grid**: the recurrent
state (h, c) and the gate weights ``w_hh`` stay resident in VMEM for the
whole sequence, the precomputed input projections stream in one
[1, B_tile, 4H] tile per step (time-major layout, so block shapes satisfy
the (8, 128) tiling of the last two dims), and each grid step does one MXU
matmul plus the gate math in a single fused pass. Nothing round-trips to
HBM between timesteps.

The recurrence math is identical to :mod:`fqss_tpu.nn.lstm`'s fused-mode
scan body (gate order i,f,g,o — torch's; reference
quantization/qat/qat_layers.py:595-601): the input projection
``x @ W_ih + b_ih + b_hh`` is hoisted outside (one big MXU matmul there),
and only the ``h @ W_hh`` recurrence runs here.

Gradients: :func:`lstm_sequence` carries a ``jax.custom_vjp`` whose
backward rematerializes the forward with the ``lax.scan`` reference
implementation and differentiates through that — so enabling the kernel
(``QuantSpec.pallas_lstm``) is safe inside a training step, while the
serving/eval path gets the Pallas forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(hidden_size: int) -> bool:
    """The kernel requires lane-aligned gate slices."""
    return hidden_size % _LANE == 0


def _lstm_kernel(ih_ref, whh_ref, o_ref, h_ref, c_ref, *, hidden: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = hidden
    gates = ih_ref[0] + jnp.dot(
        h_ref[:], whh_ref[:], preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    h_ref[:] = h
    c_ref[:] = c
    o_ref[0] = h


def _lstm_pallas_fwd(ih_all: Array, w_hh: Array) -> Array:
    T, B, G = ih_all.shape
    H = G // 4
    if not supported(H):
        return _lstm_scan(ih_all, w_hh)
    dt = ih_all.dtype
    Bp = _round_up(B, 8)
    TB = min(Bp, 512)
    Bp = _round_up(Bp, TB)
    x = ih_all.astype(jnp.float32)
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden=H),
        grid=(Bp // TB, T),
        in_specs=[
            pl.BlockSpec((1, TB, G), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TB, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * T * H * G,
            bytes_accessed=4 * (Bp * T * G + H * G + Bp * T * H),
            transcendentals=4 * Bp * T * H,
        ),
    )(x, w_hh.astype(jnp.float32))
    return out[:, :B].astype(dt)


def _bilstm_kernel(ihf_ref, ihb_ref, whh_ref, of_ref, ob_ref, hf_ref, cf_ref, hb_ref, cb_ref, *, hidden: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        cf_ref[:] = jnp.zeros_like(cf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)
        cb_ref[:] = jnp.zeros_like(cb_ref)

    H = hidden

    def gate_step(gates, c):
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c + i * g
        return o * jnp.tanh(c), c

    gf = ihf_ref[0] + jnp.dot(hf_ref[:], whh_ref[0], preferred_element_type=jnp.float32)
    hf, cf = gate_step(gf, cf_ref[:])
    hf_ref[:] = hf
    cf_ref[:] = cf
    of_ref[0] = hf
    gb = ihb_ref[0] + jnp.dot(hb_ref[:], whh_ref[1], preferred_element_type=jnp.float32)
    hb, cb = gate_step(gb, cb_ref[:])
    hb_ref[:] = hb
    cb_ref[:] = cb
    ob_ref[0] = hb


def _bilstm_pallas_fwd(ih_f: Array, ih_b: Array, w_f: Array, w_b: Array) -> tuple[Array, Array]:
    T, B, G = ih_f.shape
    H = G // 4
    if not supported(H):
        return _lstm_scan(ih_f, w_f), _lstm_scan(ih_b, w_b)
    dt = ih_f.dtype
    Bp = _round_up(B, 8)
    TB = min(Bp, 512)
    Bp = _round_up(Bp, TB)
    xf = ih_f.astype(jnp.float32)
    xb = ih_b.astype(jnp.float32)
    if Bp != B:
        pad = ((0, 0), (0, Bp - B), (0, 0))
        xf = jnp.pad(xf, pad)
        xb = jnp.pad(xb, pad)
    whh = jnp.stack([w_f, w_b]).astype(jnp.float32)  # [2, H, G]
    out_f, out_b = pl.pallas_call(
        functools.partial(_bilstm_kernel, hidden=H),
        grid=(Bp // TB, T),
        in_specs=[
            pl.BlockSpec((1, TB, G), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, G), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, G), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * T * H * G,
            bytes_accessed=4 * (2 * Bp * T * G + 2 * H * G + 2 * Bp * T * H),
            transcendentals=2 * 4 * Bp * T * H,
        ),
    )(xf, xb, whh)
    return out_f[:, :B].astype(dt), out_b[:, :B].astype(dt)


def _bilstm_scan_pair(ih_f, ih_b, w_f, w_b):
    return _lstm_scan(ih_f, w_f), _lstm_scan(ih_b, w_b)


@jax.custom_vjp
def bilstm_sequence(ih_f: Array, ih_b: Array, w_f: Array, w_b: Array) -> tuple[Array, Array]:
    """Both directions of a BiLSTM in ONE Pallas launch (VERDICT r4 item 6).

    DPTNet runs 24 directional recurrences per forward; fusing each
    bidirectional pair into a single grid halves the launch count and gives
    every grid step two back-to-back MXU matmuls to pipeline instead of
    one. ih_f/ih_b: [T, B, 4H] input projections, EACH ALREADY IN ITS OWN
    SCAN ORDER (the reverse direction pre-flipped, as _LSTMDirection
    emits); w_f/w_b: [H, 4H]. Returns (hs_f, hs_b), each [T, B, H] in scan
    order — the caller un-flips the backward stream.
    Backward: scan-rematerialized, like :func:`lstm_sequence`.
    """
    return _bilstm_pallas_fwd(ih_f, ih_b, w_f, w_b)


def _bi_vjp_fwd(ih_f, ih_b, w_f, w_b):
    return _bilstm_pallas_fwd(ih_f, ih_b, w_f, w_b), (ih_f, ih_b, w_f, w_b)


def _bi_vjp_bwd(res, g):
    ih_f, ih_b, w_f, w_b = res
    _, pullback = jax.vjp(_bilstm_scan_pair, ih_f, ih_b, w_f, w_b)
    return pullback(g)


bilstm_sequence.defvjp(_bi_vjp_fwd, _bi_vjp_bwd)


def _lstm_scan(ih_all: Array, w_hh: Array) -> Array:
    """Reference lax.scan recurrence — same math, used for bwd + fallback."""
    T, B, G = ih_all.shape
    H = G // 4
    h0 = jnp.zeros((B, H), ih_all.dtype)
    c0 = jnp.zeros((B, H), ih_all.dtype)

    def step(carry, ih_t):
        h, c = carry
        gates = ih_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), ih_all)
    return hs


@jax.custom_vjp
def lstm_sequence(ih_all: Array, w_hh: Array) -> Array:
    """LSTM recurrence over precomputed input projections (time-major).

    ih_all: [T, B, 4H] = x @ W_ih + b_ih + b_hh (torch gate order i,f,g,o);
    w_hh:   [H, 4H]. Returns hs [T, B, H] with zero initial state.
    Pallas forward (time loop in-kernel); scan-rematerialized backward.
    """
    return _lstm_pallas_fwd(ih_all, w_hh)


def _vjp_fwd(ih_all, w_hh):
    return _lstm_pallas_fwd(ih_all, w_hh), (ih_all, w_hh)


def _vjp_bwd(res, g):
    ih_all, w_hh = res
    _, pullback = jax.vjp(_lstm_scan, ih_all, w_hh)
    return pullback(g)


lstm_sequence.defvjp(_vjp_fwd, _vjp_bwd)
