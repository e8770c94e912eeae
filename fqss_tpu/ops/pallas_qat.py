"""Custom-VJP Pallas TPU kernels for the QAT *training* hot path.

Round-2 landed forward/serving kernels (:mod:`fqss_tpu.ops.pallas_quant`);
this module adds the training side: fake-quantizers whose forward AND
backward are single-VMEM-pass Pallas kernels, with gradients that match
``jax.grad`` of the XLA composition (fqss_tpu/quant/fake_quant.py,
reference quantization/qat/qat_quant.py:125-147) to float32 rounding noise
— including the straight-through-estimator rules, the LSQ-style
``scale_grad`` rescaling, and JAX's 0.5-at-tie clip semantics.

Analytic backward (derived from the STE composition, verified vs autodiff):

uniform (activations), ``y = delta*clip(round((x-mn)/delta),0,Q) + mn``::

    m   = 1 inside (0,Q), 0.5 at X==0 or X==Q, 0 outside   # clip-tie VJP
    t   = (C - m*u) / Q                                    # LSQ range grad
    dx  = g * m
    dmn = sum(g * (1 - m - s*t));   dmx = sum(g * s*t)

per-channel symmetric (weights), ``y = delta*clip(round(w/delta),qmin,qmax)``
with ``delta = 2*max(|mn|,|mx|)/Q``::

    dw     = g * m
    ddelta = sum_rows(g * (C - m*u))          # per channel
    dmax   = s * 2/Q * ddelta, routed to mn/mx by |mn| vs |mx| (0.5 at tie)

``s`` is the ``grad_scale`` factor (1 when ``scale_grad=False``).

Three public entry points:

* :func:`act_fake_quant_train`    — per-tensor uniform fake-quant (the
  ActQuantizer hot op), fwd+bwd Pallas.
* :func:`weight_fake_quant_train` — per-channel symmetric fake-quant (the
  WeightQuantizer hot op), fwd+bwd Pallas.
* :func:`qat_dense`               — fused QAT dense layer
  ``act_fq(x @ weight_fq(w) + b)`` whose backward recomputes the quantized
  weight and pre-activation in-kernel (rematerialization: nothing but
  (x, w, ranges) is saved) and emits dx/dw/db/range grads from four tiled
  Pallas kernels.

Wired into the real training path behind ``QuantSpec.pallas_qat`` (the
quantizer modules route their quantize call here; observer/EMA semantics are
untouched). Tested in interpret mode on CPU; compiles natively on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_SUB = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flat2d(x: Array) -> tuple[Array, int, int]:
    """Flatten to a zero-padded [rows, 128] panel; returns (panel, n, rows)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    padded = _round_up(max(n, 1), _SUB * _LANE)
    flat = jnp.pad(flat, (0, padded - n))
    return flat.reshape(padded // _LANE, _LANE), n, padded // _LANE


def _tie_mask(X, lo, hi, dtype):
    """clip's VJP mask: 1 inside, 0.5 exactly at a bound (JAX min/max tie)."""
    inside = jnp.logical_and(X > lo, X < hi).astype(dtype)
    tie = jnp.logical_or(X == lo, X == hi).astype(dtype)
    return inside + 0.5 * tie


# ---------------------------------------------------------------------------
# Per-tensor uniform activation fake-quant (ActQuantizer hot path)
# ---------------------------------------------------------------------------


def _act_fwd_kernel(x_ref, rng_ref, y_ref, *, n_bits: int):
    q = 2**n_bits - 1
    mn = rng_ref[0, 0]
    delta = (rng_ref[0, 1] - mn) / q
    X = jnp.round((x_ref[:] - mn) / delta)
    y_ref[:] = delta * jnp.clip(X, 0, q) + mn


def _act_bwd_kernel(x_ref, g_ref, rng_ref, dx_ref, p_ref, *, n_bits: int):
    q = 2**n_bits - 1
    mn = rng_ref[0, 0]
    s = rng_ref[0, 2]
    delta = (rng_ref[0, 1] - mn) / q
    u = (x_ref[:] - mn) / delta
    X = jnp.round(u)
    C = jnp.clip(X, 0, q)
    m = _tie_mask(X, 0.0, float(q), x_ref.dtype)
    g = g_ref[:]
    t = (C - m * u) / q
    dx_ref[:] = g * m
    p_ref[0, 0] = jnp.sum(g * (1.0 - m - s * t))
    p_ref[0, 1] = jnp.sum(g * s * t)


def _act_block_rows(rows: int) -> int:
    return min(rows, 512)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def act_fake_quant_train(x: Array, min_range: Array, max_range: Array,
                         n_bits: int = 8, scale_grad: bool = False) -> Array:
    """Uniform (asymmetric) fake-quant with Pallas fwd/bwd.

    Matches ``linear_fake_quant(x, mn, mx, n_bits, sym=False)`` (values) and
    its jax.grad (cotangents). ``min_range``/``max_range``: shape-(1,) (or
    scalar) f32 learned ranges, as ActQuantizer stores them.
    """
    return _act_fq_fwd_impl(x, min_range, max_range, n_bits)


def _act_fq_fwd_impl(x, mn, mx, n_bits):
    panel, n, rows = _flat2d(x)
    br = _act_block_rows(rows)
    rpad = _round_up(rows, br)
    if rpad != rows:
        panel = jnp.pad(panel, ((0, rpad - rows), (0, 0)))
    rng = jnp.stack([mn.reshape(()), mx.reshape(())]).astype(jnp.float32).reshape(1, 2)
    out = pl.pallas_call(
        functools.partial(_act_fwd_kernel, n_bits=n_bits),
        grid=(rpad // br,),
        in_specs=[
            pl.BlockSpec((br, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((br, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, _LANE), x.dtype),
    )(panel, rng)
    return out.reshape(-1)[:n].reshape(x.shape)


def _act_scale_factor(x: Array, n_bits: int, scale_grad: bool) -> float:
    if not scale_grad:
        return 1.0
    # reference uniform branch: 1/sqrt(Qmax * n_channels), qat_quant.py:139-141
    import math

    return 1.0 / math.sqrt((2**n_bits - 1) * int(x.shape[-1]))


def _act_fq_fwd(x, mn, mx, n_bits, scale_grad):
    return _act_fq_fwd_impl(x, mn, mx, n_bits), (x, mn, mx)


def _act_fq_bwd(n_bits, scale_grad, res, g):
    x, mn, mx = res
    s = _act_scale_factor(x, n_bits, scale_grad)
    panel, n, rows = _flat2d(x)
    gpanel, _, _ = _flat2d(g.astype(x.dtype))
    br = _act_block_rows(rows)
    rpad = _round_up(rows, br)
    if rpad != rows:
        panel = jnp.pad(panel, ((0, rpad - rows), (0, 0)))
        gpanel = jnp.pad(gpanel, ((0, rpad - rows), (0, 0)))
    rng = jnp.stack([mn.reshape(()), mx.reshape(()), jnp.float32(s)]).astype(jnp.float32).reshape(1, 3)
    grid = rpad // br
    dx, partials = pl.pallas_call(
        functools.partial(_act_bwd_kernel, n_bits=n_bits),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, _LANE), x.dtype),
            jax.ShapeDtypeStruct((grid, 2), jnp.float32),
        ],
    )(panel, gpanel, rng)
    dx = dx.reshape(-1)[:n].reshape(x.shape)
    sums = jnp.sum(partials, axis=0)
    dmn = sums[0].reshape(mn.shape).astype(mn.dtype)
    dmx = sums[1].reshape(mx.shape).astype(mx.dtype)
    return dx, dmn, dmx


act_fake_quant_train.defvjp(_act_fq_fwd, _act_fq_bwd)


# ---------------------------------------------------------------------------
# Per-channel symmetric weight fake-quant (WeightQuantizer hot path)
# ---------------------------------------------------------------------------


def _w_fwd_kernel(w_ref, rng_ref, y_ref, *, n_bits: int):
    q = 2**n_bits - 1
    qmin = -(2 ** (n_bits - 1))
    qmax = 2 ** (n_bits - 1) - 1
    max_abs = jnp.maximum(jnp.abs(rng_ref[0, :]), jnp.abs(rng_ref[1, :]))
    delta = 2.0 * max_abs / q
    X = jnp.round(w_ref[:] / delta)
    y_ref[:] = delta * jnp.clip(X, qmin, qmax)


def _w_bwd_kernel(w_ref, g_ref, rng_ref, dw_ref, p_ref, *, n_bits: int):
    q = 2**n_bits - 1
    qmin = -(2 ** (n_bits - 1))
    qmax = 2 ** (n_bits - 1) - 1
    max_abs = jnp.maximum(jnp.abs(rng_ref[0, :]), jnp.abs(rng_ref[1, :]))
    delta = 2.0 * max_abs / q
    u = w_ref[:] / delta
    X = jnp.round(u)
    C = jnp.clip(X, qmin, qmax)
    m = _tie_mask(X, float(qmin), float(qmax), w_ref.dtype)
    g = g_ref[:]
    dw_ref[:] = g * m
    p_ref[0, :] = jnp.sum(g * (C - m * u), axis=0)  # per-channel ddelta


def _to_2d_channels_last(w: Array, ch_axis: int) -> Array:
    return jnp.moveaxis(w, ch_axis, -1).reshape(-1, w.shape[ch_axis])


def _from_2d_channels_last(w2d: Array, shape, ch_axis: int) -> Array:
    ch_axis = ch_axis % len(shape)
    moved = tuple(s for i, s in enumerate(shape) if i != ch_axis) + (shape[ch_axis],)
    return jnp.moveaxis(w2d.reshape(moved), -1, ch_axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def weight_fake_quant_train(w: Array, min_range: Array, max_range: Array,
                            n_bits: int = 8, scale_grad: bool = False,
                            ch_axis: int = 0) -> Array:
    """Per-channel symmetric fake-quant with Pallas fwd/bwd.

    Matches ``linear_fake_quant(w, mn, mx, n_bits, sign=True, sym=True)`` and
    its jax.grad. ``min_range``/``max_range`` in WeightQuantizer's keepdims
    layout ([1,..,C,..,1] with C at ``ch_axis``).
    """
    return _w_fq_fwd_impl(w, min_range, max_range, n_bits, ch_axis)


def _w_panel(w, mn, mx, ch_axis):
    c = w.shape[ch_axis]
    w2d = _to_2d_channels_last(w, ch_axis)
    rows = w2d.shape[0]
    cp = _round_up(c, _LANE)
    br = min(_round_up(rows, _SUB), 512)
    rpad = _round_up(rows, br)
    w2d = jnp.pad(w2d, ((0, rpad - rows), (0, cp - c)))
    rng = jnp.stack([
        jnp.pad(mn.reshape(-1).astype(jnp.float32), (0, cp - c), constant_values=-1.0),
        jnp.pad(mx.reshape(-1).astype(jnp.float32), (0, cp - c), constant_values=1.0),
    ])
    return w2d, rng, rows, c, cp, br, rpad


def _w_fq_fwd_impl(w, mn, mx, n_bits, ch_axis):
    w2d, rng, rows, c, cp, br, rpad = _w_panel(w, mn, mx, ch_axis)
    out = pl.pallas_call(
        functools.partial(_w_fwd_kernel, n_bits=n_bits),
        grid=(rpad // br,),
        in_specs=[
            pl.BlockSpec((br, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, cp), w.dtype),
    )(w2d, rng)
    return _from_2d_channels_last(out[:rows, :c], w.shape, ch_axis)


def _w_scale_factor(c: int, n_bits: int, scale_grad: bool) -> float:
    if not scale_grad:
        return 1.0
    # reference symmetric branch: 1/sqrt(Qmax_signed * n_channels),
    # qat_quant.py:131-135 (signed Qmax regardless of sign)
    import math

    return 1.0 / math.sqrt((2 ** (n_bits - 1) - 1) * c)


def _w_bwd_impl(w, mn, mx, g, n_bits, scale_grad, ch_axis):
    """Shared by the standalone weight VJP and the fused dense backward."""
    w2d, rng, rows, c, cp, br, rpad = _w_panel(w, mn, mx, ch_axis)
    g2d = _to_2d_channels_last(g.astype(w.dtype), ch_axis)
    g2d = jnp.pad(g2d, ((0, rpad - rows), (0, cp - c)))
    grid = rpad // br
    dw2d, partials = pl.pallas_call(
        functools.partial(_w_bwd_kernel, n_bits=n_bits),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, cp), w.dtype),
            jax.ShapeDtypeStruct((grid, cp), jnp.float32),
        ],
    )(w2d, g2d, rng)
    dw = _from_2d_channels_last(dw2d[:rows, :c], w.shape, ch_axis)
    ddelta = jnp.sum(partials, axis=0)[:c]
    s = _w_scale_factor(c, n_bits, scale_grad)
    q = 2**n_bits - 1
    dmax = (s * 2.0 / q) * ddelta
    amn = jnp.abs(mn.reshape(-1))
    amx = jnp.abs(mx.reshape(-1))
    # maximum(|mn|, |mx|) VJP: winner takes the grad, 0.5 each at a tie
    wmn = jnp.where(amn > amx, 1.0, jnp.where(amn == amx, 0.5, 0.0)) * jnp.sign(mn.reshape(-1))
    wmx = jnp.where(amx > amn, 1.0, jnp.where(amn == amx, 0.5, 0.0)) * jnp.sign(mx.reshape(-1))
    dmn = (dmax * wmn).reshape(mn.shape).astype(mn.dtype)
    dmx = (dmax * wmx).reshape(mx.shape).astype(mx.dtype)
    return dw, dmn, dmx


def _w_fq_fwd(w, mn, mx, n_bits, scale_grad, ch_axis):
    return _w_fq_fwd_impl(w, mn, mx, n_bits, ch_axis), (w, mn, mx)


def _w_fq_bwd(n_bits, scale_grad, ch_axis, res, g):
    w, mn, mx = res
    return _w_bwd_impl(w, mn, mx, g, n_bits, scale_grad, ch_axis)


weight_fake_quant_train.defvjp(_w_fq_fwd, _w_fq_bwd)


# ---------------------------------------------------------------------------
# Fused QAT dense: act_fq(x @ weight_fq(w) + b) with rematerializing backward
# ---------------------------------------------------------------------------


def _qd_fwd_kernel(x_ref, w_ref, b_ref, wrng_ref, arng_ref, y_ref,
                   *, w_bits: int, a_bits: int, act_quant: bool):
    qw = 2**w_bits - 1
    qmin = -(2 ** (w_bits - 1))
    qmax = 2 ** (w_bits - 1) - 1
    max_abs = jnp.maximum(jnp.abs(wrng_ref[0, :]), jnp.abs(wrng_ref[1, :]))
    dw = 2.0 * max_abs / qw
    wq = dw * jnp.clip(jnp.round(w_ref[:] / dw), qmin, qmax)
    acc = jnp.dot(x_ref[:], wq, preferred_element_type=jnp.float32) + b_ref[0, :]
    if act_quant:
        qa = 2**a_bits - 1
        mn = arng_ref[0, 0]
        da = (arng_ref[0, 1] - mn) / qa
        acc = da * jnp.clip(jnp.round((acc - mn) / da), 0, qa) + mn
    y_ref[:] = acc


def _qd_bwd_mask_kernel(x_ref, w_ref, b_ref, g_ref, wrng_ref, arng_ref,
                        gm_ref, p_ref, db_ref, *, w_bits: int, a_bits: int,
                        act_quant: bool):
    """Recompute wq and the pre-activation, apply the act-quant STE mask.

    The act-range partial block is indexed (i, 0): the same block is
    revisited for every j (innermost, sequential on TPU), so accumulate."""
    j = pl.program_id(1)
    qw = 2**w_bits - 1
    qmin = -(2 ** (w_bits - 1))
    qmax = 2 ** (w_bits - 1) - 1
    max_abs = jnp.maximum(jnp.abs(wrng_ref[0, :]), jnp.abs(wrng_ref[1, :]))
    dw = 2.0 * max_abs / qw
    wq = dw * jnp.clip(jnp.round(w_ref[:] / dw), qmin, qmax)
    acc = jnp.dot(x_ref[:], wq, preferred_element_type=jnp.float32) + b_ref[0, :]
    g = g_ref[:]

    @pl.when(j == 0)
    def _init():
        p_ref[:, :] = jnp.zeros_like(p_ref)

    if act_quant:
        qa = 2**a_bits - 1
        mn = arng_ref[0, 0]
        s = arng_ref[0, 2]
        da = (arng_ref[0, 1] - mn) / qa
        u = (acc - mn) / da
        X = jnp.round(u)
        C = jnp.clip(X, 0, qa)
        m = _tie_mask(X, 0.0, float(qa), acc.dtype)
        t = (C - m * u) / qa
        gm = g * m
        p_ref[:, :] += jnp.stack(
            [jnp.sum(g * (1.0 - m - s * t)), jnp.sum(g * s * t)]
        ).reshape(1, 2)
    else:
        gm = g
    gm_ref[:] = gm
    db_ref[0, :] = jnp.sum(gm, axis=0)


def _qd_dx_kernel(gm_ref, w_ref, wrng_ref, dx_ref, *, w_bits: int):
    """dx tile = gm @ wq^T, recomputing wq from (w, ranges) in-kernel."""
    qw = 2**w_bits - 1
    qmin = -(2 ** (w_bits - 1))
    qmax = 2 ** (w_bits - 1) - 1
    max_abs = jnp.maximum(jnp.abs(wrng_ref[0, :]), jnp.abs(wrng_ref[1, :]))
    dw = 2.0 * max_abs / qw
    wq = dw * jnp.clip(jnp.round(w_ref[:] / dw), qmin, qmax)
    dx_ref[:] = lax.dot_general(gm_ref[:], wq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)


def _qd_dwq_kernel(x_ref, gm_ref, dwq_ref):
    """dwq tile accumulated over the M grid axis (innermost, sequential)."""
    mi = pl.program_id(2)

    @pl.when(mi == 0)
    def _init():
        dwq_ref[:] = jnp.zeros_like(dwq_ref)

    dwq_ref[:] += lax.dot_general(x_ref[:], gm_ref[:], (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def qat_dense(x: Array, w: Array, b: Array, w_mn: Array, w_mx: Array,
              a_mn: Array, a_mx: Array, w_bits: int = 8, a_bits: int = 8,
              act_quant: bool = True, w_scale_grad: bool = False,
              a_scale_grad: bool = False) -> Array:
    """Fused QAT dense: ``act_fq(x @ weight_fq(w) + b)`` (QDense semantics,
    qat_layers.py:521-541) as one Pallas kernel forward and a four-kernel
    rematerializing backward. x: [M, K]; w: [K, N] (per-out-channel ranges,
    ch_axis=1); b: [N]; act ranges per-tensor. Returns [M, N] f32.
    """
    return _qd_fwd_impl(x, w, b, w_mn, w_mx, a_mn, a_mx, w_bits, a_bits, act_quant)


def _qd_tiles(m, k, n):
    tm = min(_round_up(m, _SUB), 256)
    tn = min(_round_up(n, _LANE), 256)
    tk = min(_round_up(k, _LANE), 256)
    return tm, tn, tk


def _qd_pads(x, w, b, w_mn, w_mx):
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    tm, tn, tk = _qd_tiles(m, k, n)
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)
    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    bp = jnp.pad(b.reshape(1, -1).astype(jnp.float32), ((0, 0), (0, np_ - n)))
    wrng = jnp.stack([
        jnp.pad(w_mn.reshape(-1).astype(jnp.float32), (0, np_ - n), constant_values=-1.0),
        jnp.pad(w_mx.reshape(-1).astype(jnp.float32), (0, np_ - n), constant_values=1.0),
    ])
    return xp, wp, bp, wrng, (m, k, n, mp, kp, np_, tm, tn, tk)


def _qd_fwd_impl(x, w, b, w_mn, w_mx, a_mn, a_mx, w_bits, a_bits, act_quant):
    xp, wp, bp, wrng, dims = _qd_pads(x, w, b, w_mn, w_mx)
    m, k, n, mp, kp, np_, tm, tn, tk = dims
    arng = jnp.stack([a_mn.reshape(()), a_mx.reshape(())]).astype(jnp.float32).reshape(1, 2)
    out = pl.pallas_call(
        functools.partial(_qd_fwd_kernel, w_bits=w_bits, a_bits=a_bits, act_quant=act_quant),
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_),
            transcendentals=0,
        ),
    )(xp, wp, bp, wrng, arng)
    return out[:m, :n]


def _qd_fwd(x, w, b, w_mn, w_mx, a_mn, a_mx, w_bits, a_bits, act_quant,
            w_scale_grad, a_scale_grad):
    y = _qd_fwd_impl(x, w, b, w_mn, w_mx, a_mn, a_mx, w_bits, a_bits, act_quant)
    return y, (x, w, b, w_mn, w_mx, a_mn, a_mx)


def _qd_bwd(w_bits, a_bits, act_quant, w_scale_grad, a_scale_grad, res, g):
    x, w, b, w_mn, w_mx, a_mn, a_mx = res
    xp, wp, bp, wrng, dims = _qd_pads(x, w, b, w_mn, w_mx)
    m, k, n, mp, kp, np_, tm, tn, tk = dims
    gp = jnp.pad(g.astype(jnp.float32), ((0, mp - m), (0, np_ - n)))
    # uniform act scale_grad uses n_channels = last dim of the activation = N
    import math

    s_a = 1.0 / math.sqrt((2**a_bits - 1) * n) if a_scale_grad else 1.0
    arng = jnp.stack([a_mn.reshape(()), a_mx.reshape(()), jnp.float32(s_a)]).astype(jnp.float32).reshape(1, 3)

    # 1) act-quant STE mask + act-range partials + bias grad (recompute acc)
    gm, act_p, db_p = pl.pallas_call(
        functools.partial(_qd_bwd_mask_kernel, w_bits=w_bits, a_bits=a_bits, act_quant=act_quant),
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, np_), jnp.float32),
            jax.ShapeDtypeStruct((mp // tm, 2), jnp.float32),
            jax.ShapeDtypeStruct((mp // tm, np_), jnp.float32),
        ],
    )(xp, wp, bp, gp, wrng, arng)
    dmn_a = jnp.sum(act_p[:, 0])
    dmx_a = jnp.sum(act_p[:, 1])
    db = jnp.sum(db_p, axis=0)[:n]

    # 2) dx = gm @ wq^T
    dx = pl.pallas_call(
        functools.partial(_qd_dx_kernel, w_bits=w_bits),
        grid=(mp // tm, kp // tk),
        in_specs=[
            pl.BlockSpec((tm, np_), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, np_), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.float32),
    )(gm, wp, wrng)[:m, :k]

    # 3) dwq = x^T @ gm (accumulated over the M axis, innermost grid dim)
    dwq = pl.pallas_call(
        _qd_dwq_kernel,
        grid=(kp // tk, np_ // tn, mp // tm),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, mi: (mi, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j, mi: (mi, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tn), lambda i, j, mi: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, np_), jnp.float32),
    )(xp, gm)[:k, :n]

    # 4) route dwq through the weight fake-quant STE (shared Pallas bwd)
    dw, dwmn, dwmx = _w_bwd_impl(w, w_mn, w_mx, dwq, w_bits, w_scale_grad, ch_axis=1)

    dx = dx.astype(x.dtype)
    db = db.reshape(b.shape).astype(b.dtype)
    dmn_a = jnp.asarray(dmn_a).reshape(a_mn.shape).astype(a_mn.dtype)
    dmx_a = jnp.asarray(dmx_a).reshape(a_mx.shape).astype(a_mx.dtype)
    return dx, dw, db, dwmn, dwmx, dmn_a, dmx_a


qat_dense.defvjp(_qd_fwd, _qd_bwd)
