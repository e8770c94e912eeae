"""Pallas TPU kernels for the fake-quant hot path (serving/inference).

Three kernels per SURVEY §7's fusion plan:

* :func:`fake_quant_pallas` — tiled elementwise linear fake-quant: one VMEM
  pass computing round/clip/dequant on the uniform (asymmetric) grid.
* :func:`qmatmul_pallas` — fused fake-quant matmul: per-out-channel
  symmetric weight quant-dequant + MXU matmul + per-tensor activation
  fake-quant epilogue in one kernel, so the weight grid never round-trips
  to HBM and the activation grid fuses into the matmul's result tile.
* :func:`int8_matmul_requant_pallas` — the serving engine's hot op: TRUE
  int8 MXU matmul (s8 x s8 -> s32) + per-channel dequant + bias/PReLU +
  requantize to the next layer's 8-bit grid, emitting int8 directly. The
  f32 intermediate never touches HBM: inputs and outputs are 1 byte/elem,
  cutting activation bandwidth 4x vs the f32 fake-quant path on top of the
  int8 MXU's 2x-over-bf16 FLOP rate.

These are forward-only (inference/serving) kernels; QAT training keeps the
XLA path where learned-range gradients flow. Numerics match
fqss_tpu.quant.fake_quant.linear_fake_quant exactly (same formulas,
reference: quantization/qat/qat_quant.py:125-147).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Elementwise fake-quant
# ---------------------------------------------------------------------------


def _fq_kernel(x_ref, rng_ref, o_ref, *, n_bits: int):
    qmax = 2**n_bits - 1
    mn = rng_ref[0, 0]
    mx = rng_ref[0, 1]
    delta = (mx - mn) / qmax
    X = jnp.round((x_ref[:] - mn) / delta)
    o_ref[:] = delta * jnp.clip(X, 0, qmax) + mn


@functools.partial(jax.jit, static_argnames=("n_bits",))
def fake_quant_pallas(x: Array, min_range: Array, max_range: Array, n_bits: int = 8) -> Array:
    """Uniform (asymmetric) fake-quant of a 2D+ tensor, tiled through VMEM."""
    shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    lane = 128
    sub = 8
    tile = sub * lane
    padded = _round_up(n, tile)
    flat = jnp.pad(flat, (0, padded - n)).reshape(padded // lane, lane)
    rows = flat.shape[0]
    block_rows = min(rows, 512)
    # pad rows to a multiple of block_rows
    rpad = _round_up(rows, block_rows)
    if rpad != rows:
        flat = jnp.pad(flat, ((0, rpad - rows), (0, 0)))
    ranges = jnp.stack([min_range.reshape(()), max_range.reshape(())]).reshape(1, 2)
    out = pl.pallas_call(
        functools.partial(_fq_kernel, n_bits=n_bits),
        grid=(rpad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, lane), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, lane), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, lane), x.dtype),
    )(flat, ranges)
    return out.reshape(-1)[:n].reshape(shape)


# ---------------------------------------------------------------------------
# Fused fake-quant matmul (weight dequant + MXU matmul + act-quant epilogue)
# ---------------------------------------------------------------------------


def _qmm_kernel(x_ref, w_ref, wrng_ref, arng_ref, o_ref, *, w_bits: int, a_bits: int, act_quant: bool):
    # per-out-channel symmetric weight grid (qat_quant.py:127-135)
    w = w_ref[:]
    mn = wrng_ref[0, :]
    mx = wrng_ref[1, :]
    max_abs = jnp.maximum(jnp.abs(mn), jnp.abs(mx))
    delta_w = 2.0 * max_abs / (2**w_bits - 1)
    qmin = -(2 ** (w_bits - 1))
    qmax = 2 ** (w_bits - 1) - 1
    wq = delta_w * jnp.clip(jnp.round(w / delta_w), qmin, qmax)

    acc = jnp.dot(x_ref[:], wq, preferred_element_type=jnp.float32)

    if act_quant:
        amn = arng_ref[0, 0]
        amx = arng_ref[0, 1]
        aqmax = 2**a_bits - 1
        delta_a = (amx - amn) / aqmax
        A = jnp.round((acc - amn) / delta_a)
        acc = delta_a * jnp.clip(A, 0, aqmax) + amn
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("w_bits", "a_bits", "act_quant", "tm", "tn"))
def qmatmul_pallas(
    x: Array,
    w: Array,
    w_min: Array,
    w_max: Array,
    act_min: Array | None = None,
    act_max: Array | None = None,
    w_bits: int = 8,
    a_bits: int = 8,
    act_quant: bool = True,
    tm: int = 256,
    tn: int = 256,
) -> Array:
    """y = act_fq(x @ weight_fq(w)). x: [M, K], w: [K, N], ranges per out-col."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, 128)
    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    wrng = jnp.stack([
        jnp.pad(w_min.reshape(-1), (0, np_ - n), constant_values=-1.0),
        jnp.pad(w_max.reshape(-1), (0, np_ - n), constant_values=1.0),
    ])
    if act_min is None:
        act_min = jnp.zeros(())
        act_max = jnp.ones(())
    arng = jnp.stack([act_min.reshape(()), act_max.reshape(())]).reshape(1, 2)

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, w_bits=w_bits, a_bits=a_bits, act_quant=act_quant),
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
    )(xp, wp, wrng, arng)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Int8 serving matmul: s8 x s8 -> s32 dot + dequant + PReLU + requant -> s8
# ---------------------------------------------------------------------------


def _qmm8_kernel(x_ref, w_ref, sc_ref, corr_ref, eps_ref, o_ref):
    # int8 x int8 -> int32 on the MXU
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    v = acc * sc_ref[0, :] + corr_ref[0, :]
    alpha = eps_ref[0, 0]  # PReLU slope; 1.0 = identity, 0.0 = ReLU
    v = jnp.where(v >= 0, v, alpha * v)
    delta = eps_ref[0, 1]
    mn = eps_ref[0, 2]
    X = jnp.clip(jnp.round((v - mn) / delta), 0.0, 255.0)
    o_ref[:] = (X - 128.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def int8_matmul_requant_pallas(
    xs: Array,
    w_int: Array,
    scale: Array,
    corr: Array,
    alpha: Array,
    out_delta: Array,
    out_mn: Array,
    tm: int = 1024,
    tn: int = 256,
    interpret: bool = False,
) -> Array:
    """out_s8 = requant(prelu(dot_s32(xs, w_int) * scale + corr)).

    xs: [M, K] int8 (zero-point-shifted activations, Xs = X - 128);
    w_int: [K, N] int8; scale/corr: [N] f32 per-out-channel dequant
    (delta_x * s_w and the zero-point/bias correction); alpha: PReLU slope
    scalar (1.0 disables); (out_delta, out_mn): the next grid. Returns
    [M, N] int8 in the same shifted convention. Semantics match the
    serving engine's XLA path (serve/convtasnet_int8.py _int1x1 + _requant)
    bit-for-bit.

    Default tiles are the measured argmin of the r5 sweep at the ConvTasNet
    TCN 1x1 serving shape (M=384k, K=N=512; scripts/bench_int8_matmul.py):
    tm=1024/tn=256 runs 26.8 ms = 7.5 T/s vs XLA int8+separate-requant
    29.4 ms and XLA bf16 matmul-alone 30.4 ms. The device is dtype-flat
    (~7 T/s effective at this shape for f32/bf16/int8 alike), so ~10% per
    site is the whole int8 headroom here — the roofline that explains why
    the int8 engines trail the plain paths end-to-end on THIS chip (their
    deficit is boundary layout/activation-grid work, not the matmul), and
    why `--engine auto` (serve/autopath.py) never selects them.
    """
    m, k = xs.shape
    k2, n = w_int.shape
    assert k == k2
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, 128)
    xp = jnp.pad(xs, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w_int, ((0, kp - k), (0, np_ - n)))
    scp = jnp.pad(scale.reshape(-1).astype(jnp.float32), (0, np_ - n), constant_values=1.0).reshape(1, np_)
    cop = jnp.pad(corr.reshape(-1).astype(jnp.float32), (0, np_ - n)).reshape(1, np_)
    eps = jnp.stack([
        jnp.asarray(alpha, jnp.float32).reshape(()),
        jnp.asarray(out_delta, jnp.float32).reshape(()),
        jnp.asarray(out_mn, jnp.float32).reshape(()),
    ]).reshape(1, 3)
    out = pl.pallas_call(
        _qmm8_kernel,
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, scp, cop, eps)
    return out[:m, :n]
