"""Quantized LSTM layers on lax.scan.

TPU-native redesign of the reference's three LSTM quantization flavors
(reference: quantization/qat/qat_layers.py:571-862):

* ``mode='fused'``  — LSTMQ: per-channel fake-quantized weight matrices, the
  recurrence itself in float, output fake-quantized. The input projection
  ``x @ W_ih`` for ALL timesteps is hoisted out of the scan into one big
  MXU matmul; only the serial ``h @ W_hh`` stays in the scan body.
* ``mode='dynamic'`` — LSTMQ_dynamic: 12 dynamic (per-call min/max x0.99)
  quantizer sites per direction on the cell's internal tensors, evaluated
  per timestep inside the scan (stateless, jit-exact).
* ``mode='static'``  — LSTMQ_static: the same 12 sites with learned static
  ranges. Ranges are read once, threaded through the scan as constants; the
  observer phase EMA-updates them per timestep through the scan carry,
  faithful to the reference's per-call n_iter advance (a T-steps-per-batch
  observer schedule).

Gate order is torch's (i, f, g, o). Input/output: [B, T, C] (batch-first).
Bidirectional output is [fwd ; bwd] concatenated on features.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from fqss_tpu.nn.layers import make_act_quantizer, make_weight_quantizer, torch_uniform_init
from fqss_tpu.quant.fake_quant import linear_fake_quant
from fqss_tpu.quant.quantizers import QPARAMS, QSTATS, dynamic_act_quant
from fqss_tpu.quant.spec import FLOAT, QuantSpec

Array = jax.Array

# the reference's dynamic/static quantizer sites (qat_layers.py:631-655)
_SITES = ("ih", "hh", "add0", "sig0", "sig1", "tanh0", "sig2", "mul0", "mul1", "add1", "tanh1", "mul2")


def _cell_step(h, c, ih_t, hh, quant):
    """One LSTM cell step with optional per-site fake quant.

    ih_t: precomputed x_t @ W_ih + b_ih (+ b_hh folded); hh: h @ W_hh.
    quant: site -> fn or None.
    """

    def q(site, v):
        fn = quant.get(site)
        return fn(v) if fn is not None else v

    gates = q("add0", q("ih", ih_t) + q("hh", hh))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = q("sig0", jax.nn.sigmoid(i))
    f = q("sig1", jax.nn.sigmoid(f))
    g = q("tanh0", jnp.tanh(g))
    o = q("sig2", jax.nn.sigmoid(o))
    c = q("add1", q("mul0", f * c) + q("mul1", i * g))
    h = q("mul2", o * q("tanh1", jnp.tanh(c)))
    return h, c


class _LSTMDirection(nn.Module):
    """One direction of the quantized LSTM recurrence.

    With ``project_only=True`` the module creates the same parameters but
    returns ``(ih_all, w_hh)`` — the hoisted input projection (in scan
    order, i.e. already time-flipped for the reverse direction) and the
    fake-quantized recurrent weights — so QLSTM can batch both directions
    of a bidirectional LSTM into ONE recurrence (see QLSTM below).
    """

    hidden_size: int
    mode: str
    reverse: bool
    q: QuantSpec = FLOAT
    project_only: bool = False

    @nn.compact
    def __call__(self, x: Array):
        B, T, C = x.shape
        H = self.hidden_size
        import math

        bound = 1.0 / math.sqrt(H)
        w_ih = self.param("w_ih", torch_uniform_init(bound), (C, 4 * H))
        w_hh = self.param("w_hh", torch_uniform_init(bound), (H, 4 * H))
        b_ih = self.param("b_ih", torch_uniform_init(bound), (4 * H,))
        b_hh = self.param("b_hh", torch_uniform_init(bound), (4 * H,))

        wq_ih = make_weight_quantizer(self.q, (C, 4 * H), ch_axis=1, name="wq_ih")
        wq_hh = make_weight_quantizer(self.q, (H, 4 * H), ch_axis=1, name="wq_hh")
        if wq_ih is not None:
            w_ih = wq_ih(w_ih)
            w_hh = wq_hh(w_hh)

        xs = jnp.flip(x, axis=1) if self.reverse else x
        # Hoist the input projection out of the scan: one MXU matmul.
        from fqss_tpu.nn.layers import mxu_operands

        xsc, w_ih_c = mxu_operands(self.q, xs, w_ih)
        ih_all = jnp.einsum("btc,ch->bth", xsc, w_ih_c, preferred_element_type=jnp.float32) + b_ih + b_hh

        if self.project_only:
            return ih_all, w_hh

        quant_cfg = self.q.qat and self.q.act_quant and self.mode in ("dynamic", "static")
        if self.mode == "dynamic" and quant_cfg:
            dyn = partial(dynamic_act_quant, n_bits=self.q.act_n_bits)
            site_ranges = None
            quant = {s: dyn for s in _SITES}
        elif self.mode == "static" and quant_cfg:
            # Learned per-site ranges in qparams; EMA observer through the carry.
            site_min = self.variable(
                QPARAMS, "site_min", lambda: jnp.full((len(_SITES),), -0.5, jnp.float32)
            )
            site_max = self.variable(
                QPARAMS, "site_max", lambda: jnp.full((len(_SITES),), 0.5, jnp.float32)
            )
            n_iter = self.variable(QSTATS, "site_n_iter", lambda: jnp.zeros((), jnp.int32))
            site_ranges = (site_min, site_max, n_iter)
            quant = None  # built per-step inside the scan
        else:
            site_ranges = None
            quant = {}

        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), x.dtype)

        if self.mode == "static" and quant_cfg and not self.is_initializing():
            mn0 = site_min.value
            mx0 = site_max.value
            if not self.q.gradient_based:
                mn0, mx0 = jax.lax.stop_gradient(mn0), jax.lax.stop_gradient(mx0)
            observing = jnp.logical_and(
                jnp.asarray(self.q.observer), n_iter.value < 50
            )

            def step(carry, ih_t):
                h, c, mn, mx, cnt = carry
                obs = jnp.logical_and(observing, cnt < 50)
                new_stats = {}

                def make_q(site):
                    si = _SITES.index(site)

                    def fn(v):
                        vmin = jnp.min(jax.lax.stop_gradient(v))
                        vmax = jnp.max(jax.lax.stop_gradient(v))
                        new_stats[site] = (vmin, vmax)
                        y = linear_fake_quant(
                            v, mn[si], mx[si], self.q.act_n_bits, mn[si] < 0, False
                        )
                        return jnp.where(obs, v, y)

                    return fn

                qmap = {s: make_q(s) for s in _SITES}
                hh = h @ w_hh
                h, c = _cell_step(h, c, ih_t, hh, qmap)
                bmin = jnp.stack([new_stats[s][0] for s in _SITES])
                bmax = jnp.stack([new_stats[s][1] for s in _SITES])
                mn = jnp.where(obs, 0.9 * mn + 0.1 * bmin, mn)
                mx = jnp.where(obs, 0.9 * mx + 0.1 * bmax, mx)
                cnt = cnt + obs.astype(jnp.int32)
                return (h, c, mn, mx, cnt), h

            (hT, cT, mnT, mxT, cntT), hs = jax.lax.scan(
                step, (h0, c0, mn0, mx0, n_iter.value), jnp.swapaxes(ih_all, 0, 1)
            )
            if self.is_mutable_collection(QPARAMS):
                site_min.value = mnT
                site_max.value = mxT
                if self.is_mutable_collection(QSTATS):
                    n_iter.value = cntT
        elif self.q.pallas_lstm and not quant:
            # Fused/float recurrence through the Pallas kernel: time loop
            # in-kernel, h/c + W_hh resident in VMEM (ops/pallas_lstm.py).
            from fqss_tpu.ops.pallas_lstm import lstm_sequence

            # time-major kernel: returns [T, B, H], matching the scan
            # branches' layout ahead of the common axis swap below.
            hs = lstm_sequence(jnp.swapaxes(ih_all, 0, 1), w_hh)
        else:
            def step(carry, ih_t):
                h, c = carry
                hh = h @ w_hh
                h, c = _cell_step(h, c, ih_t, hh, quant or {})
                return (h, c), h

            (_, _), hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(ih_all, 0, 1))

        hs = jnp.swapaxes(hs, 0, 1)  # [B, T, H]
        return jnp.flip(hs, axis=1) if self.reverse else hs


class QLSTM(nn.Module):
    """Quantized (bi)LSTM -> output act-quant (qat_layers.py:571-613).

    ``fuse_bidir``: in fused/float mode the two directions of a
    bidirectional LSTM run as ONE ``lax.scan`` instead of two, with a
    leading direction axis on the carry and a batched per-step matmul —
    identical math term-for-term, same FLOPs, half the serial iteration
    count. Measured on the bench device it does NOT pay (full DPTNet
    forward 680 ms fused vs 598 ms per-direction vs 569 ms Pallas kernel,
    8 x 4 s): that device's scan cost is per-matmul-op, and the batched
    step matmul costs as much as two separate ones — so the default stays
    off and the Pallas recurrence kernel (``QuantSpec.pallas_lstm``)
    remains the fast DPTNet path. Kept as a tested equal-math alternative
    for hardware where loop overhead, not op dispatch, binds.
    Static/dynamic modes keep per-direction recurrences (their 12 quantizer
    sites are learned per direction and must see per-direction tensors), as
    does the Pallas kernel path (its in-kernel matmul has no batch dim).
    """

    hidden_size: int
    bidirectional: bool = True
    mode: str = "fused"  # 'fused' | 'static' | 'dynamic'
    q: QuantSpec = FLOAT
    fuse_bidir: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mode = self.mode if self.q.qat else "fused"
        H = self.hidden_size
        if self.bidirectional and self.fuse_bidir and mode == "fused" and not self.q.pallas_lstm:
            ih_f, w_f = _LSTMDirection(H, mode, reverse=False, q=self.q,
                                       project_only=True, name="fw")(x)
            ih_b, w_b = _LSTMDirection(H, mode, reverse=True, q=self.q,
                                       project_only=True, name="bw")(x)

            # Both directions in ONE scan with a leading direction axis:
            # per step a batched [2, B, H] x [2, H, 4H] matmul — the same
            # FLOPs as the two per-direction scans (no waste), half the
            # serial iteration count. (The Pallas kernel path keeps
            # per-direction calls: its in-kernel matmul has no batch dim.)
            ih_all = jnp.stack([jnp.swapaxes(ih_f, 0, 1), jnp.swapaxes(ih_b, 0, 1)], 1)
            wj = jnp.stack([w_f, w_b], 0)  # [2, H, 4H]
            B = x.shape[0]
            h0 = jnp.zeros((2, B, H), ih_all.dtype)
            c0 = jnp.zeros((2, B, H), ih_all.dtype)

            def step(carry, ih_t):
                h, c = carry
                gates = ih_t + jnp.einsum("dbh,dhg->dbg", h, wj)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            _, hs = jax.lax.scan(step, (h0, c0), ih_all)  # [T, 2, B, H]
            hs = jnp.moveaxis(hs, 2, 0)  # [B, T, 2, H]
            y = jnp.concatenate([hs[..., 0, :], jnp.flip(hs[..., 1, :], axis=1)], axis=-1)
        elif self.bidirectional and mode == "fused" and self.q.pallas_lstm:
            # Direction-fused Pallas recurrence: both directions of the
            # BiLSTM in ONE kernel launch (half the launches, two MXU
            # matmuls per grid step to pipeline) — ops/pallas_lstm.py
            # bilstm_sequence. Same parameters/names as the per-direction
            # path (fw/bw submodules), so checkpoints are interchangeable.
            ih_f, w_f = _LSTMDirection(H, mode, reverse=False, q=self.q,
                                       project_only=True, name="fw")(x)
            ih_b, w_b = _LSTMDirection(H, mode, reverse=True, q=self.q,
                                       project_only=True, name="bw")(x)
            from fqss_tpu.ops.pallas_lstm import bilstm_sequence

            hs_f, hs_b = bilstm_sequence(
                jnp.swapaxes(ih_f, 0, 1), jnp.swapaxes(ih_b, 0, 1), w_f, w_b
            )
            y = jnp.concatenate(
                [jnp.swapaxes(hs_f, 0, 1), jnp.flip(jnp.swapaxes(hs_b, 0, 1), axis=1)],
                axis=-1,
            )
        else:
            fwd = _LSTMDirection(H, mode, reverse=False, q=self.q, name="fw")(x)
            if self.bidirectional:
                bwd = _LSTMDirection(H, mode, reverse=True, q=self.q, name="bw")(x)
                y = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                y = fwd
        aq = make_act_quantizer(self.q)
        return aq(y) if aq is not None else y
