"""Learned fake-quantizer modules (flax) with functional observer state.

TPU-native redesign of the reference's mutable-``nn.Parameter`` observer
pattern (reference: quantization/qat/qat_quant.py:167-396). Quantizer state
lives in two flax collections:

* ``qparams`` — learned ranges (min/max) and mu. Trainable by optax when
  ``gradient_based=True`` *and* observer-writable: during the observer phase
  the forward pass EMA-updates them in place (collection marked mutable by
  the train step) exactly like the reference's ``.data`` writes
  (qat_quant.py:227-242, alpha=0.9, 50 observations).
* ``qstats`` — the per-quantizer observation counter.

Observer phase semantics (faithful to the reference):
* activation quantizers: first ``max_observations`` calls EMA-track batch
  min/max and return the input unquantized; afterwards they fake-quantize
  with the (now gradient-learned) ranges.
* weight quantizers: a one-shot observer captures per-channel amin/amax on
  the first call and returns the float weights once (qat_quant.py:372-377).

When the caller does not mark the collections mutable (pure eval), the
observer branch still returns the input unquantized but performs no state
writes — matching reference behavior where validation during the observer
window sees the float path.

The quantize math itself is the bit-faithful grid in
:mod:`fqss_tpu.quant.fake_quant`.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fqss_tpu.quant.fake_quant import linear_fake_quant, mulaw_fake_quant

Array = jax.Array

QPARAMS = "qparams"
QSTATS = "qstats"


class ActQuantizer(nn.Module):
    """Per-tensor learned activation fake-quantizer.

    ``kind='linear'`` matches GradientActivationFakeQuantize
    (qat_quant.py:206-242); ``kind='mulaw'`` matches
    GradientNlActivationFakeQuantize (qat_quant.py:167-203) including the
    learnable mu. ``gradient_based=False`` freezes the ranges for optax via
    a stop_gradient (the reference sets requires_grad=False).
    """

    n_bits: int = 8
    kind: str = "linear"  # 'linear' | 'mulaw'
    sym: bool = False
    gradient_based: bool = True
    scale_grad: bool = False
    observer: bool = True
    max_observations: int = 50
    alpha: float = 0.9
    # Route the quantize op through the custom-VJP Pallas kernel
    # (ops/pallas_qat.py). Identical values and gradients; fwd+bwd become
    # single-VMEM-pass TPU kernels. Linear/non-sym path only.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array | None, *, ranges_only: bool = False):
        min_range = self.variable(QPARAMS, "min_range", lambda: jnp.full((1,), -0.5, jnp.float32))
        max_range = self.variable(QPARAMS, "max_range", lambda: jnp.full((1,), 0.5, jnp.float32))
        if self.kind == "mulaw":
            mu = self.variable(QPARAMS, "mu", lambda: jnp.ones((1,), jnp.float32))
        n_iter = self.variable(QSTATS, "n_iter", lambda: jnp.zeros((), jnp.int32))

        if ranges_only:
            # Hand the learned ranges to a caller that fuses the quantize op
            # into its own kernel (ops/pallas_attention.py). No observer
            # update — fused callers run post-calibration by contract.
            mn, mx = min_range.value, max_range.value
            if not self.gradient_based:
                mn, mx = jax.lax.stop_gradient(mn), jax.lax.stop_gradient(mx)
            return mn, mx

        if self.is_initializing():
            return x

        mn, mx = min_range.value, max_range.value
        if not self.gradient_based:
            mn, mx = jax.lax.stop_gradient(mn), jax.lax.stop_gradient(mx)

        if self.observer:
            observing = n_iter.value < self.max_observations
            if self.is_mutable_collection(QPARAMS):
                xf = jax.lax.stop_gradient(x.astype(jnp.float32))
                batch_min = jnp.min(xf).reshape(1)
                batch_max = jnp.max(xf).reshape(1)
                new_min = self.alpha * min_range.value + (1.0 - self.alpha) * batch_min
                new_max = self.alpha * max_range.value + (1.0 - self.alpha) * batch_max
                min_range.value = jnp.where(observing, new_min, min_range.value)
                max_range.value = jnp.where(observing, new_max, max_range.value)
                if self.is_mutable_collection(QSTATS):
                    n_iter.value = n_iter.value + observing.astype(jnp.int32)
        else:
            observing = jnp.asarray(False)

        def _quantize(v: Array) -> Array:
            if self.kind == "mulaw":
                m = mu.value if self.gradient_based else jax.lax.stop_gradient(mu.value)
                return mulaw_fake_quant(v, mn, mx, m, self.n_bits, self.scale_grad)
            if self.use_pallas and not self.sym:
                # uniform branch ignores sign (faithful to the reference)
                from fqss_tpu.ops.pallas_qat import act_fake_quant_train

                return act_fake_quant_train(v, mn, mx, self.n_bits, self.scale_grad)
            sign = mn < 0
            return linear_fake_quant(v, mn, mx, self.n_bits, sign, self.sym, self.scale_grad)

        return jnp.where(observing, x, _quantize(x))


class MseActQuantizer(nn.Module):
    """Histogram/MSE-calibrated activation quantizer (qat_quant.py:245-326).

    On-device it accumulates a running histogram over a fixed value window
    during the observer phase; the host-side grid search that picks the MSE
    optimal (min, max) lives in :mod:`fqss_tpu.quant.calibration` and writes
    the result back into ``qparams``. After calibration this quantizes like
    the linear ActQuantizer.
    """

    n_bits: int = 8
    sym: bool = False
    gradient_based: bool = True
    scale_grad: bool = False
    observer: bool = True
    max_observations: int = 50
    hist_n_bins: int = 512

    @nn.compact
    def __call__(self, x: Array) -> Array:
        min_range = self.variable(QPARAMS, "min_range", lambda: jnp.full((1,), -0.5, jnp.float32))
        max_range = self.variable(QPARAMS, "max_range", lambda: jnp.full((1,), 0.5, jnp.float32))
        n_iter = self.variable(QSTATS, "n_iter", lambda: jnp.zeros((), jnp.int32))
        # Running value window + histogram counts (device-side observer state).
        hist = self.variable(QSTATS, "hist", lambda: jnp.zeros((self.hist_n_bins,), jnp.float32))
        val_min = self.variable(QSTATS, "val_min", lambda: jnp.zeros((), jnp.float32))
        val_max = self.variable(QSTATS, "val_max", lambda: jnp.zeros((), jnp.float32))
        calibrated = self.variable(QSTATS, "calibrated", lambda: jnp.zeros((), jnp.bool_))

        if self.is_initializing():
            return x

        if self.observer and self.is_mutable_collection(QSTATS):
            observing = jnp.logical_and(n_iter.value < self.max_observations, ~calibrated.value)
            xf = jax.lax.stop_gradient(x.astype(jnp.float32)).reshape(-1)
            bmin, bmax = jnp.min(xf), jnp.max(xf)
            first = n_iter.value == 0
            nmin = jnp.where(first, bmin, jnp.minimum(val_min.value, bmin))
            nmax = jnp.where(first, bmax, jnp.maximum(val_max.value, bmax))
            # Histogram over the (expanding) window. On window growth the old
            # counts are re-binned by linear interpolation of the CDF, the
            # device analog of the reference's merge_hist (qat_quant.py:268-289).
            old_edges = jnp.linspace(val_min.value, val_max.value, self.hist_n_bins + 1)
            new_edges = jnp.linspace(nmin, nmax, self.hist_n_bins + 1)
            old_cdf = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(hist.value)])
            rebinned_cdf = jnp.interp(new_edges, old_edges, old_cdf)
            rebinned = jnp.diff(rebinned_cdf)
            width = (nmax - nmin) / self.hist_n_bins
            idx = jnp.clip(((xf - nmin) / jnp.where(width > 0, width, 1.0)).astype(jnp.int32), 0, self.hist_n_bins - 1)
            batch_hist = jnp.zeros((self.hist_n_bins,), jnp.float32).at[idx].add(1.0)
            hist.value = jnp.where(observing, rebinned + batch_hist, hist.value)
            val_min.value = jnp.where(observing, nmin, val_min.value)
            val_max.value = jnp.where(observing, nmax, val_max.value)
            n_iter.value = n_iter.value + observing.astype(jnp.int32)

        mn, mx = min_range.value, max_range.value
        if not self.gradient_based:
            mn, mx = jax.lax.stop_gradient(mn), jax.lax.stop_gradient(mx)
        sign = mn < 0
        y = linear_fake_quant(x, mn, mx, self.n_bits, sign, self.sym, self.scale_grad)
        use_float = jnp.logical_and(jnp.asarray(self.observer), ~calibrated.value)
        return jnp.where(use_float, x, y)


def dynamic_act_quant(x: Array, n_bits: int = 8, sym: bool = False, factor: float = 0.99) -> Array:
    """Stateless dynamic fake-quantizer (qat_quant.py:329-347).

    Per-call min/max shrunk by ``factor`` to mitigate outliers; identity when
    the tensor is constant. Pure function — safe inside lax.scan (LSTM cells).
    """
    min_range = jnp.min(x)
    max_range = jnp.max(x)
    sign = min_range < 0
    y = linear_fake_quant(x, factor * min_range, factor * max_range, n_bits, sign, sym)
    return jnp.where(min_range == max_range, x, y)


class WeightQuantizer(nn.Module):
    """Per-channel symmetric learned weight fake-quantizer.

    Matches GradientWeightFakeQuantize (qat_quant.py:350-381): ranges are
    per-out-channel (``ch_axis``), captured once from the float weights by a
    one-shot observer, then learned by gradient. ``weight_shape`` must be the
    shape of the weight this quantizer is applied to.
    """

    weight_shape: Sequence[int]
    n_bits: int = 8
    sym: bool = True
    ch_axis: int = 0
    gradient_based: bool = True
    scale_grad: bool = False
    observer: bool = True
    # Custom-VJP Pallas kernel routing (ops/pallas_qat.py); sym path only.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, w: Array) -> Array:
        init_shape = [1] * len(self.weight_shape)
        init_shape[self.ch_axis] = self.weight_shape[self.ch_axis]
        reduce_axes = tuple(i for i in range(len(self.weight_shape)) if i != self.ch_axis)
        min_range = self.variable(QPARAMS, "min_range", lambda: jnp.full(init_shape, -0.5, jnp.float32))
        max_range = self.variable(QPARAMS, "max_range", lambda: jnp.full(init_shape, 0.5, jnp.float32))
        observed = self.variable(QSTATS, "observed", lambda: jnp.zeros((), jnp.bool_))

        if self.is_initializing():
            return w

        if self.observer and self.is_mutable_collection(QPARAMS):
            observing = ~observed.value
            wf = jax.lax.stop_gradient(w.astype(jnp.float32))
            bmin = jnp.min(wf, axis=reduce_axes, keepdims=True)
            bmax = jnp.max(wf, axis=reduce_axes, keepdims=True)
            min_range.value = jnp.where(observing, bmin, min_range.value)
            max_range.value = jnp.where(observing, bmax, max_range.value)
            if self.is_mutable_collection(QSTATS):
                observed.value = jnp.ones((), jnp.bool_)
        elif self.observer:
            observing = ~observed.value
        else:
            observing = jnp.asarray(False)

        mn, mx = min_range.value, max_range.value
        if not self.gradient_based:
            mn, mx = jax.lax.stop_gradient(mn), jax.lax.stop_gradient(mx)
        if self.use_pallas and self.sym:
            from fqss_tpu.ops.pallas_qat import weight_fake_quant_train

            y = weight_fake_quant_train(w, mn, mx, self.n_bits, self.scale_grad, self.ch_axis)
        else:
            y = linear_fake_quant(w, mn, mx, self.n_bits, True, self.sym, self.scale_grad)
        # One-shot observer: the observing call itself returns float weights
        # (reference returns x on the observation step, qat_quant.py:373-377).
        return jnp.where(observing, w, y)
