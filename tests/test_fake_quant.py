"""Bit-faithfulness tests for the fake-quant grid.

Checks the pure-function quant core against (a) closed-form grids and
(b) the reference's torch semantics (torch runs on CPU here as a test oracle
only — the compute path is pure JAX).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from fqss_tpu.quant import (
    clip_ste,
    fix_range_to_include_zero,
    floor_ste,
    grad_scale,
    grad_sign,
    linear_fake_quant,
    mulaw_fake_quant,
    round_ste,
    splitter_quantize,
    torch_fake_quantize_per_channel,
    torch_fake_quantize_per_tensor,
)


# ---------------------------------------------------------------------------
# Reference math in torch (transcribed from qat_quant.py semantics) as oracle.
# ---------------------------------------------------------------------------


def torch_linear_quantize(x, min_range, max_range, n_bits, sign=True, sym=False):
    import math

    if sym:
        qmin = -(2 ** (n_bits - 1)) if sign else 0
        qmax = 2 ** (n_bits - 1) - 1 if sign else 2**n_bits - 1
        max_abs_range = torch.maximum(torch.abs(min_range), torch.abs(max_range))
        delta = 2 * max_abs_range / (2**n_bits - 1)
        X = torch.round(x / delta)
        return delta * torch.clip(X, qmin, qmax)
    else:
        delta = (max_range - min_range) / (2**n_bits - 1)
        zp = min_range
        X = torch.round((x - zp) / delta)
        return delta * torch.clip(X, 0, 2**n_bits - 1) + zp


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_round_ste_matches_torch_banker_rounding():
    # Exact halves must round to even, like torch.round.
    x = jnp.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999, -0.50001])
    got = round_ste(x)
    want = torch.round(torch.tensor(np.asarray(x))).numpy()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_ste_gradients():
    g = jax.grad(lambda x: round_ste(x).sum())(jnp.array([0.3, 1.7]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])
    g = jax.grad(lambda x: floor_ste(x).sum())(jnp.array([0.3, 1.7]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])
    g = jax.grad(lambda x: clip_ste(x, -1.0, 1.0).sum())(jnp.array([-5.0, 0.0, 5.0]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 1.0])
    g = jax.grad(lambda x: grad_scale(x, 0.25).sum())(jnp.array([3.0]))
    np.testing.assert_allclose(np.asarray(g), [0.25])
    # grad_scale forward is identity
    np.testing.assert_allclose(np.asarray(grad_scale(jnp.array([3.0]), 0.25)), [3.0])
    # grad_sign forward is sign, grad is `scale`
    np.testing.assert_array_equal(np.asarray(grad_sign(jnp.array([-2.0, 3.0]))), [-1.0, 1.0])
    g = jax.grad(lambda x: grad_sign(x, 0.5).sum())(jnp.array([2.0]))
    np.testing.assert_allclose(np.asarray(g), [0.5])


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("n_bits", [4, 8])
def test_linear_fake_quant_matches_reference_semantics(rng, sym, n_bits):
    x = rng.standard_normal((64, 33)).astype(np.float32)
    mn = np.float32(-0.8)
    mx = np.float32(1.3)
    got = linear_fake_quant(jnp.asarray(x), jnp.float32(mn), jnp.float32(mx), n_bits, True, sym)
    want = torch_linear_quantize(torch.tensor(x), torch.tensor(mn), torch.tensor(mx), n_bits, True, sym)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=0, atol=1e-6)


def test_linear_fake_quant_per_channel(rng):
    # Per-channel symmetric weight grid, channel axis 0 with keepdims ranges.
    w = rng.standard_normal((16, 8, 3)).astype(np.float32)
    mn = w.min(axis=(1, 2), keepdims=True)
    mx = w.max(axis=(1, 2), keepdims=True)
    got = np.asarray(linear_fake_quant(jnp.asarray(w), jnp.asarray(mn), jnp.asarray(mx), 8, True, True))
    want = torch_linear_quantize(torch.tensor(w), torch.tensor(mn), torch.tensor(mx), 8, True, True).numpy()
    # XLA's f32 division can differ from torch's by one ULP, which flips the
    # rounding decision exactly at .5 ties. Allow one-LSB differences there only.
    delta = 2 * np.maximum(np.abs(mn), np.abs(mx)) / 255
    mismatch = np.abs(got - want) > 1e-6
    if mismatch.any():
        q = w.astype(np.float64) / delta.astype(np.float64)
        frac = np.abs(np.abs(q - np.floor(q)) - 0.5)
        assert (frac[mismatch] < 1e-4).all(), "grid mismatch away from rounding tie"
        assert (np.abs(got - want)[mismatch] <= delta.repeat(8, 1).repeat(3, 2)[mismatch] * (1 + 1e-5)).all()


def test_linear_fake_quant_output_on_grid():
    # Outputs must land exactly on the integer grid.
    x = jnp.linspace(-2.0, 2.0, 1001)
    y = linear_fake_quant(x, jnp.float32(-1.0), jnp.float32(1.0), 8, True, True)
    delta = 2.0 / 255.0
    q = np.asarray(y) / delta
    np.testing.assert_allclose(q, np.round(q), atol=1e-4)
    assert np.asarray(y).max() <= 127 * delta + 1e-7
    assert np.asarray(y).min() >= -128 * delta - 1e-7


def test_mulaw_fake_quant_matches_reference_semantics(rng):
    x = rng.uniform(-1.5, 1.5, size=(32, 17)).astype(np.float32)
    mn, mx, mu = np.float32(-1.2), np.float32(0.9), np.float32(4.0)

    # Torch oracle per qat_quant.py:150-164.
    xt = torch.tensor(x)
    max_abs = torch.maximum(torch.abs(torch.tensor(mn)), torch.abs(torch.tensor(mx)))
    x_norm = xt / max_abs
    x_mu = torch.sign(x_norm) * torch.log1p(mu * torch.abs(x_norm)) / torch.log1p(torch.tensor(mu))
    x_mu_q = torch_linear_quantize(x_mu, torch.tensor(-1.0), torch.tensor(1.0), 8, sign=True, sym=False)
    y_norm = torch.sign(x_mu_q) * (torch.pow(1 + torch.tensor(mu), torch.abs(x_mu_q)) - 1) / mu
    want = (y_norm * max_abs).numpy()

    got = mulaw_fake_quant(jnp.asarray(x), jnp.float32(mn), jnp.float32(mx), jnp.float32(mu), 8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_splitter_quantize_matches_reference(rng):
    x = rng.uniform(-1, 1, size=(4, 1, 256)).astype(np.float32)
    got = splitter_quantize(jnp.asarray(x), threshold=1.0, n_bits=8, sign=True)
    # Oracle from process.py:10-14.
    delta = 1.0 / 128
    want = np.clip(np.floor(x / delta), -128, 127) * delta
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-7)


def test_fix_range_to_include_zero_matches_torch(rng):
    # Note: ranges whose min/scale quotient lands exactly on a .5 rounding tie
    # (e.g. (-0.5, 0.5)) can differ by one grid step between XLA and torch due
    # to one-ULP division differences; use tie-free cases here.
    cases = [(-0.7, 1.1), (0.2, 1.0), (-1.0, -0.1), (-0.5003, 0.5001)]
    for mn, mx in cases:
        got_mn, got_mx = fix_range_to_include_zero(jnp.float32(mn), jnp.float32(mx), 8)
        # Torch oracle per qat_quant.py:110-122.
        tmn, tmx = torch.tensor(mn), torch.tensor(mx)
        min_pos, max_neg = (tmn > 0).float(), (tmx < 0).float()
        mid = ((tmn <= 0) & (tmx >= 0)).float()
        scale = (tmx - tmn) / 255
        mn_adj = scale * torch.round(tmn / scale)
        mx_adj = tmx - tmn + mn_adj
        mn_adj = mn_adj * mid + max_neg * tmn
        mx_adj = mx_adj * mid + min_pos * tmx
        np.testing.assert_allclose(float(got_mn), float(mn_adj), rtol=1e-6)
        np.testing.assert_allclose(float(got_mx), float(mx_adj), rtol=1e-6)


def test_torch_fake_quantize_per_tensor_parity(rng):
    x = rng.standard_normal((128,)).astype(np.float32) * 3
    scale, zp = 0.02, 37
    got = torch_fake_quantize_per_tensor(jnp.asarray(x), scale, zp, 0, 255)
    want = torch.fake_quantize_per_tensor_affine(torch.tensor(x), scale, zp, 0, 255)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_torch_fake_quantize_per_channel_parity(rng):
    x = rng.standard_normal((6, 50)).astype(np.float32)
    scales = rng.uniform(0.01, 0.1, size=(6,)).astype(np.float32)
    zps = np.zeros((6,), np.int32)
    got = torch_fake_quantize_per_channel(jnp.asarray(x), jnp.asarray(scales), jnp.asarray(zps), 0, -128, 127)
    want = torch.fake_quantize_per_channel_affine(
        torch.tensor(x), torch.tensor(scales), torch.tensor(zps), 0, -128, 127
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_exported_grid_matches_learned_quantizer(rng):
    """The TorchWeightFakeQuantize freeze (qat_quant.py:15-35) must agree with
    the learned symmetric quantizer on the same ranges."""
    w = rng.standard_normal((8, 4, 3)).astype(np.float32)
    mn = w.min(axis=(1, 2), keepdims=True)
    mx = w.max(axis=(1, 2), keepdims=True)
    learned = linear_fake_quant(jnp.asarray(w), jnp.asarray(mn), jnp.asarray(mx), 8, True, True)
    max_abs = np.maximum(np.abs(mn), np.abs(mx)).reshape(-1)
    scales = max_abs / (2 ** (8 - 1))
    frozen = torch_fake_quantize_per_channel(
        jnp.asarray(w), jnp.asarray(scales), jnp.zeros((8,), np.int32), 0, -128, 127
    )
    # Note: the learned grid uses delta = 2*max_abs/255 while the export uses
    # max_abs/128 (reference discrepancy, qat_quant.py:21 vs :131). They agree
    # to within one LSB of each other.
    np.testing.assert_allclose(np.asarray(learned), np.asarray(frozen), atol=float(scales.max()))
