"""Pallas LSTM recurrence kernel (ops/pallas_lstm.py): forward must match
the lax.scan reference recurrence, gradients flow via the scan-remat
custom VJP, and QLSTM(pallas_lstm=True) equals the default scan path
(interpret mode on CPU; compiles natively on TPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.quant.spec import QuantSpec


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_lstm_sequence_matches_scan():
    from fqss_tpu.ops.pallas_lstm import _lstm_scan, lstm_sequence

    k = jax.random.PRNGKey(0)
    B, T, H = 5, 13, 128
    ih = jax.random.normal(k, (T, B, 4 * H)) * 0.5
    w_hh = jax.random.normal(jax.random.PRNGKey(1), (H, 4 * H)) / np.sqrt(H)
    y = lstm_sequence(ih, w_hh)
    y_ref = _lstm_scan(ih, w_hh)
    assert y.shape == (T, B, H)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)


def test_lstm_sequence_batch_tiling_pad():
    """B not a multiple of 8 exercises the pad/unpad path."""
    from fqss_tpu.ops.pallas_lstm import _lstm_scan, lstm_sequence

    B, T, H = 3, 7, 128
    ih = jax.random.normal(jax.random.PRNGKey(2), (T, B, 4 * H))
    w_hh = jax.random.normal(jax.random.PRNGKey(3), (H, 4 * H)) / np.sqrt(H)
    np.testing.assert_allclose(
        np.asarray(lstm_sequence(ih, w_hh)), np.asarray(_lstm_scan(ih, w_hh)), atol=2e-6
    )


@pytest.mark.slow
def test_lstm_sequence_grad_matches_scan_grad():
    from fqss_tpu.ops.pallas_lstm import _lstm_scan, lstm_sequence

    B, T, H = 2, 5, 128
    ih = jax.random.normal(jax.random.PRNGKey(4), (T, B, 4 * H)) * 0.3
    w_hh = jax.random.normal(jax.random.PRNGKey(5), (H, 4 * H)) / np.sqrt(H)
    g = jax.random.normal(jax.random.PRNGKey(6), (T, B, H))

    d_ih, d_whh = jax.grad(lambda a, w: jnp.vdot(g, lstm_sequence(a, w)), argnums=(0, 1))(ih, w_hh)
    r_ih, r_whh = jax.grad(lambda a, w: jnp.vdot(g, _lstm_scan(a, w)), argnums=(0, 1))(ih, w_hh)
    np.testing.assert_allclose(np.asarray(d_ih), np.asarray(r_ih), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_whh), np.asarray(r_whh), atol=1e-5)


def test_unsupported_hidden_falls_back():
    from fqss_tpu.ops.pallas_lstm import _lstm_scan, lstm_sequence, supported

    assert not supported(96)
    B, T, H = 2, 4, 96
    ih = jax.random.normal(jax.random.PRNGKey(7), (T, B, 4 * H))
    w_hh = jax.random.normal(jax.random.PRNGKey(8), (H, 4 * H)) / np.sqrt(H)
    np.testing.assert_allclose(
        np.asarray(lstm_sequence(ih, w_hh)), np.asarray(_lstm_scan(ih, w_hh)), atol=2e-6
    )


@pytest.mark.slow
@pytest.mark.parametrize("qat", [False, True])
def test_qlstm_pallas_flag_equals_scan_path(qat):
    """QLSTM with pallas_lstm=True must reproduce the default fused path —
    float and QAT (weight-quantized, fused mode) variants."""
    from fqss_tpu.nn.lstm import QLSTM

    q0 = QuantSpec(qat=qat, observer=False, lstm_mode="fused")
    q1 = dataclasses.replace(q0, pallas_lstm=True)
    B, T, C, H = 2, 9, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(9), (B, T, C))

    m0 = QLSTM(hidden_size=H, bidirectional=True, mode="fused", q=q0)
    m1 = QLSTM(hidden_size=H, bidirectional=True, mode="fused", q=q1)
    v = m0.init(jax.random.PRNGKey(10), x)
    y0 = m0.apply(v, x)
    y1 = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=3e-6)

    # gradients flow through the custom VJP and match the scan path
    def loss(fn, variables):
        def f(p):
            vv = dict(variables)
            vv["params"] = p
            return jnp.sum(fn.apply(vv, x) ** 2)

        return jax.grad(f)(variables["params"])

    g0 = loss(m0, v)
    g1 = loss(m1, v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5),
        g0,
        g1,
    )


def test_bilstm_sequence_matches_two_scans():
    """Direction-fused kernel (both recurrences in one grid) must equal the
    two per-direction scan recurrences exactly."""
    from fqss_tpu.ops.pallas_lstm import _lstm_scan, bilstm_sequence

    B, T, H = 5, 11, 128
    ih_f = jax.random.normal(jax.random.PRNGKey(20), (T, B, 4 * H)) * 0.5
    ih_b = jax.random.normal(jax.random.PRNGKey(21), (T, B, 4 * H)) * 0.5
    w_f = jax.random.normal(jax.random.PRNGKey(22), (H, 4 * H)) / np.sqrt(H)
    w_b = jax.random.normal(jax.random.PRNGKey(23), (H, 4 * H)) / np.sqrt(H)
    y_f, y_b = bilstm_sequence(ih_f, ih_b, w_f, w_b)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(_lstm_scan(ih_f, w_f)), atol=2e-6)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(_lstm_scan(ih_b, w_b)), atol=2e-6)


def test_bilstm_sequence_grad_and_fallback():
    from fqss_tpu.ops.pallas_lstm import _lstm_scan, bilstm_sequence

    # grad flows through the scan-remat VJP
    B, T, H = 2, 5, 128
    ih_f = jax.random.normal(jax.random.PRNGKey(24), (T, B, 4 * H)) * 0.3
    ih_b = jax.random.normal(jax.random.PRNGKey(25), (T, B, 4 * H)) * 0.3
    w_f = jax.random.normal(jax.random.PRNGKey(26), (H, 4 * H)) / np.sqrt(H)
    w_b = jax.random.normal(jax.random.PRNGKey(27), (H, 4 * H)) / np.sqrt(H)

    def tot(fn):
        return jax.grad(
            lambda a, b, wf, wb: sum(jnp.sum(o**2) for o in fn(a, b, wf, wb))
        , argnums=(0, 1, 2, 3))(ih_f, ih_b, w_f, w_b)

    got = tot(bilstm_sequence)
    ref = tot(lambda a, b, wf, wb: (_lstm_scan(a, wf), _lstm_scan(b, wb)))
    for ga, gr in zip(got, ref):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=2e-5)

    # unsupported hidden size falls back to the scan pair
    H2 = 96
    a = jax.random.normal(jax.random.PRNGKey(28), (4, 2, 4 * H2))
    wf = jax.random.normal(jax.random.PRNGKey(29), (H2, 4 * H2)) / np.sqrt(H2)
    y_f, y_b = bilstm_sequence(a, a, wf, wf)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(_lstm_scan(a, wf)), atol=2e-6)
