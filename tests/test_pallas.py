"""Pallas kernel correctness vs the XLA quant-core reference (interpret mode
on CPU; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.quant import linear_fake_quant

# Force interpret mode on the CPU test platform.
from jax.experimental import pallas as pl  # noqa: F401
import jax._src.pallas.pallas_call as pallas_call_mod


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_fake_quant_pallas_matches_reference():
    from fqss_tpu.ops.pallas_quant import fake_quant_pallas

    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 300)).astype(np.float32)
    mn, mx = jnp.float32(-0.7), jnp.float32(1.2)
    got = np.asarray(fake_quant_pallas(jnp.asarray(x), mn, mx, n_bits=8))
    want = np.asarray(linear_fake_quant(jnp.asarray(x), mn, mx, 8, True, False))
    # one-ULP division differences flip grid points exactly at .5 ties;
    # allow <=0.05% one-LSB mismatches (same tolerance as the torch tests)
    delta = (1.2 + 0.7) / 255
    bad = np.abs(got - want) > 1e-6
    assert bad.mean() < 5e-4, bad.mean()
    assert np.abs(got - want)[bad].max() <= delta * 1.01 if bad.any() else True


def test_qmatmul_pallas_matches_reference():
    from fqss_tpu.ops.pallas_quant import qmatmul_pallas

    rng = np.random.default_rng(1)
    m, k, n = 64, 96, 80
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_min = w.min(axis=0)
    w_max = w.max(axis=0)
    a_min, a_max = jnp.float32(-4.0), jnp.float32(4.0)

    got = qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(w_min), jnp.asarray(w_max),
        a_min, a_max, tm=64, tn=128,
    )
    # Reference with the SAME in-kernel weight grid (isolates the act
    # epilogue from cross-backend ULP ties in the weight division).
    from fqss_tpu.ops.pallas_quant import qmatmul_pallas as _qmm

    pre = np.asarray(_qmm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(w_min), jnp.asarray(w_max),
                          act_quant=False, tm=64, tn=128))
    want = np.asarray(linear_fake_quant(jnp.asarray(pre), a_min, a_max, 8, True, False))
    got = np.asarray(got)
    delta_a = 8.0 / 255
    err = np.abs(got - want)
    assert np.median(err) < 1e-6
    assert err.max() <= 1.01 * delta_a, err.max()  # act rounding-tie flips only


def test_qmatmul_pallas_no_act_quant():
    from fqss_tpu.ops.pallas_quant import qmatmul_pallas

    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    w = rng.standard_normal((32, 48)).astype(np.float32)
    got = qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w),
        jnp.asarray(w.min(0)), jnp.asarray(w.max(0)),
        act_quant=False, tm=16, tn=128,
    )
    wq = linear_fake_quant(jnp.asarray(w), jnp.asarray(w.min(0))[None], jnp.asarray(w.max(0))[None], 8, True, True)
    want = np.asarray(jnp.asarray(x) @ wq)
    got = np.asarray(got)
    # weight-grid ULP ties can flip one weight level; bound by its effect
    err = np.abs(got - want)
    assert np.median(err) < 1e-5
    assert err.max() < 0.1, err.max()


def test_int8_matmul_requant_matches_engine_xla_path():
    """The fused serving kernel == the engine's XLA int8+requant semantics."""
    from fqss_tpu.ops.pallas_quant import int8_matmul_requant_pallas
    from fqss_tpu.serve.convtasnet_int8 import _Grid, _int1x1, _Int8Weight, _prelu, _QAct, _requant

    rng = np.random.default_rng(2)
    M, K, N = 70, 48, 40
    xs = rng.integers(-128, 128, size=(M, K)).astype(np.int8)
    w_int = rng.integers(-128, 128, size=(K, N)).astype(np.int8)
    s_w = (rng.uniform(0.5, 2.0, size=(N,)) * 1e-3).astype(np.float32)
    bias = rng.normal(size=(N,)).astype(np.float32) * 0.01
    g_in = _Grid(delta=np.float32(0.01), mn=np.float32(-1.2))
    g_out = _Grid(delta=np.float32(0.005), mn=np.float32(-0.6))
    alpha = np.float32(0.25)

    qa = _QAct(jnp.asarray(xs).reshape(1, M, K), g_in)
    w8 = _Int8Weight(w_int=w_int, scale=s_w, sum_w=w_int.sum(axis=0).astype(np.float32), bias=bias)
    v = _int1x1(qa, w8)
    v = _prelu(v, jnp.float32(alpha))
    want = _requant(v, g_out).Xs[0]

    corr = (g_in.mn + 128.0 * g_in.delta) * s_w * w8.sum_w + bias
    got = int8_matmul_requant_pallas(
        jnp.asarray(xs),
        jnp.asarray(w_int),
        jnp.asarray(g_in.delta * s_w),
        jnp.asarray(corr),
        jnp.float32(alpha),
        jnp.float32(g_out.delta),
        jnp.float32(g_out.mn),
    )
    mismatch = np.mean(np.asarray(got) != np.asarray(want))
    assert mismatch < 5e-4, f"pallas int8 kernel mismatch frac {mismatch}"
