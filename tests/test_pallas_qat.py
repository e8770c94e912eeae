"""Custom-VJP Pallas QAT training kernels (ops/pallas_qat.py): values AND
gradients must match jax.grad of the XLA quant core (interpret mode on CPU;
the same kernels compile natively on TPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.quant import linear_fake_quant
from fqss_tpu.quant.spec import QuantSpec


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_act_fake_quant_train_matches_autodiff():
    from fqss_tpu.ops.pallas_qat import act_fake_quant_train

    x = jax.random.uniform(jax.random.PRNGKey(0), (7, 333), minval=-2.0, maxval=2.0)
    mn, mx = jnp.full((1,), -0.83), jnp.full((1,), 1.07)
    # plant exact grid-edge and tie values
    delta = (1.07 + 0.83) / 255
    x = x.at[0, 0].set(-0.83).at[0, 1].set(1.07).at[0, 2].set(-0.83 + 0.5 * delta)
    g = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    y = act_fake_quant_train(x, mn, mx, 8, False)
    y_ref = linear_fake_quant(x, mn, mx, 8, True, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    for sg in (False, True):
        f = lambda x, mn, mx: jnp.vdot(g, act_fake_quant_train(x, mn, mx, 8, sg))
        fr = lambda x, mn, mx: jnp.vdot(g, linear_fake_quant(x, mn, mx, 8, True, False, sg))
        got = jax.grad(f, argnums=(0, 1, 2))(x, mn, mx)
        want = jax.grad(fr, argnums=(0, 1, 2))(x, mn, mx)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("ch_axis,shape", [
    (1, (65, 40)),
    # the transposed/3-D axis layouts re-test the same kernel through the
    # moveaxis plumbing — full-matrix coverage lives in the slow tier
    pytest.param(0, (40, 65), marks=pytest.mark.slow),
    pytest.param(2, (5, 33, 24), marks=pytest.mark.slow),
])
def test_weight_fake_quant_train_matches_autodiff(ch_axis, shape):
    from fqss_tpu.ops.pallas_qat import weight_fake_quant_train

    c = shape[ch_axis]
    kd = [1] * len(shape)
    kd[ch_axis] = c
    w = jax.random.normal(jax.random.PRNGKey(2), shape) * 0.3
    mn = -jnp.abs(jax.random.normal(jax.random.PRNGKey(3), tuple(kd))) * 0.4 - 0.01
    mx = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), tuple(kd))) * 0.4 + 0.01
    g = jax.random.normal(jax.random.PRNGKey(5), shape)

    y = weight_fake_quant_train(w, mn, mx, 8, False, ch_axis)
    y_ref = linear_fake_quant(w, mn, mx, 8, True, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    for sg in (False, True):
        f = lambda w, mn, mx: jnp.vdot(g, weight_fake_quant_train(w, mn, mx, 8, sg, ch_axis))
        fr = lambda w, mn, mx: jnp.vdot(g, linear_fake_quant(w, mn, mx, 8, True, True, sg))
        got = jax.grad(f, argnums=(0, 1, 2))(w, mn, mx)
        want = jax.grad(fr, argnums=(0, 1, 2))(w, mn, mx)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def _dense_ref(x, w, b, wmn, wmx, amn, amx, act_quant=True):
    wq = linear_fake_quant(w, wmn, wmx, 8, True, True)
    y = x @ wq + b
    return linear_fake_quant(y, amn, amx, 8, True, False) if act_quant else y


def _dense_inputs(M, K, N, arange=3.0):
    k = jax.random.PRNGKey
    x = jax.random.normal(k(6), (M, K))
    w = jax.random.normal(k(7), (K, N)) * 0.3
    b = jax.random.normal(k(8), (N,)) * 0.1
    wmn = -jnp.abs(jax.random.normal(k(9), (1, N))) * 0.4 - 0.01
    wmx = jnp.abs(jax.random.normal(k(10), (1, N))) * 0.4 + 0.01
    amn, amx = jnp.full((1,), -arange), jnp.full((1,), arange)
    g = jax.random.normal(k(11), (M, N))
    return x, w, b, wmn, wmx, amn, amx, g


@pytest.mark.slow
def test_qat_dense_small_exact():
    from fqss_tpu.ops.pallas_qat import qat_dense

    x, w, b, wmn, wmx, amn, amx, g = _dense_inputs(37, 24, 33)
    args = (x, w, b, wmn, wmx, amn, amx)
    np.testing.assert_allclose(
        np.asarray(qat_dense(*args)), np.asarray(_dense_ref(*args)), atol=2e-6
    )
    got = jax.grad(lambda *a: jnp.vdot(g, qat_dense(*a)), argnums=tuple(range(7)))(*args)
    want = jax.grad(lambda *a: jnp.vdot(g, _dense_ref(*a)), argnums=tuple(range(7)))(*args)
    for a, bb in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)


@pytest.mark.slow
def test_qat_dense_multiblock_grid():
    """Shapes that exercise every grid axis (tiling, j-accumulated act
    partials, mi-accumulated dwq). Different K-padding changes f32 matmul
    accumulation order vs XLA, so agreement is to round-tie noise: forward
    within one act LSB, grads within 1e-3 relative."""
    from fqss_tpu.ops.pallas_qat import qat_dense

    x, w, b, wmn, wmx, amn, amx, g = _dense_inputs(700, 300, 520, arange=9.0)
    args = (x, w, b, wmn, wmx, amn, amx)
    lsb = 18.0 / 255
    y, y_ref = qat_dense(*args), _dense_ref(*args)
    assert float(jnp.max(jnp.abs(y - y_ref))) <= 1.01 * lsb
    assert float(jnp.mean(jnp.abs(y - y_ref))) <= 0.05 * lsb
    got = jax.grad(lambda *a: jnp.vdot(g, qat_dense(*a)), argnums=tuple(range(7)))(*args)
    want = jax.grad(lambda *a: jnp.vdot(g, _dense_ref(*a)), argnums=tuple(range(7)))(*args)
    for a, bb in zip(got, want):
        scale = float(jnp.max(jnp.abs(bb))) + 1e-12
        assert float(jnp.max(jnp.abs(a - bb))) / scale < 1e-3


@pytest.mark.slow
def test_qat_dense_no_act_quant():
    from fqss_tpu.ops.pallas_qat import qat_dense

    x, w, b, wmn, wmx, amn, amx, g = _dense_inputs(17, 40, 25)
    args = (x, w, b, wmn, wmx, amn, amx)
    y = qat_dense(*args, 8, 8, False)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_dense_ref(*args, act_quant=False)), atol=2e-6
    )
    got = jax.grad(lambda *a: jnp.vdot(g, qat_dense(*a, 8, 8, False)), argnums=tuple(range(7)))(*args)
    want = jax.grad(lambda *a: jnp.vdot(g, _dense_ref(*a, act_quant=False)), argnums=tuple(range(7)))(*args)
    for a, bb in zip(got[:3], want[:3]):  # dx, dw, db
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)
    for a in got[5:]:  # act ranges get zero cotangents
        np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-7)


@pytest.mark.slow
def test_pallas_qat_model_training_step_parity():
    """QuantSpec.pallas_qat routes ActQuantizer/WeightQuantizer through the
    Pallas kernels inside a real model. Per-quantizer values agree to f32
    ULPs, but ULP shifts cascade into occasional grid-tie flips through a
    deep quantized net — the same noise class as the model's OWN
    jit-vs-eager self-agreement (PARITY.md), which is therefore the
    yardstick for forward SNR and loss-gradient agreement."""
    import jax.flatten_util

    from fqss_tpu.models import ConvTasNet

    arch = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=8,
                hid_chan=16, n_blocks=2, n_repeats=1)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 1600), minval=-1.0, maxval=1.0)

    # observe ranges once with the XLA path
    from fqss_tpu.quant import run_observer

    obs = ConvTasNet(q=dataclasses.replace(q, observer=True), **arch)
    var = dict(obs.init(jax.random.PRNGKey(0), x))
    var = run_observer(obs, var, x, steps=55)

    model_xla = ConvTasNet(q=q, **arch)
    model_pls = ConvTasNet(q=dataclasses.replace(q, pallas_qat=True), **arch)

    def snr(a, b):
        return 10 * np.log10(float(jnp.sum(a**2)) / (float(jnp.sum((a - b) ** 2)) + 1e-30))

    y_xla = model_xla.apply(var, x)
    snr_self = snr(y_xla, jax.jit(model_xla.apply)(var, x))
    y_pls = model_pls.apply(var, x)
    assert snr(y_xla, y_pls) >= snr_self - 3.0

    tgt = jax.random.normal(jax.random.PRNGKey(12), y_xla.shape)

    def loss(params, model):
        v = {**var, "params": params}
        return jnp.mean((model.apply(v, x) - tgt) ** 2)

    l_xla = float(loss(var["params"], model_xla))
    l_pls = float(loss(var["params"], model_pls))
    assert abs(l_pls - l_xla) / l_xla < 1e-3

    gx, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(var["params"], model_xla))
    gp, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(var["params"], model_pls))
    gj, _ = jax.flatten_util.ravel_pytree(
        jax.grad(jax.jit(loss, static_argnums=1))(var["params"], model_xla)
    )
    rel_self = float(jnp.linalg.norm(gj - gx) / jnp.linalg.norm(gx))
    rel = float(jnp.linalg.norm(gp - gx) / jnp.linalg.norm(gx))
    cos = float(jnp.vdot(gp, gx) / (jnp.linalg.norm(gp) * jnp.linalg.norm(gx)))
    assert rel <= 2.0 * rel_self + 0.05, (rel, rel_self)
    assert cos >= 0.97, cos
