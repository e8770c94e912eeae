"""Observer/state behavior of the flax quantizer modules."""

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.quant import QPARAMS, QSTATS, ActQuantizer, WeightQuantizer, dynamic_act_quant, linear_fake_quant


def _apply_mutable(mod, variables, x):
    y, updates = mod.apply(variables, x, mutable=[QPARAMS, QSTATS])
    new_vars = dict(variables)
    new_vars.update(updates)
    return y, new_vars


def test_act_observer_ema_then_quantize():
    q = ActQuantizer(n_bits=8, observer=True, max_observations=5)
    x0 = jnp.ones((4, 16)) * 0.25
    variables = q.init(jax.random.PRNGKey(0), x0)

    # EMA oracle per qat_quant.py:228-233 (init -0.5/0.5, alpha 0.9).
    mn, mx = -0.5, 0.5
    v = variables
    for step in range(5):
        x = jnp.full((4, 16), float(step + 1))
        y, v = _apply_mutable(q, v, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))  # identity while observing
        mn = 0.9 * mn + 0.1 * float(step + 1)
        mx = 0.9 * mx + 0.1 * float(step + 1)
    np.testing.assert_allclose(float(v[QPARAMS]["min_range"][0]), mn, rtol=1e-6)
    np.testing.assert_allclose(float(v[QPARAMS]["max_range"][0]), mx, rtol=1e-6)
    assert int(v[QSTATS]["n_iter"]) == 5

    # After max_observations the quantize path engages and state freezes.
    x = jnp.linspace(-1, 3, 64).reshape(4, 16)
    y, v2 = _apply_mutable(q, v, x)
    want = linear_fake_quant(x, v[QPARAMS]["min_range"], v[QPARAMS]["max_range"], 8, sign=mn < 0, sym=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)
    assert int(v2[QSTATS]["n_iter"]) == 5
    np.testing.assert_allclose(np.asarray(v2[QPARAMS]["min_range"]), np.asarray(v[QPARAMS]["min_range"]))


def test_act_quantizer_pure_eval_identity_during_observer_window():
    q = ActQuantizer(n_bits=8, observer=True, max_observations=5)
    x = jnp.ones((2, 8)) * 0.3
    variables = q.init(jax.random.PRNGKey(0), x)
    y = q.apply(variables, x)  # no mutable collections: no writes allowed
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_act_quantizer_observer_false_quantizes_immediately():
    q = ActQuantizer(n_bits=8, observer=False)
    x = jnp.linspace(-0.4, 0.4, 32).reshape(2, 16)
    variables = q.init(jax.random.PRNGKey(0), x)
    y = q.apply(variables, x)
    want = linear_fake_quant(x, jnp.full((1,), -0.5), jnp.full((1,), 0.5), 8, True, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)


def test_act_quantizer_range_gradients():
    q = ActQuantizer(n_bits=8, observer=False, gradient_based=True)
    x = jnp.linspace(-2.0, 2.0, 64).reshape(4, 16)
    variables = q.init(jax.random.PRNGKey(0), x)

    def loss(qparams):
        return jnp.sum(q.apply({QPARAMS: qparams, QSTATS: variables[QSTATS]}, x) ** 2)

    g = jax.grad(loss)(variables[QPARAMS])
    assert float(jnp.abs(g["min_range"]).sum()) > 0
    assert float(jnp.abs(g["max_range"]).sum()) > 0

    q_frozen = ActQuantizer(n_bits=8, observer=False, gradient_based=False)
    g = jax.grad(lambda p: jnp.sum(q_frozen.apply({QPARAMS: p, QSTATS: variables[QSTATS]}, x) ** 2))(
        variables[QPARAMS]
    )
    assert float(jnp.abs(g["min_range"]).sum()) == 0
    assert float(jnp.abs(g["max_range"]).sum()) == 0


def test_weight_quantizer_one_shot_observer():
    w = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 3))
    q = WeightQuantizer(weight_shape=w.shape, ch_axis=0, observer=True)
    variables = q.init(jax.random.PRNGKey(0), w)

    y, v = _apply_mutable(q, variables, w)
    # Observation call returns the float weights and captures per-channel ranges.
    np.testing.assert_array_equal(np.asarray(y), np.asarray(w))
    np.testing.assert_allclose(
        np.asarray(v[QPARAMS]["min_range"]), np.asarray(w.min(axis=(1, 2), keepdims=True)), rtol=1e-6
    )
    assert bool(v[QSTATS]["observed"])

    # Second call quantizes on the captured grid.
    y2, v2 = _apply_mutable(q, v, w)
    want = linear_fake_quant(w, v[QPARAMS]["min_range"], v[QPARAMS]["max_range"], 8, True, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want), atol=1e-6)


def test_weight_quantizer_transposed_axis():
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 5))
    q = WeightQuantizer(weight_shape=w.shape, ch_axis=1, observer=True)
    variables = q.init(jax.random.PRNGKey(0), w)
    _, v = _apply_mutable(q, variables, w)
    assert v[QPARAMS]["min_range"].shape == (1, 8, 1)


def test_dynamic_act_quant():
    x = jnp.linspace(-3.0, 5.0, 128)
    y = dynamic_act_quant(x, n_bits=8)
    want = linear_fake_quant(x, 0.99 * x.min(), 0.99 * x.max(), 8, True, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)
    # constant input -> identity
    c = jnp.full((16,), 2.5)
    np.testing.assert_array_equal(np.asarray(dynamic_act_quant(c)), np.asarray(c))


def test_quantizer_under_jit_no_recompile_on_step():
    """The observer/quantize switch is traced (no per-step recompiles)."""
    q = ActQuantizer(n_bits=8, observer=True, max_observations=3)
    x = jnp.ones((2, 8)) * 0.1
    v = q.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(v, x):
        y, updates = q.apply(v, x, mutable=[QPARAMS, QSTATS])
        v = dict(v)
        v.update(updates)
        return y, v

    for i in range(5):
        y, v = step(v, x * (i + 1))
    assert step._cache_size() == 1
    assert int(v[QSTATS]["n_iter"]) == 3
