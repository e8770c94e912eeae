"""Fused Pallas attention kernel (ops/pallas_attention.py): forward must
match the XLA composition (incl. padding/masking for off-tile shapes),
gradients flow via the XLA-remat custom VJP, and
QMultiheadAttention(pallas_attn=True) equals the default path
(interpret mode on CPU; compiles natively on TPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.quant import QPARAMS, QuantSpec


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# kernel=True rows MUST route through the Pallas kernel (supported());
# kernel=False rows check the small-shape XLA fallback stays correct.
# (250, 250, 32) is the production Sepformer intra-chunk shape: Lk=250 -> Lkp=256
# exercises the key-padding mask branch AND the Lq tail padding (250 % 8 != 0);
# (136, 200, 64) is off-tile on both axes; (520, 136, 32) needs a 2-tile q grid.
@pytest.mark.parametrize(
    "lq,lk,d,kernel",
    [
        (37, 37, 24, False),
        (40, 53, 16, False),
        (256, 128, 64, True),
        (250, 250, 32, True),
        (136, 200, 64, True),
        (520, 136, 32, True),
    ],
)
def test_fused_matches_xla(lq, lk, d, kernel):
    from fqss_tpu.ops.pallas_attention import _attention_xla, fused_attention, supported

    assert supported(lq, lk, d) == kernel
    bh = 3
    qs, k, v = _rand(0, bh, lq, d) * 0.3, _rand(1, bh, lk, d), _rand(2, bh, lk, d)
    mn = jnp.full((1,), -0.7, jnp.float32)
    mx = jnp.full((1,), 1.3, jnp.float32)
    want = _attention_xla(qs, k, v, mn, mx, 8)
    got = fused_attention(qs, k, v, mn, mx, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_grad_matches_xla():
    from fqss_tpu.ops.pallas_attention import _attention_xla, fused_attention

    qs, k, v = _rand(0, 2, 24, 16) * 0.3, _rand(1, 2, 24, 16), _rand(2, 2, 24, 16)
    mn = jnp.full((1,), -0.9, jnp.float32)
    mx = jnp.full((1,), 1.1, jnp.float32)
    g = _rand(3, 2, 24, 16)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, 8) * g)

    got = jax.grad(loss(fused_attention), argnums=(0, 1, 2, 3, 4))(qs, k, v, mn, mx)
    want = jax.grad(loss(_attention_xla), argnums=(0, 1, 2, 3, 4))(qs, k, v, mn, mx)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


# L=21 exercises the module-level small-shape fallback routing; L=150 (per-head
# d=E/h=4, Lkp=256 mask + Lq%8!=0 tail) actually runs the kernel from inside
# QMultiheadAttention, keeping the fused routing in nn/attention.py exercised.
@pytest.mark.parametrize("L", [21, 150])
def test_qmha_pallas_equals_xla_path(L):
    from fqss_tpu.nn.attention import QMultiheadAttention

    E, h, B = 16, 4, 2
    q0 = QuantSpec(qat=True, observer=False)
    x = _rand(5, B, L, E)
    m0 = QMultiheadAttention(E, h, q=q0)
    v = m0.init(jax.random.PRNGKey(0), x, x, x)
    # Spread the head-quantizer range so the grid actually bites.
    v = jax.device_put(v)
    v[QPARAMS]["activation_fake_quantize_head"]["min_range"] = jnp.full((1,), -2.0)
    v[QPARAMS]["activation_fake_quantize_head"]["max_range"] = jnp.full((1,), 2.0)
    y_xla = m0.apply(v, x, x, x)
    m1 = QMultiheadAttention(E, h, q=dataclasses.replace(q0, pallas_attn=True))
    y_pal = m1.apply(v, x, x, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla), rtol=1e-5, atol=1e-5)


def test_qmha_pallas_cross_attention_and_unsupported_fallback():
    from fqss_tpu.nn.attention import QMultiheadAttention
    from fqss_tpu.ops import pallas_attention

    E, h, B, Lq, Lk = 16, 2, 2, 9, 31
    q0 = QuantSpec(qat=True, observer=False)
    xq, xkv = _rand(6, B, Lq, E), _rand(7, B, Lk, E)
    m0 = QMultiheadAttention(E, h, q=q0)
    v = m0.init(jax.random.PRNGKey(0), xq, xkv, xkv)
    y_xla = m0.apply(v, xq, xkv, xkv)
    m1 = QMultiheadAttention(E, h, q=dataclasses.replace(q0, pallas_attn=True))
    y_pal = m1.apply(v, xq, xkv, xkv)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla), rtol=1e-5, atol=1e-5)
    # Oversized shapes must report unsupported (XLA fallback inside).
    assert not pallas_attention.supported(4096, 8192, 128)


@pytest.mark.slow
def test_sepformer_pallas_attn_equals_default():
    """End-to-end composition: the spec flag routes every MHA in the dual-path
    stack through the fused kernel and the model output is unchanged."""
    from fqss_tpu.models.sepformer import Sepformer

    kw = dict(
        n_srcs=2, kernel_size=16, stride=8, n_filters=16, n_repeats=1,
        n_heads=4, chunk_size=10, n_ffn=32, n_layers=1,
    )
    q0 = QuantSpec(qat=True, observer=False)
    x = _rand(8, 1, 400)
    m0 = Sepformer(q=q0, **kw)
    v = m0.init(jax.random.PRNGKey(0), x)
    y0 = m0.apply(v, x)
    m1 = Sepformer(q=dataclasses.replace(q0, pallas_attn=True), **kw)
    y1 = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5)


def test_fused_attention_xla_fallback_on_unsupported():
    from fqss_tpu.ops.pallas_attention import _attention_xla, fused_attention

    # d > 2 lanes -> unsupported -> falls back to the XLA path verbatim.
    qs, k, v = _rand(0, 1, 8, 300), _rand(1, 1, 8, 300), _rand(2, 1, 8, 300)
    mn = jnp.full((1,), -1.0)
    mx = jnp.full((1,), 1.0)
    np.testing.assert_allclose(
        np.asarray(fused_attention(qs, k, v, mn, mx, 8)),
        np.asarray(_attention_xla(qs, k, v, mn, mx, 8)),
        rtol=0,
        atol=0,
    )
