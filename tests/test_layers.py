"""Layer-level parity tests: conv semantics vs torch, quant plumbing, MACs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from fqss_tpu.nn import (
    MACS,
    QAdd,
    QConv1d,
    QConv2d,
    QConvTranspose1d,
    QConvTranspose2d,
    QDense,
    QGroupNorm,
    QNl,
)
from fqss_tpu.quant import QPARAMS, QSTATS, QuantSpec

QAT = QuantSpec(qat=True, observer=False)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_qconv1d_matches_torch_float(rng):
    x = rng.standard_normal((2, 50, 6)).astype(np.float32)  # NTC
    m = QConv1d(features=8, kernel_size=3, stride=2, padding=1, dilation=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # (k, Ci, Co)
    b = np.asarray(v["params"]["bias"])
    yt = F.conv1d(
        torch.tensor(x.transpose(0, 2, 1)),
        torch.tensor(w.transpose(2, 1, 0)),  # (Co, Ci, k)
        torch.tensor(b),
        stride=2, padding=1, dilation=2,
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_qconv1d_depthwise_matches_torch(rng):
    x = rng.standard_normal((2, 40, 8)).astype(np.float32)
    m = QConv1d(features=8, kernel_size=3, padding=4, dilation=4, groups=8)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # (k, 1, Co)
    b = np.asarray(v["params"]["bias"])
    yt = F.conv1d(
        torch.tensor(x.transpose(0, 2, 1)),
        torch.tensor(w.transpose(2, 1, 0)),
        torch.tensor(b),
        padding=4, dilation=4, groups=8,
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_qconvtranspose1d_matches_torch(rng):
    x = rng.standard_normal((2, 20, 6)).astype(np.float32)
    m = QConvTranspose1d(features=3, kernel_size=16, stride=8, padding=0)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # (k, Cin, Cout)
    b = np.asarray(v["params"]["bias"])
    yt = F.conv_transpose1d(
        torch.tensor(x.transpose(0, 2, 1)),
        torch.tensor(w.transpose(1, 2, 0)),  # (Cin, Cout, k)
        torch.tensor(b),
        stride=8,
    )
    assert y.shape == (2, (20 - 1) * 8 + 16, 3)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_qconvtranspose1d_padded_matches_torch(rng):
    x = rng.standard_normal((1, 15, 4)).astype(np.float32)
    m = QConvTranspose1d(features=2, kernel_size=5, stride=3, padding=2, output_padding=1)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"])
    yt = F.conv_transpose1d(
        torch.tensor(x.transpose(0, 2, 1)),
        torch.tensor(w.transpose(1, 2, 0)),
        torch.tensor(b),
        stride=3, padding=2, output_padding=1,
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_qconv2d_matches_torch(rng):
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)  # NHWC
    m = QConv2d(features=5, kernel_size=(3, 2), stride=(2, 1), padding=(1, 0))
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # (kh, kw, Ci, Co)
    b = np.asarray(v["params"]["bias"])
    yt = F.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)),
        torch.tensor(w.transpose(3, 2, 0, 1)),
        torch.tensor(b),
        stride=(2, 1), padding=(1, 0),
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_qconvtranspose2d_matches_torch(rng):
    x = rng.standard_normal((1, 7, 6, 4)).astype(np.float32)
    m = QConvTranspose2d(features=3, kernel_size=(4, 3), stride=(2, 2), padding=(1, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # (kh, kw, Cin, Cout)
    b = np.asarray(v["params"]["bias"])
    yt = F.conv_transpose2d(
        torch.tensor(x.transpose(0, 3, 1, 2)),
        torch.tensor(w.transpose(2, 3, 0, 1)),
        torch.tensor(b),
        stride=(2, 2), padding=(1, 1),
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_qconv1d_fused_gn_prelu_matches_torch(rng):
    """Conv1dGnNlQ fusion: conv -> GroupNorm -> PReLU (float path)."""
    x = rng.standard_normal((2, 30, 4)).astype(np.float32)
    m = QConv1d(features=6, kernel_size=1, nl="prelu", norm_groups=1, norm_eps=1e-8)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"])
    gn_scale = np.asarray(v["params"]["norm"]["scale"])
    gn_bias = np.asarray(v["params"]["norm"]["bias"])
    alpha = np.asarray(v["params"]["nl"]["alpha"])
    yt = F.conv1d(torch.tensor(x.transpose(0, 2, 1)), torch.tensor(w.transpose(2, 1, 0)), torch.tensor(b))
    yt = F.group_norm(yt, 1, torch.tensor(gn_scale), torch.tensor(gn_bias), eps=1e-8)
    yt = F.prelu(yt, torch.tensor(alpha))
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_qdense_quantized_has_quantizer_state(rng):
    x = rng.standard_normal((2, 10, 16)).astype(np.float32)
    m = QDense(features=8, q=QAT)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "weight_fake_quantize" in v[QPARAMS]
    assert "activation_fake_quantize" in v[QPARAMS]
    y, updates = m.apply(v, jnp.asarray(x), mutable=[QPARAMS, QSTATS])
    assert y.shape == (2, 10, 8)
    # weight observer captured per-out-channel ranges (axis 1 of (in, out))
    assert updates[QPARAMS]["weight_fake_quantize"]["min_range"].shape == (1, 8)


def test_float_spec_produces_no_quant_state(rng):
    x = rng.standard_normal((2, 10, 16)).astype(np.float32)
    m = QDense(features=8)  # FLOAT default
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert QPARAMS not in v
    assert QSTATS not in v


def test_qadd_and_qnl_quant_points(rng):
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    m = QAdd(q=QuantSpec(qat=True, observer=False))
    v = m.init(jax.random.PRNGKey(0), x, x)
    y = m.apply(v, x, x)
    assert y.shape == x.shape
    # output is quantized on the default grid (-0.5, 0.5), so clipped at 0.5
    assert float(jnp.max(y)) <= 0.5 + 1e-6

    m2 = QNl(kind="sigmoid", q=QuantSpec(qat=True, observer=False))
    v2 = m2.init(jax.random.PRNGKey(0), x)
    y2 = m2.apply(v2, x)
    assert float(jnp.max(y2)) <= 0.5 + 1e-6  # sigmoid out then quantized to <=0.5


def test_group_norm_parity_with_torch(rng):
    x = rng.standard_normal((2, 25, 12)).astype(np.float32)
    m = QGroupNorm(num_groups=4, epsilon=1e-8)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    yt = F.group_norm(torch.tensor(x.transpose(0, 2, 1)), 4,
                      torch.ones(12), torch.zeros(12), eps=1e-8)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_mac_accounting(rng):
    x = rng.standard_normal((2, 50, 6)).astype(np.float32)
    m = QConv1d(features=8, kernel_size=3, stride=2, padding=1)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, aux = m.apply(v, jnp.asarray(x), mutable=[MACS])
    lo = (50 + 2 * 1 - (3 - 1) - 1) // 2 + 1
    want = 2 * 6 * 8 * lo * 3  # B*Ci*Co*Lo*k (qat_layers.py:148-153)
    assert int(aux[MACS]["mac_op"][0]) == want


def test_compute_dtype_bf16_close_to_f32():
    """QuantSpec.compute_dtype='bfloat16' casts MXU operands only: outputs
    stay f32 and match the f32 path to bf16 rounding tolerance."""
    import dataclasses

    import jax

    from fqss_tpu.models import ConvTasNet

    arch = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=8,
                hid_chan=16, n_blocks=2, n_repeats=1)
    q32 = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    qbf = dataclasses.replace(q32, compute_dtype="bfloat16")
    m32, mbf = ConvTasNet(q=q32, **arch), ConvTasNet(q=qbf, **arch)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3200), minval=-1.0, maxval=1.0)
    v = m32.init(jax.random.PRNGKey(1), x)
    y32 = m32.apply(v, x)
    ybf = mbf.apply(v, x)
    assert ybf.dtype == jnp.float32
    assert y32.shape == ybf.shape
    # requant clamps bf16 drift to the 8-bit grids: outputs differ by at most
    # a few output-grid steps
    denom = float(jnp.abs(y32).max()) + 1e-9
    assert float(jnp.abs(ybf - y32).mean()) / denom < 0.05
