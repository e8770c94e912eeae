"""ConvTasNet model tests: shapes, quant plumbing, and float-forward parity
against the reference torch model (used strictly as a test oracle)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.models.convtasnet import ConvTasNet
from fqss_tpu.quant import QPARAMS, QSTATS, QuantSpec

REF = "/root/reference"


def _load_reference_convtasnet():
    """Import the reference model with unavailable deps stubbed out."""
    import types

    import torch

    for name in ("torchmetrics", "torchmetrics.audio", "torchmetrics.audio.stoi", "torchaudio"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        for name in ("matplotlib", "matplotlib.pyplot"):
            sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchmetrics"].ScaleInvariantSignalNoiseRatio = object
    sys.modules["torchmetrics"].SignalDistortionRatio = object
    sys.modules["torchmetrics.audio.stoi"].ShortTimeObjectiveIntelligibility = object
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from quantization.qat.models.convtasnetq import ConvTasNetQ  # noqa: PLC0415

    return ConvTasNetQ


def test_float_forward_shape():
    m = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_repeats=2, n_blocks=2)
    x = jnp.zeros((2, 8000))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape[0] == 2 and y.shape[1] == 2
    assert y.shape[2] >= 8000 - 16  # decoder length (L-1)*s + k of M frames


def test_qat_forward_shape_and_state():
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    m = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_repeats=2, n_blocks=2, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8000), minval=-1, maxval=1)
    v = m.init(jax.random.PRNGKey(0), x)
    assert QPARAMS in v and QSTATS in v
    y, planes = m.apply(v, x, return_planes=True)
    assert y.shape[:2] == (2, 2)
    assert planes.shape[:3] == (2, 2, 2)  # [n_comb, B, S]
    assert bool(jnp.isfinite(y).all())


def test_observer_then_quantize_changes_output():
    q = QuantSpec(qat=True, observer=True, n_splitter=1, n_combiner=1)
    m = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_repeats=1, n_blocks=2, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 4000), minval=-1, maxval=1)
    v = dict(m.init(jax.random.PRNGKey(0), x))

    @jax.jit
    def step(v, x):
        y, upd = m.apply(v, x, mutable=[QPARAMS, QSTATS])
        v = dict(v)
        v.update(upd)
        return y, v

    y0, v = step(v, x)  # weight observer fires; act observers in EMA mode
    y1, v = step(v, x)  # weights now quantized, acts still observing
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
def test_float_parity_with_reference_torch_model():
    """Load the SAME weights into the reference float model (oracle) and our
    flax model; forwards must agree."""
    import torch

    ConvTasNetQ = _load_reference_convtasnet()
    tm = ConvTasNetQ(n_spks=2, kernel_size=16, stride=8)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import convtasnet_params_from_torch

    params = convtasnet_params_from_torch(sd)
    m = ConvTasNet(n_srcs=2, kernel_size=16, stride=8)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 4000)).astype(np.float32)

    # Validate param-tree congruence against a fresh init.
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes

    y = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_merge_float_params_into_qat_tree():
    """Float->QAT weight loading keeps QAT-only params and widens the encoder
    (regression: the combiner's residual block params must survive)."""
    from fqss_tpu.models.factory import merge_float_params

    kw = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=16, bn_chan=8,
              hid_chan=8, n_blocks=1, n_repeats=1)
    x = jnp.zeros((1, 2000))
    fmodel = ConvTasNet(**kw)
    fparams = fmodel.init(jax.random.PRNGKey(0), x)["params"]

    q = QuantSpec(qat=True, observer=True, n_splitter=2, n_combiner=2, out_quant=True)
    qmodel = ConvTasNet(q=q, **kw)
    qvars = dict(qmodel.init(jax.random.PRNGKey(1), x))
    merged = merge_float_params(qvars["params"], fparams, 2)

    # QAT-only combiner params preserved
    assert "residual_error_block" in merged["decoder"]
    # encoder widened 1 -> 2 input channels, first block equals float kernel
    ek = merged["encoder"]["conv"]["kernel"]
    assert ek.shape[1] == 2
    np.testing.assert_array_equal(np.asarray(ek[:, :1]), np.asarray(fparams["encoder"]["conv"]["kernel"]))
    # shared weights copied exactly
    np.testing.assert_array_equal(
        np.asarray(merged["masker"]["bottleneck_conv"]["kernel"]),
        np.asarray(fparams["masker"]["bottleneck_conv"]["kernel"]),
    )
    # the merged tree must run
    qvars["params"] = merged
    y = qmodel.apply(qvars, jax.random.uniform(jax.random.PRNGKey(2), (1, 2000), minval=-1, maxval=1))
    assert bool(jnp.isfinite(y).all())


def test_expand_encoder_kernel_zeros_lsb_init():
    """lsb_init='zeros' zeroes the LSB channel groups so the merged model
    computes exactly float(MSB-plane) at load (io_layers.py
    expand_encoder_kernel docstring)."""
    from fqss_tpu.nn.io_layers import expand_encoder_kernel

    k = jax.random.normal(jax.random.PRNGKey(0), (16, 1, 8))
    w = expand_encoder_kernel(k, 2, jax.random.PRNGKey(1), lsb_init="zeros")
    assert w.shape == (16, 2, 8)
    np.testing.assert_array_equal(np.asarray(w[:, 0]), np.asarray(k[:, 0]))
    np.testing.assert_array_equal(np.asarray(w[:, 1]), 0.0)
    # gauss (reference scheme) stays the default and is non-zero
    g = expand_encoder_kernel(k, 2, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(g[:, 1])).max() > 0
