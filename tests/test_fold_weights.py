"""Serving weight-fold: pre-applying weight fake-quant == per-forward fq.

fold_quantized_weights must leave the forward bitwise unchanged for every
model family's layer kinds (convs, dense, LSTM, MHA weight quantizers).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.models import ConvTasNet
from fqss_tpu.quant import QuantSpec
from fqss_tpu.serve import fold_quantized_weights

ARCH = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=8, hid_chan=16, n_blocks=2, n_repeats=1)


def _ranged(q, x):
    from fqss_tpu.quant import run_observer

    obs = ConvTasNet(q=dataclasses.replace(q, observer=True), **ARCH)
    var = dict(obs.init(jax.random.PRNGKey(0), x))
    return run_observer(obs, var, x, steps=55)


@pytest.mark.slow
def test_fold_weights_convtasnet_bitwise():
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNet(q=q, **ARCH)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 3200), minval=-1.0, maxval=1.0)
    var = _ranged(q, x)
    y_ref = model.apply(var, x)

    smodel, svar = fold_quantized_weights(model, var)
    assert smodel.q.weight_quant is False
    y = smodel.apply(svar, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


@pytest.mark.slow
def test_fold_weights_music_linear_decoder_bitwise():
    """QLinearDecoder with n_combiner=2: the Dense combiner's
    residual_encoder_kernel (quantizer scope 'weight_fake_quantize',
    nn/io_layers.py:271-272) must be folded too — a fold that skips it
    serves an unquantized weight once weight_quant is disabled."""
    from fqss_tpu.models.convtasnet_music import ConvTasNetMusic

    arch = dict(sources=("a", "b"), audio_channels=2, n_filters=16, kernel_size=20,
                stride=10, bn_chan=8, hid_chan=16, conv_kernel=3, n_blocks=2, n_repeats=1)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNetMusic(q=q, **arch)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 2, 2000), minval=-0.9, maxval=0.9)

    from fqss_tpu.quant import run_observer

    obs = ConvTasNetMusic(q=dataclasses.replace(q, observer=True), **arch)
    var = dict(obs.init(jax.random.PRNGKey(0), x))
    var = run_observer(obs, var, x, steps=55)
    y_ref = model.apply(var, x)

    smodel, svar = fold_quantized_weights(model, var)
    # the residual-encoder weight must actually change (it is quantized)
    w0 = np.asarray(var["params"]["decoder"]["residual_error_block"]["residual_encoder_kernel"])
    w1 = np.asarray(svar["params"]["decoder"]["residual_error_block"]["residual_encoder_kernel"])
    assert not np.array_equal(w0, w1), "fold left residual_encoder_kernel untouched"
    y = smodel.apply(svar, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_fold_weights_lstm_attention_bitwise():
    import flax.linen as nn

    from fqss_tpu.nn.attention import QMultiheadAttention
    from fqss_tpu.nn.lstm import QLSTM

    class Tiny(nn.Module):
        q: QuantSpec

        @nn.compact
        def __call__(self, x):
            h = QLSTM(hidden_size=16, bidirectional=True, q=self.q, name="lstm")(x)
            return QMultiheadAttention(embed_dim=32, num_heads=4, q=self.q, name="mha")(h, h, h)

    from fqss_tpu.quant import run_observer

    q = QuantSpec(qat=True, observer=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 24))
    obs = Tiny(q=dataclasses.replace(q, observer=True))
    var = dict(obs.init(jax.random.PRNGKey(1), x))
    var = run_observer(obs, var, x, steps=55)
    model = Tiny(q=q)
    y_ref = model.apply(var, x)
    smodel, svar = fold_quantized_weights(model, var)
    y = smodel.apply(svar, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
