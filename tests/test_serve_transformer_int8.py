"""Int8 serving engines for the transformer models (Sepformer, DPTNet).

Same acceptance criteria as tests/test_serve_int8.py: the engine must agree
with the jitted fake-quant forward at the model's own cross-compilation
grid-noise floor (two compilations of the same quantized net legitimately
differ by one-LSB requant flips; bitwise end-to-end equality between
implementations is not a meaningful criterion — see PARITY.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fqss_tpu.quant import run_observer
from fqss_tpu.quant.spec import QuantSpec


def _snr_db(ref, x):
    err = jnp.sum((x - ref) ** 2)
    return float(10.0 * jnp.log10(jnp.sum(ref**2) / jnp.maximum(err, 1e-30)))


SEP_ARCH = dict(n_srcs=2, kernel_size=8, stride=4, n_filters=32, n_repeats=1,
                n_heads=4, chunk_size=20, n_ffn=48, n_layers=1)


def _ranged(model_cls, q, arch, x, steps=60):
    obs = model_cls(q=dataclasses.replace(q, observer=True), **arch)
    var = dict(obs.init(jax.random.PRNGKey(0), x))
    return run_observer(obs, var, x, steps=steps)


@pytest.mark.slow
def test_sepformer_engine_agrees_at_grid_noise_floor():
    from fqss_tpu.models.sepformer import Sepformer
    from fqss_tpu.serve.sepformer_int8 import SepformerInt8Engine

    q = QuantSpec(qat=True, observer=False, out_quant=True, in_quant=True,
                  n_splitter=2, n_combiner=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 800), minval=-0.9, maxval=0.9)
    var = _ranged(Sepformer, q, SEP_ARCH, x)
    model = Sepformer(q=q, **SEP_ARCH)  # __post_init__ forces train_res_dec
    y_ref = jax.jit(model.apply)(var, x)
    snr_self = _snr_db(y_ref, model.apply(var, x))

    engine = SepformerInt8Engine(model, var, compute_dtype="float32")
    y = engine(x)
    assert y.shape == y_ref.shape
    snr = _snr_db(y_ref, y)
    assert snr >= min(snr_self, 60.0) - 3.0, f"engine SNR {snr:.1f} vs self {snr_self:.1f}"
    # outputs sit on the 8-bit output grid: max error a few grid LSBs
    qp = var["qparams"]["decoder"]["activation_fake_quantize"]
    lsb = (float(np.asarray(qp["max_range"]).reshape(-1)[0])
           - float(np.asarray(qp["min_range"]).reshape(-1)[0])) / 255.0
    assert float(jnp.mean(jnp.abs(y - y_ref))) <= 1.5 * lsb


@pytest.mark.slow
def test_sepformer_engine_single_plane_no_in_quant():
    from fqss_tpu.models.sepformer import Sepformer
    from fqss_tpu.serve.sepformer_int8 import SepformerInt8Engine

    q = QuantSpec(qat=True, observer=False, out_quant=True)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 400), minval=-1.0, maxval=1.0)
    var = _ranged(Sepformer, q, SEP_ARCH, x)
    model = Sepformer(q=q, **SEP_ARCH)
    y_ref = jax.jit(model.apply)(var, x)
    engine = SepformerInt8Engine(model, var, compute_dtype="float32")
    y = engine(x)
    assert y.shape == y_ref.shape
    assert _snr_db(y_ref, y) >= 25.0


def test_sepformer_engine_guards():
    from fqss_tpu.models.sepformer import Sepformer
    from fqss_tpu.serve.sepformer_int8 import SepformerInt8Engine

    q = QuantSpec(qat=True, observer=False, out_quant=True, in_quant=True, in_act_n_bits=16)
    model = Sepformer(q=q, **SEP_ARCH)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 400), minval=-1.0, maxval=1.0)
    var = dict(model.init(jax.random.PRNGKey(0), x))
    with pytest.raises(NotImplementedError):
        SepformerInt8Engine(model, var)


DPT_ARCH = dict(n_srcs=2, kernel_size=2, enc_dim=32, feature_dim=16,
                hidden_dim=16, layer=2, segment_size=20)


@pytest.mark.slow
def test_dptnet_engine_agrees_at_grid_noise_floor():
    from fqss_tpu.models.dptnet import DPTNet
    from fqss_tpu.serve.dptnet_int8 import DPTNetInt8Engine

    q = QuantSpec(qat=True, observer=False, out_quant=True, n_splitter=2, n_combiner=2)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 600), minval=-0.9, maxval=0.9)
    var = _ranged(DPTNet, q, DPT_ARCH, x)
    model = DPTNet(q=q, **DPT_ARCH)
    y_ref = jax.jit(model.apply)(var, x)
    snr_self = _snr_db(y_ref, model.apply(var, x))

    engine = DPTNetInt8Engine(model, var, compute_dtype="float32")
    y = engine(x)
    assert y.shape == y_ref.shape
    snr = _snr_db(y_ref, y)
    assert snr >= min(snr_self, 60.0) - 3.0, f"engine SNR {snr:.1f} vs self {snr_self:.1f}"
