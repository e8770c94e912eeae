"""HTDemucs partial-int8 engine tests.

The engine re-uses the (weight-folded) model forward for the conv branches
and swaps only the transformer block (bottom_channels up/downsamplers +
cross-domain transformer) for the hand-written int8 dataflow — so the test
pyramid is (1) block-level exactness of the override against the model's
own CrossTransformerEncoder on the captured boundary tensors, and (2) the
usual end-to-end grid-noise-floor agreement (see tests/test_serve_int8.py
for why bitwise equality between two compilations is not meaningful).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fqss_tpu.models.htdemucs import HTDemucs
from fqss_tpu.quant import run_observer
from fqss_tpu.quant.spec import QuantSpec

TINY = dict(channels=8, nfft=512, t_layers=3, t_heads=4, segment=0.5, samplerate=8000)


def _snr_db(ref, x):
    err = jnp.sum((x - ref) ** 2)
    return float(10.0 * jnp.log10(jnp.sum(ref**2) / jnp.maximum(err, 1e-30)))


def _ranged(q, arch, x, steps=60):
    obs = HTDemucs(q=dataclasses.replace(q, observer=True), **arch)
    var = dict(obs.init(jax.random.PRNGKey(0), x))
    return run_observer(obs, var, x, steps=steps)


def _mix(key, batch=1, t=4000):
    return jax.random.uniform(key, (batch, 2, t), minval=-0.9, maxval=0.9)


@pytest.mark.slow
def test_htdemucs_engine_transformer_block_exact():
    """Override output == the model's CrossTransformerEncoder output on the
    captured boundary tensors (bottom_channels=0: identical boundaries)."""
    from fqss_tpu.serve.htdemucs_int8 import HTDemucsInt8Engine

    q = QuantSpec(qat=True, observer=False, out_quant=True, n_splitter=2, n_combiner=2)
    x = _mix(jax.random.PRNGKey(1))
    var = _ranged(q, TINY, x)
    model = HTDemucs(q=q, **TINY)

    _, inter = model.apply(
        var, x,
        capture_intermediates=lambda mdl, name: mdl.name in (
            "encoder_3", "tencoder_3", "crosstransformer"),
    )
    caps = inter["intermediates"]
    x_in = caps["encoder_3"]["__call__"][0]
    xt_in = caps["tencoder_3"]["__call__"][0]
    x_ref, xt_ref = caps["crosstransformer"]["__call__"][0]

    engine = HTDemucsInt8Engine(model, var, compute_dtype="float32")
    x_out, xt_out = jax.jit(engine._transformer)(x_in, xt_in)
    assert x_out.shape == x_ref.shape and xt_out.shape == xt_ref.shape
    snr_x, snr_t = _snr_db(x_ref, x_out), _snr_db(xt_ref, xt_out)
    assert snr_x >= 55.0, f"freq-branch transformer SNR {snr_x:.1f} dB"
    assert snr_t >= 55.0, f"time-branch transformer SNR {snr_t:.1f} dB"


@pytest.mark.slow
def test_htdemucs_engine_end_to_end_bottom_channels():
    from fqss_tpu.serve.htdemucs_int8 import HTDemucsInt8Engine

    arch = dict(TINY, bottom_channels=32)
    q = QuantSpec(qat=True, observer=False, out_quant=True, in_quant=True,
                  n_splitter=2, n_combiner=2)
    x = _mix(jax.random.PRNGKey(2))
    var = _ranged(q, arch, x)
    model = HTDemucs(q=q, **arch)
    y_ref = jax.jit(model.apply)(var, x)
    snr_self = _snr_db(y_ref, model.apply(var, x))

    engine = HTDemucsInt8Engine(model, var, compute_dtype="float32")
    y = engine(x)
    assert y.shape == y_ref.shape
    snr = _snr_db(y_ref, y)
    assert snr >= min(snr_self, 60.0) - 3.0, f"engine SNR {snr:.1f} vs self {snr_self:.1f}"


def test_htdemucs_engine_guards():
    from fqss_tpu.serve.htdemucs_int8 import HTDemucsInt8Engine

    model = HTDemucs(q=QuantSpec(qat=True, observer=False, act_n_bits=6), **TINY)
    with pytest.raises((NotImplementedError, ValueError)):
        HTDemucsInt8Engine(model, {"params": {}, "qparams": {}})
    no_t = HTDemucs(q=QuantSpec(qat=True, observer=False), **dict(TINY, t_layers=0))
    with pytest.raises(NotImplementedError):
        HTDemucsInt8Engine(no_t, {"params": {}, "qparams": {}})


def test_make_int8_engine_dispatches_htdemucs():
    from fqss_tpu.serve import make_int8_engine
    from fqss_tpu.serve.htdemucs_int8 import HTDemucsInt8Engine  # noqa: F401

    # dispatch reaches the HTDemucs engine class (spec guard fires inside it,
    # proving dispatch no longer raises the "no int8 engine" fall-through)
    model = HTDemucs(q=QuantSpec(qat=True, observer=False, act_n_bits=6), **TINY)
    with pytest.raises((NotImplementedError, ValueError)) as ei:
        make_int8_engine(model, {"params": {}, "qparams": {}})
    assert "no int8 engine" not in str(ei.value)
