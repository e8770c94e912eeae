"""Legacy HDemucs (hdemucsq.py) assembly tests.

The MultiWrap invariant is the reference's own definition (hdemucsq.py:
166-169): "if the N replica have the same weights, then this is exactly
equivalent to applying the original module on all frequencies" — checked
here by copying one unsplit layer's weights into every band.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.models.demucs_blocks import HDecLayer, HEncLayer
from fqss_tpu.models.hdemucs import HDemucs, MultiWrap
from fqss_tpu.quant import QuantSpec

FLOATQ = QuantSpec()


@pytest.mark.slow
def test_multiwrap_encoder_equals_unsplit():
    kw = dict(chout=8, kernel_size=8, stride=4, freq=True, norm=False,
              context=0, dconv_depth=1, dconv_comp=2.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 10, 4)).astype(np.float32))

    base = HEncLayer(pad=True, q=FLOATQ, **kw)
    vb = base.init(jax.random.PRNGKey(0), x)
    y_base = base.apply(vb, x)

    mw = MultiWrap(split_ratios=(0.4,), is_enc=True, layer_kw=kw, q=FLOATQ)
    vm = mw.init(jax.random.PRNGKey(1), x)
    # same weights in every band -> exact equivalence
    params = {f"band_{k}": vb["params"] for k in range(2)}
    y_mw = mw.apply({"params": params}, x)
    assert y_mw.shape == y_base.shape
    np.testing.assert_allclose(np.asarray(y_mw), np.asarray(y_base), atol=2e-5)


def test_multiwrap_decoder_equals_unsplit():
    # context_freq=False keeps bands independent (the reference asserts it)
    kw = dict(chin=8, chout=4, kernel_size=8, stride=4, freq=True, norm=False,
              context=1, context_freq=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 10, 8)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((1, 16, 10, 8)).astype(np.float32))

    base = HDecLayer(pad=True, last=False, q=FLOATQ, **kw)
    vb = base.init(jax.random.PRNGKey(0), x, skip, None)
    z_base, _ = base.apply(vb, x, skip, None)

    mw = MultiWrap(split_ratios=(0.5,), is_enc=False, layer_kw=dict(kw, last=False), q=FLOATQ)
    vm = mw.init(jax.random.PRNGKey(1), x, skip, None)
    # bands share the unsplit weights; the conv_tr bias moves to the
    # MultiWrap band bias params (seam arithmetic needs it separated)
    base_p = jax.device_get(vb["params"])
    bias = base_p["conv_tr"].pop("bias")
    params = {}
    for k in range(2):
        params[f"band_{k}"] = jax.tree_util.tree_map(lambda a: a, base_p)
        params[f"band_{k}_bias"] = bias
    z_mw, _ = mw.apply({"params": params}, x, skip, None)
    assert z_mw.shape == z_base.shape
    np.testing.assert_allclose(np.asarray(z_mw), np.asarray(z_base), atol=2e-5)


@pytest.fixture(scope="module")
def tiny_cfg():
    # nfft must satisfy hop == stride^(merge depth) so the time branch lands
    # on the spectral frame rate at the inject merge (the reference asserts
    # the same alignment, hdemucsq.py:146); 1024 -> merge at index 3.
    return dict(channels=4, nfft=1024, depth=6, norm_starts=4, dconv_lstm=4,
                dconv_attn=4, dconv_comp=2.0, samplerate=8000, segment=0.5)


@pytest.mark.slow
def test_hdemucs_legacy_forward_cac(tiny_cfg):
    m = HDemucs(**tiny_cfg)
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (1, 2, 4000)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 2, 4000)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_hdemucs_legacy_forward_wiener_and_multifreq(tiny_cfg):
    """cac=False exercises the openunmix EM Wiener output stage
    (hdemucsq.py:678-704); multi_freqs exercises MultiWrap in-model."""
    m = HDemucs(cac=False, wiener_iters=1, multi_freqs=(0.5,), multi_freqs_depth=2, **tiny_cfg)
    x = jnp.asarray(np.random.default_rng(3).uniform(-0.5, 0.5, (1, 2, 4000)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 2, 4000)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_hdemucs_legacy_qat_factory(tiny_cfg):
    from fqss_tpu.models.factory import create_model

    cfg = {"name": "HDemucsLegacy", "sources": ["drums", "bass", "other", "vocals"],
           **tiny_cfg,
           "quantization": {"qat": True, "observer": True, "n_splitter": 2,
                            "n_combiner": 2, "out_quant": True}}
    m = create_model(cfg)
    x = jnp.asarray(np.random.default_rng(4).uniform(-0.5, 0.5, (1, 2, 4000)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert "qparams" in v  # quantizer sites exist
    y = m.apply(dict(v), x, mutable=["qparams", "qstats"])[0]
    assert y.shape == (1, 4, 2, 4000)
    assert bool(jnp.isfinite(y).all())
