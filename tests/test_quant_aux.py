"""Calibration, export-grid, Wiener, and legacy-block tests."""

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.quant import QPARAMS, QSTATS, QuantSpec
from fqss_tpu.quant.calibration import calibrate_mse_quantizers, mse_minmax_range
from fqss_tpu.quant.export import export_quantizer_grids, freeze_activation_grid, freeze_weight_grid
from fqss_tpu.quant.quantizers import MseActQuantizer


def test_mse_calibration_pipeline():
    """Observer accumulates histograms -> host grid search -> quantize."""
    q = MseActQuantizer(n_bits=8, observer=True, max_observations=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (4, 256)).astype(np.float32))
    v = dict(q.init(jax.random.PRNGKey(0), x))
    for _ in range(3):
        y, upd = q.apply(v, x, mutable=[QPARAMS, QSTATS])
        v.update(upd)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))  # float during observe

    assert float(np.asarray(v[QSTATS]["hist"]).sum()) > 0
    v2 = calibrate_mse_quantizers(v, n_bits=8, n_grid=20)
    assert bool(v2[QSTATS]["calibrated"])
    mn, mx = float(v2[QPARAMS]["min_range"][0]), float(v2[QPARAMS]["max_range"][0])
    assert mn < 0 < mx
    # ranges should hug the distribution (clip outliers for MSE optimality)
    assert mn >= float(x.min()) - 1e-6 and mx <= float(x.max()) + 1e-6
    y = q.apply(v2, x)
    assert not np.allclose(np.asarray(y), np.asarray(x))  # now quantizing


def test_mse_minmax_range_prefers_tight_ranges():
    # histogram heavily concentrated near 0 with a far outlier bin
    hist = np.zeros(512)
    hist[250:262] = 100.0
    hist[511] = 1.0  # outlier
    mn, mx = mse_minmax_range(hist, -1.0, 1.0, n_bits=4, n_grid=20)
    # the search tightens the empty low side toward the mass near 0
    assert mn > -0.9, (mn, mx)


def test_freeze_grids_match_reference_semantics():
    mn = np.array([[-0.6], [-0.2]])  # per-channel
    mx = np.array([[0.4], [0.8]])
    g = freeze_weight_grid(mn, mx, 8, sign=True)
    np.testing.assert_allclose(g["scales"], np.maximum(np.abs(mn), np.abs(mx)).reshape(-1) / 128)
    assert g["quant_min"] == -128 and g["quant_max"] == 127

    a = freeze_activation_grid(np.array([-0.5]), np.array([0.5]), 8)
    np.testing.assert_allclose(float(a["scale"]), 1.0 / 255, rtol=1e-6)
    # zp = -round(min/scale) since min < 0 (qat_quant.py:44-45)
    assert int(a["zero_point"]) == 128 or int(a["zero_point"]) == 127


def test_export_quantizer_grids_walks_model():
    from fqss_tpu.nn import QDense

    m = QDense(features=4, q=QuantSpec(qat=True, observer=False))
    v = dict(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8))))
    grids = export_quantizer_grids(v)
    assert grids["weight_fake_quantize"]["kind"] == "per_channel"
    assert grids["weight_fake_quantize"]["scales"].shape == (4,)
    assert grids["activation_fake_quantize"]["kind"] == "per_tensor"


def test_export_single_channel_weight_grid_stays_per_channel():
    """A Co=1 per-channel weight quantizer (size-1 ranges) must export the
    symmetric per-channel grid, not the asymmetric activation grid
    (regression: dispatch was on range size, so e.g. the ConvTasNet decoder
    ConvTranspose1d with one output channel froze to the wrong formula)."""
    from fqss_tpu.nn import QDense

    m = QDense(features=1, q=QuantSpec(qat=True, observer=False))
    v = dict(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8))))
    grids = export_quantizer_grids(v)
    g = grids["weight_fake_quantize"]
    assert g["kind"] == "per_channel" and g["scales"].shape == (1,)
    assert g["quant_min"] == -128 and int(g["zero_points"][0]) == 0


def test_wiener_improves_over_ratio_mask_consistency():
    from fqss_tpu.ops.stft import stft
    from fqss_tpu.ops.wiener import wiener

    rng = np.random.default_rng(1)
    s1 = rng.standard_normal((2, 4096)).astype(np.float32)
    s2 = rng.standard_normal((2, 4096)).astype(np.float32) * 0.5
    z1 = stft(jnp.asarray(s1), 512, 128)  # [C, F, T]
    z2 = stft(jnp.asarray(s2), 512, 128)
    mix = (z1 + z2).transpose(1, 2, 0)  # [F, T, C]
    mags = jnp.stack([jnp.abs(z1), jnp.abs(z2)], axis=-1).transpose(1, 2, 0, 3)  # [F, T, C, S]
    y = wiener(mags, mix, n_iter=1)
    assert y.shape == mags.shape
    # separated sources must sum close to the mixture (conservative filter)
    recon = jnp.sum(y, axis=-1)
    err = float(jnp.abs(recon - mix).max()) / float(jnp.abs(mix).max())
    assert err < 0.35, err
    # oracle magnitudes: each estimate correlates with its source
    c1 = float(jnp.abs(jnp.vdot(y[..., 0], z1.transpose(1, 2, 0))))
    c2 = float(jnp.abs(jnp.vdot(y[..., 0], z2.transpose(1, 2, 0))))
    assert c1 > c2


def test_blstm_and_localstate_blocks():
    from fqss_tpu.models.demucs_blocks import BLSTM, LocalState

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 8))
    m = BLSTM(dim=8, layers=1, max_steps=20, skip=True)
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    # short input (no framing) path
    y2 = m.apply(v, x[:, :16])
    assert y2.shape == (2, 16, 8)

    ls = LocalState(channels=8, heads=2, ndecay=2)
    vl = ls.init(jax.random.PRNGKey(2), x)
    yl = ls.apply(vl, x)
    assert yl.shape == x.shape and bool(jnp.isfinite(yl).all())
