"""Quantized-forward parity: the full QAT ConvTasNet pipeline vs the
reference post-surgery torch model with an imported QAT state.

This is the end-to-end bit-faithfulness check of the whole quantized stack:
splitter -> quantized encoder -> TCN with all act/weight quantizers at the
reference's learned ranges -> mask mul -> combiner decoder with residual
error block -> combiner. Torch is the oracle only.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")


def _load_reference():
    import types

    for name in ("torchmetrics", "torchmetrics.audio", "torchmetrics.audio.stoi", "torchaudio"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchmetrics"].ScaleInvariantSignalNoiseRatio = object
    sys.modules["torchmetrics"].SignalDistortionRatio = object
    sys.modules["torchmetrics.audio.stoi"].ShortTimeObjectiveIntelligibility = object
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        for name in ("matplotlib", "matplotlib.pyplot"):
            sys.modules.setdefault(name, types.ModuleType(name))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # load_model imports htdemucsq -> stub its demucs/openunmix/julius deps
    from test_htdemucs_parity import _install_stubs

    _install_stubs()
    from quantization.qat.models.convtasnetq import ConvTasNetQ
    from quantization.qat.models.load_model import enable_observer, quantize_model

    return ConvTasNetQ, quantize_model, enable_observer


@pytest.mark.slow
def test_quantized_forward_parity_convtasnet():
    import torch

    ConvTasNetQ, quantize_model, enable_observer = _load_reference()
    torch.manual_seed(0)
    tm = ConvTasNetQ(n_spks=2, kernel_size=16, stride=8)
    quant_cfg = {
        "qat": True, "gradient_based": True,
        "weight_quant": True, "weight_n_bits": 8,
        "act_quant": True, "act_n_bits": 8,
        "in_quant": False, "out_quant": True, "out_act_n_bits": 8,
        "n_splitter": 2, "n_combiner": 2, "observer": True,
    }
    tm = quantize_model(tm, quant_cfg)
    tm.eval()

    # Drive the observers with a few batches (weight one-shot + act EMA),
    # then freeze like val.py:197-198.
    rng = np.random.default_rng(0)
    with torch.no_grad():
        for i in range(3):
            xb = torch.tensor(rng.uniform(-1, 1, (1, 4000)).astype(np.float32))
            tm(xb)
    enable_observer(tm, False)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import convtasnet_qat_from_torch
    from fqss_tpu.models.convtasnet import ConvTasNet
    from fqss_tpu.quant import QuantSpec

    params, qparams = convtasnet_qat_from_torch(sd)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    m = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, q=q)

    x = rng.uniform(-1, 1, (1, 4000)).astype(np.float32)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # tree congruence (params and qparams both)
    for col, got in (("params", params), ("qparams", qparams)):
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_vars[col])
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, got)
        assert ref_shapes == got_shapes, col

    variables = {"params": params, "qparams": qparams, "qstats": init_vars["qstats"]}
    y = np.asarray(m.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape

    # Layer-level bit parity: on identical inputs a single quantized layer is
    # ~99% bitwise-exact with the torch pipeline; residual differences are
    # exactly one act-LSB (backend division ULPs flip rounding ties).
    from fqss_tpu.nn import QConv1d

    conv_in = QConv1d(512, 1, nl="prelu", q=q)
    xin = rng.standard_normal((1, 497, 128)).astype(np.float32) * 0.1
    lv = {"params": params["masker"]["tcn_0_0"]["conv_in"],
          "qparams": qparams["masker"]["tcn_0_0"]["conv_in"],
          "qstats": conv_in.init(jax.random.PRNGKey(1), jnp.asarray(xin))["qstats"]}
    mine = np.asarray(conv_in.apply(lv, jnp.asarray(xin)))
    with torch.no_grad():
        theirs = tm.masker.TCN[0].shared_block[0](torch.tensor(xin.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    lsb = float((sd["masker.TCN.0.shared_block.0.activation_fake_quantize.max_range"]
                 - sd["masker.TCN.0.shared_block.0.activation_fake_quantize.min_range"]) / 255)
    d = np.abs(mine - theirs)
    assert (d < 1e-7).mean() > 0.95, (d < 1e-7).mean()
    assert d.max() <= lsb * 1.01, (d.max(), lsb)

    # Whole-model: one-LSB tie flips compound through 24 quantized blocks
    # (as they would across torch CPU/CUDA); require the two pipelines'
    # separations to agree to > 20 dB SI-SDR and > 0.99 correlation.
    num = float(np.sum(yt**2))
    den = float(np.sum((y - yt) ** 2)) + 1e-12
    agreement_db = 10 * np.log10(num / den)
    assert agreement_db > 20.0, agreement_db
    c = np.corrcoef(y.ravel(), yt.ravel())[0, 1]
    assert c > 0.99, c


@pytest.mark.slow
def test_quantized_forward_parity_dptnet():
    """DPTNet QAT-state import: transformer (MHA+LSTM-FFN) quantizer sites
    loaded from the reference post-surgery state; outputs must agree."""
    import torch

    _load_reference()
    from quantization.qat.models.dptnetq import DPTNetQ
    from quantization.qat.models.load_model import enable_observer, quantize_model

    torch.manual_seed(0)
    tm = DPTNetQ(n_spks=2, kernel_size=2, enc_dim=32, feature_dim=16,
                 hidden_dim=16, layer=1, segment_size=20)
    quant_cfg = {
        "qat": True, "gradient_based": True,
        "weight_quant": True, "weight_n_bits": 8,
        "act_quant": True, "act_n_bits": 8,
        "in_quant": False, "out_quant": True, "out_act_n_bits": 8,
        "n_splitter": 2, "n_combiner": 2, "observer": True,
    }
    tm = quantize_model(tm, quant_cfg)
    tm.eval()
    rng = np.random.default_rng(3)
    with torch.no_grad():
        for _ in range(3):
            tm(torch.tensor(rng.uniform(-1, 1, (1, 400)).astype(np.float32)))
    enable_observer(tm, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import dptnet_qat_from_torch
    from fqss_tpu.models.dptnet import DPTNet
    from fqss_tpu.quant import QuantSpec

    params, qparams = dptnet_qat_from_torch(sd, layer=1)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    m = DPTNet(n_srcs=2, kernel_size=2, enc_dim=32, feature_dim=16,
               hidden_dim=16, layer=1, segment_size=20, q=q)

    x = rng.uniform(-1, 1, (1, 400)).astype(np.float32)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    for col, got in (("params", params), ("qparams", qparams)):
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_vars[col])
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, got)
        assert ref_shapes == got_shapes, col

    variables = {"params": params, "qparams": qparams, "qstats": init_vars["qstats"]}
    y = np.asarray(m.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    num = float(np.sum(yt**2))
    den = float(np.sum((y - yt) ** 2)) + 1e-12
    agreement_db = 10 * np.log10(num / den)
    assert agreement_db > 20.0, agreement_db
    c = np.corrcoef(y.ravel(), yt.ravel())[0, 1]
    assert c > 0.99, c


def _tree_shapes_match(init_vars, params, qparams):
    import jax.tree_util as jtu

    for col, got in (("params", params), ("qparams", qparams)):
        ref_shapes = jtu.tree_map(lambda a: a.shape, init_vars[col])
        got_shapes = jtu.tree_map(lambda a: np.asarray(a).shape, got)
        assert ref_shapes == got_shapes, col


def _agreement_db(y, yt):
    num = float(np.sum(yt**2))
    den = float(np.sum((y - yt) ** 2)) + 1e-12
    return 10 * np.log10(num / den)


@pytest.mark.slow
def test_quantized_forward_parity_sepformer():
    """Sepformer QAT-state import (sepformerq.py:441-527): the post-surgery
    reference state (weights + learned ranges, incl. the TRAINABLE residual
    decoder of the combiner) loads into this framework and the quantized
    forwards agree."""
    import torch

    _load_reference()
    from quantization.qat.models.load_model import enable_observer, quantize_model
    from quantization.qat.models.sepformerq import SepformerQ

    torch.manual_seed(0)
    tm = SepformerQ(n_spks=2, kernel_size=16, stride=8, n_filters=32, n_repeats=1, n_heads=4, chunk_size=20)
    # shrink the per-layer stack for test speed
    quant_cfg = {
        "qat": True, "gradient_based": True,
        "weight_quant": True, "weight_n_bits": 8,
        "act_quant": True, "act_n_bits": 8,
        "in_quant": False, "out_quant": True, "out_act_n_bits": 8,
        "n_splitter": 2, "n_combiner": 2, "observer": True,
    }
    tm = quantize_model(tm, quant_cfg)
    tm.eval()
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for _ in range(3):
            tm(torch.tensor(rng.uniform(-1, 1, (1, 800)).astype(np.float32)))
    enable_observer(tm, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import sepformer_qat_from_torch
    from fqss_tpu.models.sepformer import Sepformer
    from fqss_tpu.quant import QuantSpec

    params, qparams = sepformer_qat_from_torch(sd, n_repeats=1, n_layers=8)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    m = Sepformer(n_srcs=2, kernel_size=16, stride=8, n_filters=32, n_repeats=1, n_heads=4,
                  chunk_size=20, q=q)

    x = rng.uniform(-1, 1, (1, 800)).astype(np.float32)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _tree_shapes_match(init_vars, params, qparams)
    variables = {"params": params, "qparams": qparams, "qstats": init_vars["qstats"]}
    y = np.asarray(m.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    db = _agreement_db(y, yt)
    assert db > 20.0, db
    c = np.corrcoef(y.ravel(), yt.ravel())[0, 1]
    assert c > 0.99, c


@pytest.mark.slow
def test_quantized_forward_parity_convtasnet_music():
    """ConvTasNetMusic QAT-state import (convtasnetq_music.py:269-333):
    post-surgery reference state -> (params, qparams); quantized forwards
    agree (shared-weight combiner, train_res_dec=False)."""
    import torch

    _load_reference()
    from quantization.qat.models.convtasnetq_music import ConvTasNetMusicQ
    from quantization.qat.models.load_model import enable_observer, quantize_model

    torch.manual_seed(0)
    tm = ConvTasNetMusicQ(n_filters=16, kernel=20, stride=10, bn_chan=8, hid_chan=16,
                          n_blocks=2, n_repeats=1)
    quant_cfg = {
        "qat": True, "gradient_based": True,
        "weight_quant": True, "weight_n_bits": 8,
        "act_quant": True, "act_n_bits": 8,
        "in_quant": False, "out_quant": True, "out_act_n_bits": 8,
        "n_splitter": 2, "n_combiner": 2, "observer": True,
    }
    tm = quantize_model(tm, quant_cfg)
    tm.eval()
    rng = np.random.default_rng(6)
    with torch.no_grad():
        for _ in range(3):
            tm(torch.tensor(rng.uniform(-1, 1, (1, 2, 2000)).astype(np.float32)))
    enable_observer(tm, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import convtasnet_music_qat_from_torch
    from fqss_tpu.models.convtasnet_music import ConvTasNetMusic
    from fqss_tpu.quant import QuantSpec

    params, qparams = convtasnet_music_qat_from_torch(sd, n_repeats=1, n_blocks=2)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    m = ConvTasNetMusic(n_filters=16, kernel_size=20, stride=10, bn_chan=8, hid_chan=16,
                        n_blocks=2, n_repeats=1, q=q)

    x = rng.uniform(-1, 1, (1, 2, 2000)).astype(np.float32)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _tree_shapes_match(init_vars, params, qparams)
    variables = {"params": params, "qparams": qparams, "qstats": init_vars["qstats"]}
    y = np.asarray(m.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    db = _agreement_db(y, yt)
    assert db > 20.0, db
    c = np.corrcoef(y.ravel(), yt.ravel())[0, 1]
    assert c > 0.99, c
