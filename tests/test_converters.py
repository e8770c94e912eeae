"""Float-forward parity of DPTNet/Sepformer/ConvTasNetMusic vs the reference
torch models with converted weights (torch used as test oracle only)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")


def _stub_and_path():
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


def _shapes(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a).shape, tree)


@pytest.mark.slow
def test_dptnet_converter_parity():
    import torch

    _stub_and_path()
    from quantization.qat.models.dptnetq import DPTNetQ

    tm = DPTNetQ(n_spks=2, kernel_size=2, enc_dim=32, feature_dim=16,
                 hidden_dim=16, layer=2, segment_size=20)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import dptnet_params_from_torch
    from fqss_tpu.models.dptnet import DPTNet

    params = dptnet_params_from_torch(sd, layer=2)
    m = DPTNet(n_srcs=2, kernel_size=2, enc_dim=32, feature_dim=16,
               hidden_dim=16, layer=2, segment_size=20)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 400)).astype(np.float32)
    ref_shapes = _shapes(m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    assert ref_shapes == _shapes(params)
    y = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_sepformer_converter_parity():
    import torch

    _stub_and_path()
    from quantization.qat.models.sepformerq import SepformerQ

    tm = SepformerQ(n_spks=2, kernel_size=16, stride=8, n_filters=16,
                    n_repeats=1, n_heads=2, chunk_size=10)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import sepformer_params_from_torch
    from fqss_tpu.models.sepformer import Sepformer

    params = sepformer_params_from_torch(sd, n_repeats=1, n_layers=8)
    m = Sepformer(n_srcs=2, kernel_size=16, stride=8, n_filters=16,
                  n_repeats=1, n_heads=2, chunk_size=10, n_ffn=1024, n_layers=8)
    x = np.random.default_rng(1).uniform(-1, 1, (1, 800)).astype(np.float32)
    ref_shapes = _shapes(m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    assert ref_shapes == _shapes(params)
    y = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-3, atol=5e-4)


def test_convtasnet_music_converter_parity():
    import torch

    _stub_and_path()
    from quantization.qat.models.convtasnetq_music import ConvTasNetMusicQ

    tm = ConvTasNetMusicQ(n_filters=16, kernel=20, stride=10, bn_chan=8,
                          hid_chan=16, n_blocks=2, n_repeats=1)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from fqss_tpu.models.convert import convtasnet_music_params_from_torch
    from fqss_tpu.models.convtasnet_music import ConvTasNetMusic

    params = convtasnet_music_params_from_torch(sd, n_repeats=1, n_blocks=2)
    m = ConvTasNetMusic(n_filters=16, kernel_size=20, stride=10, bn_chan=8,
                        hid_chan=16, n_blocks=2, n_repeats=1)
    x = np.random.default_rng(2).uniform(-1, 1, (1, 2, 1000)).astype(np.float32)
    ref_shapes = _shapes(m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    assert ref_shapes == _shapes(params)
    y = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_htdemucs_float_pth_import_via_factory(tmp_path):
    """HTDemucs float .pth checkpoints dispatch through the factory
    (load_model.py:76-102 create_pretrained_model semantics), including the
    bottom_channels sampler topology."""
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_htdemucs_parity import _install_stubs

    _install_stubs()
    from quantization.qat.models.htdemucsq import HTDemucsQ

    torch.manual_seed(1)
    tm = HTDemucsQ(channels=8, nfft=2048, t_layers=3, t_heads=4, bottom_channels=16,
                   segment=0.5, samplerate=8000, sources=["drums", "bass", "other", "vocals"])
    tm.eval()
    p = str(tmp_path / "htdemucs_float.pth")
    torch.save({"state": tm.state_dict()}, p)

    from fqss_tpu.models.factory import create_pretrained_model

    model_cfg = {
        "name": "HTDemucs", "model_path": p,
        "sources": ["drums", "bass", "other", "vocals"], "audio_channels": 2,
        "channels": 8, "nfft": 2048, "t_layers": 3, "t_heads": 4, "bottom_channels": 16,
        "segment": 0.5, "samplerate": 8000,
        "quantization": {"qat": False},
    }
    x = np.random.default_rng(2).uniform(-1, 1, (1, 2, 4000)).astype(np.float32)
    model, variables = create_pretrained_model(model_cfg, jnp.asarray(x))
    y = np.asarray(model.apply(variables, jnp.asarray(x), train=True))
    with torch.no_grad():
        yt = tm(torch.tensor(x)).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(y, yt, rtol=5e-3, atol=2e-3)
