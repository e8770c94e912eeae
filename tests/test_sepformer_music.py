"""Sepformer and ConvTasNetMusic forward/quant-plan tests (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.models.convtasnet_music import ConvTasNetMusic
from fqss_tpu.models.sepformer import Sepformer, sinusoidal_pe
from fqss_tpu.quant import QPARAMS, QuantSpec


def test_sinusoidal_pe_matches_torch_reference_formula():
    import math

    import torch

    max_len, d = 20, 8
    pe = torch.zeros(max_len, d)
    positions = torch.arange(0, max_len).unsqueeze(1).float()
    denominator = torch.exp(torch.arange(0, d, 2).float() * -(math.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(positions * denominator)
    pe[:, 1::2] = torch.cos(positions * denominator)
    np.testing.assert_allclose(sinusoidal_pe(max_len, d), pe.numpy(), atol=1e-6)


@pytest.mark.slow
def test_sepformer_forward_float_and_qat():
    kw = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=16, n_repeats=1,
              n_heads=2, chunk_size=10, n_ffn=16, n_layers=1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 800), minval=-1, maxval=1)

    m = Sepformer(**kw)
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    assert y.shape[:2] == (1, 2) and abs(y.shape[2] - 800) < 16

    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    mq = Sepformer(q=q, **kw)
    # train_res_dec forced on for the sepformer combiner (sepformerq.py:501)
    assert mq.q.train_res_dec
    vq = mq.init(jax.random.PRNGKey(1), x)
    yq = mq.apply(vq, x)
    assert yq.shape[:2] == (1, 2)
    assert bool(jnp.isfinite(yq).all())
    # trainable residual decoder exists in the combiner
    assert "residual_decoder_kernel" in vq["params"]["decoder"]["residual_error_block"]
    # quant plan: pos const + pos add + norms + mha + ffn sites
    blk = vq[QPARAMS]["masker"]["dp_0"]["intra_transformer_block"]
    for key in ("pos_const", "pos_add", "norm", "layer_0"):
        assert key in blk, sorted(blk)
    for key in ("norm1", "norm2", "mha", "ffn_in", "ffn_relu", "ffn_out"):
        assert key in blk["layer_0"], sorted(blk["layer_0"])


def test_convtasnet_music_forward_float_and_qat():
    kw = dict(sources=("drums", "bass", "other", "vocals"), audio_channels=2,
              n_filters=16, kernel_size=20, stride=10, bn_chan=8, hid_chan=16,
              conv_kernel=3, n_blocks=2, n_repeats=1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 1000), minval=-1, maxval=1)

    m = ConvTasNetMusic(**kw)
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    assert y.shape[:3] == (1, 4, 2)  # [B, sources, audio_channels, T]
    assert abs(y.shape[-1] - 1000) < 20

    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    mq = ConvTasNetMusic(q=q, **kw)
    vq = mq.init(jax.random.PRNGKey(1), x)
    yq = mq.apply(vq, x)
    assert yq.shape[:3] == (1, 4, 2)
    assert bool(jnp.isfinite(yq).all())
    # splitter widened input channels: encoder sees 2*2=4 channels
    assert vq["params"]["encoder"]["conv"]["kernel"].shape[1] == 4
    # DS conv quant plan
    tcn = vq[QPARAMS]["separator"]["tcn_0_0"]
    for key in ("conv1x1", "norm", "dsconv", "add"):
        assert key in tcn, sorted(tcn)


def test_factory_builds_all_wired_models():
    from fqss_tpu.models.factory import create_model

    for name, extra in (
        ("ConvTasNet", {}),
        ("DPTNet", {}),
        ("Sepformer", {}),
        ("ConvTasNetMusic", {}),
    ):
        cfg = {"name": name, "quantization": {"qat": True, "n_splitter": 2, "n_combiner": 2}, **extra}
        m = create_model(cfg)
        assert m.q.qat
