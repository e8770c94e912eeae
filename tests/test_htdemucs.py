"""HTDemucs tests: STFT torch parity, spec/ispec round trip, forwards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from fqss_tpu.models.htdemucs import HTDemucs, create_2d_sin_embedding, create_sin_embedding
from fqss_tpu.ops.stft import istft, stft
from fqss_tpu.quant import QPARAMS, QuantSpec

TINY = dict(channels=8, nfft=512, t_layers=3, t_heads=4, segment=0.5, samplerate=8000)


def test_stft_matches_torch():
    x = np.random.default_rng(0).standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 512, 128
    z = stft(jnp.asarray(x), n_fft, hop)
    zt = torch.stft(
        torch.tensor(x), n_fft, hop, window=torch.hann_window(n_fft), win_length=n_fft,
        normalized=True, center=True, pad_mode="reflect", return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(z.real), zt.real.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(z.imag), zt.imag.numpy(), atol=2e-5)


def test_istft_matches_torch_and_roundtrips():
    x = np.random.default_rng(1).standard_normal(8192).astype(np.float32)
    n_fft, hop = 512, 128
    z = stft(jnp.asarray(x), n_fft, hop)
    y = istft(z, n_fft, hop, length=len(x))
    zt = torch.stft(torch.tensor(x), n_fft, hop, window=torch.hann_window(n_fft),
                    normalized=True, center=True, pad_mode="reflect", return_complex=True)
    yt = torch.istft(zt, n_fft, hop, window=torch.hann_window(n_fft),
                     normalized=True, center=True, length=len(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-5)


def test_istft_gradient_flows():
    """The HTDemucs loss is time-domain through the iSTFT — grads must flow."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal(2048).astype(np.float32))

    def loss(x):
        z = stft(x, 256, 64)
        y = istft(z, 256, 64, length=2048)
        return jnp.sum(y**2)

    g = jax.grad(loss)(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_spec_ispec_matches_torch_reference():
    """_spec/_ispec must match a torch transcription of htdemucsq.py:931-961.

    Note the pair is intentionally lossy at chunk edges (frames [2:2+le] are
    trimmed and the last freq bin is dropped) — parity with the reference,
    not perfect reconstruction, is the contract.
    """
    import math

    import torch.nn.functional as F

    m = HTDemucs(**TINY)
    nfft, hl = m.nfft, m.hop_length
    xn = np.random.default_rng(0).standard_normal((1, 2, 4000)).astype(np.float32)
    x = jnp.asarray(xn)
    z = m._spec(x)
    assert z.shape[-2] == m.nfft // 2  # last bin dropped
    y = m._ispec(z, 4000)

    xt = torch.tensor(xn)
    le = int(math.ceil(xt.shape[-1] / hl))
    pad = hl // 2 * 3
    xp = F.pad(xt, (pad, pad + le * hl - xt.shape[-1]), mode="reflect")
    zt = torch.stft(
        xp.reshape(-1, xp.shape[-1]), nfft, hl, window=torch.hann_window(nfft),
        win_length=nfft, normalized=True, center=True, return_complex=True, pad_mode="reflect",
    ).view(1, 2, nfft // 2 + 1, -1)[..., :-1, :][..., 2 : 2 + le]
    np.testing.assert_allclose(np.asarray(z.real), zt.real.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(z.imag), zt.imag.numpy(), atol=3e-5)

    z2 = F.pad(zt, (0, 0, 0, 1))
    z2 = F.pad(z2, (2, 2))
    le2 = hl * int(math.ceil(4000 / hl)) + 2 * pad
    yt = torch.istft(
        z2.reshape(-1, nfft // 2 + 1, z2.shape[-1]), nfft, hl,
        window=torch.hann_window(nfft), win_length=nfft, normalized=True, center=True, length=le2,
    ).view(1, 2, -1)[..., pad : pad + 4000]
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-4)


def test_sin_embeddings_match_torch_formulas():
    import math

    # 1-D (htdemucsq.py:27-40)
    got = create_sin_embedding(10, 8)
    pos = torch.arange(10).view(-1, 1, 1).float()
    adim = torch.arange(4).view(1, 1, -1)
    phase = pos / (10000 ** (adim / 3))
    want = torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)

    # 2-D (htdemucsq.py:43-76)
    got2 = create_2d_sin_embedding(8, 3, 5)
    d = 4
    pe = torch.zeros(8, 3, 5)
    div = torch.exp(torch.arange(0.0, d, 2) * -(math.log(10000.0) / d))
    pos_w = torch.arange(0.0, 5).unsqueeze(1)
    pos_h = torch.arange(0.0, 3).unsqueeze(1)
    pe[0:d:2] = torch.sin(pos_w * div).transpose(0, 1).unsqueeze(1).repeat(1, 3, 1)
    pe[1:d:2] = torch.cos(pos_w * div).transpose(0, 1).unsqueeze(1).repeat(1, 3, 1)
    pe[d::2] = torch.sin(pos_h * div).transpose(0, 1).unsqueeze(2).repeat(1, 1, 5)
    pe[d + 1 :: 2] = torch.cos(pos_h * div).transpose(0, 1).unsqueeze(2).repeat(1, 1, 5)
    np.testing.assert_allclose(got2[0], pe.numpy(), atol=1e-5)


@pytest.mark.slow
def test_htdemucs_float_forward():
    m = HTDemucs(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 4000), minval=-1, maxval=1)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    y = m.apply(v, x, train=True)
    assert y.shape == (1, 4, 2, 4000)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_htdemucs_qat_forward_and_plan():
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    m = HTDemucs(q=q, **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 4000), minval=-1, maxval=1)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    y = m.apply(v, x, train=True)
    assert y.shape == (1, 4, 2, 4000)
    assert bool(jnp.isfinite(y).all())
    # combiner: freq final decoder trains its residual decoder, time one shares
    assert "residual_decoder_kernel" in v["params"]["decoder_3"]["conv_tr"]["residual_error_block"]
    assert "residual_decoder_kernel" not in v["params"]["tdecoder_3"]["conv_tr"]["residual_error_block"]
    # transformer quant sites
    ct = v[QPARAMS]["crosstransformer"]
    for site in ("const_pos_emb", "const_pos_emb_2d", "add_x", "add_xt", "norm_in", "norm_in_t"):
        assert site in ct
    assert "cross_attn" in ct["layer_1"]
    # freq embedding sites
    assert "freq_emb" in v[QPARAMS] and "mul_freq" in v[QPARAMS] and "add_freq" in v[QPARAMS]


@pytest.mark.slow
def test_htdemucs_eval_pads_to_train_segment():
    m = HTDemucs(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 4000), minval=-1, maxval=1)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    y = m.apply(v, x[..., :1500], train=False)
    assert y.shape == (1, 4, 2, 1500)
