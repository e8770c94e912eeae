"""DPTNet model tests: segmentation round-trip vs torch oracle, OLA, forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from fqss_tpu.models.dptnet import DPTNet, merge_segments, overlap_and_add, split_segments
from fqss_tpu.quant import QPARAMS, QuantSpec


def torch_split_merge(x_bnt, K):
    """Oracle transcription of DPT_base.pad_segment/split_feature/merge_feature
    (dptnetq.py:232-276)."""
    inp = torch.tensor(x_bnt)
    B, N, T = inp.shape
    stride = K // 2
    rest = K - (stride + T % K) % K
    if rest > 0:
        inp = torch.cat([inp, torch.zeros(B, N, rest)], 2)
    pad_aux = torch.zeros(B, N, stride)
    inp = torch.cat([pad_aux, inp, pad_aux], 2)
    seg1 = inp[:, :, :-stride].contiguous().view(B, N, -1, K)
    seg2 = inp[:, :, stride:].contiguous().view(B, N, -1, K)
    segments = torch.cat([seg1, seg2], 3).view(B, N, -1, K).transpose(2, 3)
    # merge
    m = segments.transpose(2, 3).contiguous().view(B, N, -1, K * 2)
    in1 = m[:, :, :, :K].contiguous().view(B, N, -1)[:, :, stride:]
    in2 = m[:, :, :, K:].contiguous().view(B, N, -1)[:, :, :-stride]
    out = in1 + in2
    if rest > 0:
        out = out[:, :, :-rest]
    return segments.numpy(), rest, out.numpy()


def test_split_merge_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B, N, T, K = 2, 3, 57, 10
    x = rng.standard_normal((B, N, T)).astype(np.float32)

    segs_t, rest_t, merged_t = torch_split_merge(x, K)

    x_ntc = jnp.asarray(x.transpose(0, 2, 1))  # [B, T, N]
    segs, rest = split_segments(x_ntc, K)  # [B, K, S, N]
    assert rest == rest_t
    np.testing.assert_allclose(np.asarray(segs).transpose(0, 3, 1, 2), segs_t, atol=1e-6)

    merged = merge_segments(segs, rest, lambda a, b: a + b)  # [B, T, N]
    np.testing.assert_allclose(np.asarray(merged).transpose(0, 2, 1), merged_t, atol=1e-6)
    # split+merge of identity equals 2x the original (each sample in 2 chunks)
    np.testing.assert_allclose(np.asarray(merged).transpose(0, 2, 1), 2 * x, atol=1e-5)


def test_overlap_and_add_matches_torch_fold():
    rng = np.random.default_rng(1)
    frames, flen, step = 9, 4, 2
    sig = rng.standard_normal((2, 3, frames, flen)).astype(np.float32)
    got = np.asarray(overlap_and_add(jnp.asarray(sig), step))
    # torch oracle via fold
    t = torch.tensor(sig).reshape(6, frames, flen)
    out_len = (frames - 1) * step + flen
    want = torch.nn.functional.fold(
        t.transpose(1, 2), output_size=(1, out_len), kernel_size=(1, flen), stride=(1, step)
    ).reshape(2, 3, out_len).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_dptnet_forward_float_and_qat():
    kw = dict(n_srcs=2, kernel_size=2, enc_dim=16, feature_dim=8, hidden_dim=8, layer=1, segment_size=10)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 400), minval=-1, maxval=1)

    m = DPTNet(**kw)
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    assert y.shape == (1, 2, 400)

    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    mq = DPTNet(q=q, **kw)
    vq = mq.init(jax.random.PRNGKey(1), x)
    assert QPARAMS in vq
    yq = mq.apply(vq, x)
    assert yq.shape == (1, 2, 400)
    assert bool(jnp.isfinite(yq).all())
    # quant plan parity: transformer blocks carry MHA + LSTM + norms quantizers
    row0 = vq[QPARAMS]["separator"]["DPT"]["row_0"]
    for key in ("self_attn", "lstm", "linear", "norm1", "norm2", "add_norm1", "add_norm2"):
        assert key in row0, sorted(row0)
