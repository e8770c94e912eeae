"""DPTNet (dual-path transformer) with declarative fake-quantization.

TPU-native redesign of the reference DPTNetQ
(reference: quantization/qat/models/dptnetq.py:60-478): conv encoder
(kernel W, 50% overlap), dual-path transformer separator (6 layers of
row/col transformer blocks whose feed-forward is an LSTM — the DPTNet
"improved transformer"), gated Tanh x Sigmoid output, 1x1 mask conv, and a
Linear decoder followed by overlap-and-add.

Quantization plan parity (dptnetq.py:430-478): encoder/decoder as
splitter/combiner I/O layers; enc_LN, BN, mask convs, gated output convs,
DPT output PReLU+Conv2d, and inside each transformer block the LSTM, linear,
norms, residual adds, and MHA are quantized. The transformer's ReLU
activation between LSTM and linear is NOT a quant point (faithful).

Layout: all internal tensors are channels-last; segments are
[B, K, S, N] (K = segment length, S = number of 50%-overlap chunks).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.nn import QAdd, QConv1d, QConv1dEncoder, QDense, QGroupNorm, QLayerNorm, QLinearDecoder, QMul, QNl
from fqss_tpu.nn.attention import QMultiheadAttention
from fqss_tpu.nn.lstm import QLSTM
from fqss_tpu.quant.spec import FLOAT, QuantSpec
from fqss_tpu.separation.splitter import postprocess, preprocess

Array = jax.Array

EPS = 1e-8


def overlap_and_add(signal: Array, step: int) -> Array:
    """OLA of framed signal [..., F, W] -> [..., (F-1)*step + W]
    (dptnetq.py:17-58, the TF reconstruction_ops port) as one scatter-add."""
    *outer, frames, frame_len = signal.shape
    sub = math.gcd(frame_len, step)
    subframes_per_frame = frame_len // sub
    substep = step // sub
    out_len = step * (frames - 1) + frame_len
    sig = signal.reshape(*outer, frames * subframes_per_frame, sub)
    idx = (np.arange(frames)[:, None] * substep + np.arange(subframes_per_frame)[None, :]).reshape(-1)
    out = jnp.zeros((*outer, out_len // sub, sub), signal.dtype)
    out = out.at[..., idx, :].add(sig)
    return out.reshape(*outer, out_len)


def split_segments(x: Array, segment_size: int) -> tuple[Array, int]:
    """[B, T, N] -> ([B, K, S, N], rest) with 50% overlap
    (dptnetq.py:232-259)."""
    b, t, n = x.shape
    stride = segment_size // 2
    rest = segment_size - (stride + t % segment_size) % segment_size
    if rest > 0:
        x = jnp.pad(x, ((0, 0), (0, rest), (0, 0)))
    x = jnp.pad(x, ((0, 0), (stride, stride), (0, 0)))
    seg1 = x[:, :-stride].reshape(b, -1, segment_size, n)
    seg2 = x[:, stride:].reshape(b, -1, segment_size, n)
    segs = jnp.stack([seg1, seg2], axis=2).reshape(b, -1, segment_size, n)  # [B, S, K, N]
    return jnp.swapaxes(segs, 1, 2), rest  # [B, K, S, N]


def merge_segments(x: Array, rest: int, add_fn) -> Array:
    """[B, K, S, N] -> [B, T, N] inverse OLA (dptnetq.py:261-276)."""
    b, k, s, n = x.shape
    stride = k // 2
    xt = jnp.swapaxes(x, 1, 2).reshape(b, -1, 2 * k, n)  # [B, S/2, 2K, N]
    x1 = xt[:, :, :k, :].reshape(b, -1, n)[:, stride:]
    x2 = xt[:, :, k:, :].reshape(b, -1, n)[:, :-stride]
    out = add_fn(x1, x2)
    if rest > 0:
        out = out[:, :-rest]
    return out


class ImprovedTransformerLayer(nn.Module):
    """DPTNet transformer block: MHA + LSTM feed-forward
    (dptnetq.py:60-97). Input [B, L, E]."""

    d_model: int
    nhead: int
    hidden_size: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, src: Array) -> Array:
        src2 = QMultiheadAttention(self.d_model, self.nhead, q=self.q, name="self_attn")(src, src, src)
        src = QAdd(q=self.q, name="add_norm1")(src, src2)
        src = QLayerNorm(q=self.q, name="norm1")(src)
        y = QLSTM(self.hidden_size, bidirectional=True, mode=self.q.lstm_mode, q=self.q, name="lstm")(src)
        y = jax.nn.relu(y)  # activation is not a quant point (dptnetq.py:94)
        src2 = QDense(self.d_model, q=self.q, name="linear")(y)
        src = QAdd(q=self.q, name="add_norm2")(src, src2)
        return QLayerNorm(q=self.q, name="norm2")(src)


class DPT(nn.Module):
    """Dual-path transformer over segments [B, K, S, N] (dptnetq.py:159-209)."""

    input_size: int
    hidden_size: int
    output_size: int
    num_layers: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, k, s, n = x.shape
        out = x
        for i in range(self.num_layers):
            # row: within-segment (over K), batched over chunks
            row_in = jnp.swapaxes(out, 1, 2).reshape(b * s, k, n)
            row_out = ImprovedTransformerLayer(
                self.input_size, 4, self.hidden_size, q=self.q, name=f"row_{i}"
            )(row_in)
            out = jnp.swapaxes(row_out.reshape(b, s, k, n), 1, 2)
            # col: across segments (over S), batched over in-segment position
            col_in = out.reshape(b * k, s, n)
            col_out = ImprovedTransformerLayer(
                self.input_size, 4, self.hidden_size, q=self.q, name=f"col_{i}"
            )(col_in)
            out = col_out.reshape(b, k, s, n)
        out = QNl(kind="prelu", q=self.q, name="out_prelu")(out)
        # 1x1 Conv2d == dense over channels-last (quantized as Conv2dQ in the plan)
        out = QDense(self.output_size, q=self.q, name="out_conv")(out)
        return out  # [B, K, S, output_size]


class BFModule(nn.Module):
    """Bottleneck + DPT + gated output (dptnetq.py:281-309)."""

    input_dim: int
    feature_dim: int
    hidden_dim: int
    num_spk: int
    layer: int
    segment_size: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, L, E] -> [B, L, N]
        b = x.shape[0]
        feats = QConv1d(self.feature_dim, 1, use_bias=False, q=self.q, name="BN")(x)
        segs, rest = split_segments(feats, self.segment_size)  # [B, K, S, N]
        out = DPT(self.feature_dim, self.hidden_dim, self.feature_dim * self.num_spk,
                  self.layer, q=self.q, name="DPT")(segs)
        k, s = out.shape[1], out.shape[2]
        # [B, K, S, nspk*N] -> [B*nspk, K, S, N]
        out = out.reshape(b, k, s, self.num_spk, self.feature_dim)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b * self.num_spk, k, s, self.feature_dim)
        merged = merge_segments(out, rest, QAdd(q=self.q, name="add"))  # [B*nspk, T, N]
        gate_a = QConv1d(self.feature_dim, 1, nl="tanh", q=self.q, name="output")(merged)
        gate_b = QConv1d(self.feature_dim, 1, nl="sigmoid", q=self.q, name="output_gate")(merged)
        bf = QMul(q=self.q, name="mul")(gate_a, gate_b)  # [B*nspk, T, N]
        return bf.reshape(b, self.num_spk, -1, self.feature_dim)  # [B, nspk, T, N]


class DPTNet(nn.Module):
    """DPTNet QAT model (dptnetq.py:311-409). [B, T] -> [B, S, T]."""

    n_srcs: int = 2
    kernel_size: int = 2
    enc_dim: int = 256
    feature_dim: int = 64
    hidden_dim: int = 128
    layer: int = 6
    segment_size: int = 250
    q: QuantSpec = FLOAT

    def pre_process(self, x: Array) -> Array:
        return preprocess(x, n_splitter=self.q.n_splitter)

    def post_process(self, x: Array) -> Array:
        return postprocess(x, n_combiner=self.q.n_combiner)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.pre_process(x)  # [B, C', T]
        b = x.shape[0]

        # Encoder: 50% overlap conv + ReLU
        mixture_w = QConv1dEncoder(
            features=self.enc_dim,
            kernel_size=self.kernel_size,
            stride=self.kernel_size // 2,
            use_bias=False,
            nl="relu",
            q=self.q,
            name="encoder",
        )(jnp.swapaxes(x, 1, 2))  # [B, L, E]

        score = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="enc_LN")(mixture_w)
        score = BFModule(
            self.enc_dim, self.feature_dim, self.hidden_dim, self.n_srcs,
            self.layer, self.segment_size, q=self.q, name="separator",
        )(score)  # [B, nspk, T, N]

        score = score.reshape(b * self.n_srcs, -1, self.feature_dim)
        score = QConv1d(self.enc_dim, 1, use_bias=False, nl="relu", q=self.q, name="mask_conv1x1")(score)
        est_mask = score.reshape(b, self.n_srcs, -1, self.enc_dim)  # [B, nspk, L, E]
        source_w = QMul(q=self.q, name="mul")(mixture_w[:, None], est_mask)  # [B, nspk, L, E]

        est = QLinearDecoder(features=self.kernel_size, use_bias=False, q=self.q, name="decoder")(source_w)
        # [(n_comb,) B, nspk, L, W] -> OLA -> [n_comb, B, nspk, T]
        est = est.reshape(self.q.n_combiner, b, self.n_srcs, est.shape[-2], self.kernel_size)
        est = overlap_and_add(est, self.kernel_size // 2)
        out = est.reshape(self.q.n_combiner, b, self.n_srcs, 1, -1)
        return self.post_process(out)
