"""Sepformer with declarative fake-quantization.

TPU-native redesign of the reference SepformerQ
(reference: quantization/qat/models/sepformerq.py:13-527): conv+ReLU
encoder, chunked dual-path transformer masker (intra/inter TransformerBlocks
of 8 pre-norm layers each, sinusoidal positional encoding added through a
quantized Const), gated Tanh x Sigmoid mask head, ConvTranspose1d decoder
with a TRAINABLE residual decoder in the combiner (train_res_dec=True,
sepformerq.py:501).

Quantization plan parity (sepformerq.py:472-527): encoder/decoder as
splitter/combiner I/O layers; per TransformerLayer the norms, MHA, and the
two FFN linears + ReLU are quantized (the residual adds inside a layer are
NOT quant points — faithful); per TransformerBlock the final norm, the
positional-encoding Const and its add; per DualPathBlock the intra/inter
GroupNorms and residual adds; the mask head's convs/PReLU/gates/mul.

Segmentation reuses the DPTNet 50%-overlap split/merge (the reference's
padding/segmentation/over_add, sepformerq.py:214-301, is the same
algorithm as dptnetq.py:232-276).
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.models.dptnet import merge_segments, split_segments
from fqss_tpu.nn import QAdd, QConst, QConv1d, QConv1dEncoder, QConvTr1dDecoder, QDense, QGroupNorm, QLayerNorm, QMul, QNl
from fqss_tpu.nn.attention import QMultiheadAttention
from fqss_tpu.quant.spec import FLOAT, QuantSpec
from fqss_tpu.separation.splitter import postprocess, preprocess

Array = jax.Array

EPS_T = 1e-6
EPS = 1e-8


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Absolute sinusoidal positional encoding (sepformerq.py:13-37)."""
    pe = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    den = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * den)
    pe[:, 1::2] = np.cos(pos * den)
    return pe


class TransformerLayer(nn.Module):
    """Pre-norm transformer layer (sepformerq.py:50-95). [B, L, F]."""

    n_filters: int
    n_ffn: int
    n_heads: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x_norm1 = QLayerNorm(epsilon=EPS_T, q=self.q, name="norm1")(x)
        x_mha = QMultiheadAttention(self.n_filters, self.n_heads, q=self.q, name="mha")(
            x_norm1, x_norm1, x_norm1
        )
        x = x + x_mha  # residual adds are not quant points here (faithful)
        x_norm2 = QLayerNorm(epsilon=EPS_T, q=self.q, name="norm2")(x)
        y = QDense(self.n_ffn, q=self.q, name="ffn_in")(x_norm2)
        y = QNl(kind="relu", q=self.q, name="ffn_relu")(y)
        y = QDense(self.n_filters, q=self.q, name="ffn_out")(y)
        return x + y


class TransformerBlock(nn.Module):
    """Stack of layers + positional encoding + final norm (sepformerq.py:98-123)."""

    n_filters: int
    n_heads: int
    n_ffn: int
    num_layers: int = 8
    max_len: int = 2500
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pe = jnp.asarray(sinusoidal_pe(self.max_len, self.n_filters))[None, : x.shape[1]]
        pe = QConst(q=self.q, name="pos_const")(pe)
        x = QAdd(q=self.q, name="pos_add")(x, pe)
        for i in range(self.num_layers):
            x = TransformerLayer(self.n_filters, self.n_ffn, self.n_heads, q=self.q, name=f"layer_{i}")(x)
        return QLayerNorm(epsilon=EPS_T, q=self.q, name="norm")(x)


class DualPathBlock(nn.Module):
    """Intra/inter chunked transformers with norms + residuals
    (sepformerq.py:126-175). Input [B, K, S, F]."""

    n_filters: int
    n_heads: int
    n_ffn: int
    num_layers: int = 8
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, k, s, f = x.shape
        # intra: over K, batched on chunks
        intra = jnp.swapaxes(x, 1, 2).reshape(b * s, k, f)
        intra = TransformerBlock(self.n_filters, self.n_heads, self.n_ffn, self.num_layers,
                                 q=self.q, name="intra_transformer_block")(intra)
        intra = jnp.swapaxes(intra.reshape(b, s, k, f), 1, 2)
        intra = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="intra_norm")(intra)
        intra = QAdd(q=self.q, name="intra_add")(intra, x)
        # inter: over S, batched on in-chunk position
        inter = intra.reshape(b * k, s, f)
        inter = TransformerBlock(self.n_filters, self.n_heads, self.n_ffn, self.num_layers,
                                 q=self.q, name="inter_transformer_block")(inter)
        inter = inter.reshape(b, k, s, f)
        inter = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="inter_norm")(inter)
        return QAdd(q=self.q, name="inter_add")(inter, intra)


class MaskGenerator(nn.Module):
    """Chunked dual-path masker (sepformerq.py:178-339). In: [B, M, F]."""

    n_srcs: int
    n_filters: int
    n_repeats: int = 2
    n_heads: int = 8
    chunk_size: int = 250
    n_ffn: int = 1024
    n_layers: int = 8
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b = x.shape[0]
        xn = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="norm")(x)
        xc = QConv1d(self.n_filters, 1, use_bias=False, q=self.q, name="conv1d")(xn)

        segs, gap = split_segments(xc, self.chunk_size)  # [B, K, S, F]
        for i in range(self.n_repeats):
            segs = DualPathBlock(self.n_filters, self.n_heads, self.n_ffn, self.n_layers,
                                 q=self.q, name=f"dp_{i}")(segs)

        y = QNl(kind="prelu", q=self.q, name="prelu")(segs)
        # 1x1 Conv2d over channels-last == dense (quantized Conv2dQ in the plan)
        y = QDense(self.n_srcs * self.n_filters, q=self.q, name="conv2d")(y)  # [B, K, S, spk*F]
        k, s = y.shape[1], y.shape[2]
        y = y.reshape(b, k, s, self.n_srcs, self.n_filters)
        y = y.transpose(0, 3, 1, 2, 4).reshape(b * self.n_srcs, k, s, self.n_filters)

        y = merge_segments(y, gap, lambda a, bb: a + bb)  # [B*spk, M, F]
        gate_out = QConv1d(self.n_filters, 1, nl="tanh", q=self.q, name="net_out")(y)
        gate = QConv1d(self.n_filters, 1, nl="sigmoid", q=self.q, name="net_gate")(y)
        y = QMul(q=self.q, name="mul")(gate_out, gate)
        y = QConv1d(self.n_filters, 1, use_bias=False, nl="relu", q=self.q, name="end_conv")(y)
        return y.reshape(b, self.n_srcs, -1, self.n_filters)  # [B, S, M, F]


class Sepformer(nn.Module):
    """Sepformer QAT model (sepformerq.py:342-439). [B, T] -> [B, S, T]."""

    n_srcs: int = 1
    kernel_size: int = 16
    stride: int = 8
    n_filters: int = 256
    n_repeats: int = 2
    n_heads: int = 8
    chunk_size: int = 250
    n_ffn: int = 1024
    n_layers: int = 8
    q: QuantSpec = FLOAT

    def __post_init__(self):
        # the Sepformer combiner trains its residual decoder (sepformerq.py:501)
        if self.q.qat and self.q.n_combiner >= 2 and not self.q.train_res_dec:
            object.__setattr__(self, "q", dataclasses.replace(self.q, train_res_dec=True))
        super().__post_init__()

    def pre_process(self, x: Array) -> Array:
        return preprocess(x, n_splitter=self.q.n_splitter)

    def post_process(self, x: Array) -> Array:
        return postprocess(x, n_combiner=self.q.n_combiner)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.pre_process(x)
        batch_size = x.shape[0]

        feats = QConv1dEncoder(
            features=self.n_filters, kernel_size=self.kernel_size, stride=self.stride,
            use_bias=False, nl="relu", q=self.q, name="encoder",
        )(jnp.swapaxes(x, 1, 2))  # [B, M, F]

        mask = MaskGenerator(
            self.n_srcs, self.n_filters, self.n_repeats, self.n_heads,
            self.chunk_size, self.n_ffn, self.n_layers, q=self.q, name="masker",
        )(feats)  # [B, S, M, F]

        masked = QMul(q=self.q, name="mul")(mask, feats[:, None])  # [B, S, M, F]
        masked = masked.reshape(batch_size * self.n_srcs, -1, self.n_filters)

        out_decoder = QConvTr1dDecoder(
            features=1, kernel_size=self.kernel_size, stride=self.stride,
            use_bias=False, q=self.q, name="decoder",
        )(masked)  # [(n_comb,) B*S, L, 1]

        length = out_decoder.shape[-2]
        planes = out_decoder.reshape(self.q.n_combiner, batch_size, self.n_srcs, length, 1)
        return self.post_process(jnp.swapaxes(planes, -1, -2))
