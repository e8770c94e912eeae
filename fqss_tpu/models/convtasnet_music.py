"""ConvTasNet-music (stereo, 4-stem MUSDB) with declarative fake-quantization.

TPU-native redesign of the reference ConvTasNetMusicQ
(reference: quantization/qat/models/convtasnetq_music.py:10-333): stereo
Conv1d+ReLU encoder, a TCN mask net of R=4 x X=10 depthwise-separable conv
blocks (channel-wise LayerNorm bottleneck), and a Linear decoder producing
audio_channels*kernel frames recombined by overlap-and-add (stride 10).
The splitter runs with normalize=False (convtasnetq_music.py:220-221).

Quantization plan parity (convtasnetq_music.py:290-333): encoder/decoder as
splitter/combiner I/O layers (train_res_dec=False); in each ConvBlock the
1x1 conv+PReLU, GroupNorm and residual add; in each DepthwiseSeparableConv
the depthwise conv+PReLU, GroupNorm and pointwise conv; the masker's
LayerNorm, bottleneck conv, and mask conv+activation; the mask mul.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fqss_tpu.models.dptnet import overlap_and_add
from fqss_tpu.nn import QAdd, QConv1d, QConv1dEncoder, QGroupNorm, QLayerNorm, QLinearDecoder, QMul
from fqss_tpu.quant.spec import FLOAT, QuantSpec
from fqss_tpu.separation.splitter import postprocess, preprocess

Array = jax.Array

EPS = 1e-8


class DepthwiseSeparableConv(nn.Module):
    """depthwise conv+PReLU -> gLN -> pointwise conv
    (convtasnetq_music.py:141-175). [B, T, H] -> [B, T, B_out]."""

    in_channels: int
    out_channels: int
    kernel_size: int
    padding: int
    dilation: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = QConv1d(
            self.in_channels, self.kernel_size, padding=self.padding, dilation=self.dilation,
            groups=self.in_channels, use_bias=False, nl="prelu", q=self.q, name="depthwise",
        )(x)
        y = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="norm")(y)
        return QConv1d(self.out_channels, 1, use_bias=False, q=self.q, name="pointwise")(y)


class ConvBlock(nn.Module):
    """1x1 conv+PReLU -> gLN -> DS conv -> +residual (convtasnetq_music.py:110-138)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    padding: int
    dilation: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = QConv1d(self.hidden_channels, 1, use_bias=False, nl="prelu", q=self.q, name="conv1x1")(x)
        y = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="norm")(y)
        y = DepthwiseSeparableConv(
            self.hidden_channels, self.in_channels, self.kernel_size,
            self.padding, self.dilation, q=self.q, name="dsconv",
        )(y)
        return QAdd(q=self.q, name="add")(y, x)


class MaskGenerator(nn.Module):
    """cLN -> bottleneck -> TCN -> mask conv+act (convtasnetq_music.py:53-107).
    In/out channels-last: [B, K, N] -> [B, C, K, N]."""

    n_filters: int
    bn_chan: int
    hid_chan: int
    conv_kernel: int
    n_blocks: int
    n_repeats: int
    n_srcs: int
    mask_act: str = "relu"
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, k, n = x.shape
        y = QLayerNorm(epsilon=EPS, q=self.q, name="layer_norm")(x)  # channel-wise LN
        y = QConv1d(self.bn_chan, 1, use_bias=False, q=self.q, name="bottleneck")(y)
        for r in range(self.n_repeats):
            for xi in range(self.n_blocks):
                dilation = 2**xi
                padding = (self.conv_kernel - 1) * dilation // 2
                y = ConvBlock(
                    self.bn_chan, self.hid_chan, self.conv_kernel, padding, dilation,
                    q=self.q, name=f"tcn_{r}_{xi}",
                )(y)
        mask = QConv1d(self.n_srcs * self.n_filters, 1, use_bias=False, nl=self.mask_act,
                       q=self.q, name="mask_conv")(y)  # [B, K, C*N]
        mask = mask.reshape(b, k, self.n_srcs, self.n_filters)
        return mask.transpose(0, 2, 1, 3)  # [B, C, K, N]


class ConvTasNetMusic(nn.Module):
    """ConvTasNet music QAT model (convtasnetq_music.py:178-267).

    [B, audio_channels, T] -> [B, n_sources, audio_channels, T']."""

    sources: tuple = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    n_filters: int = 256
    kernel_size: int = 20
    stride: int = 10
    bn_chan: int = 256
    hid_chan: int = 512
    conv_kernel: int = 3
    n_blocks: int = 10
    n_repeats: int = 4
    mask_act: str = "relu"
    q: QuantSpec = FLOAT

    @property
    def n_srcs(self) -> int:
        return len(self.sources)

    def pre_process(self, x: Array) -> Array:
        # music splitter does NOT normalize (convtasnetq_music.py:220-221)
        return preprocess(x, n_splitter=self.q.n_splitter, normalize=False)

    def post_process(self, x: Array) -> Array:
        return postprocess(x, n_combiner=self.q.n_combiner)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.pre_process(x)  # [B, n_split*C, T]
        batch_size = x.shape[0]

        feats = QConv1dEncoder(
            features=self.n_filters, kernel_size=self.kernel_size, stride=self.stride,
            use_bias=False, nl="relu", q=self.q, name="encoder",
        )(jnp.swapaxes(x, 1, 2))  # [B, K, N]

        mask = MaskGenerator(
            self.n_filters, self.bn_chan, self.hid_chan, self.conv_kernel,
            self.n_blocks, self.n_repeats, self.n_srcs, self.mask_act, q=self.q, name="separator",
        )(feats)  # [B, C, K, N]

        masked = QMul(q=self.q, name="mul")(mask, feats[:, None])  # [B, C, K, N]

        dec = QLinearDecoder(
            features=self.audio_channels * self.kernel_size, use_bias=False, q=self.q, name="decoder",
        )(masked)  # [(n_comb,) B, C, K, ac*kernel]

        k = dec.shape[-2]
        dec = dec.reshape(self.q.n_combiner, batch_size, self.n_srcs, k, self.audio_channels, self.kernel_size)
        dec = jnp.swapaxes(dec, 3, 4)  # [n_comb, B, C, ac, K, kernel]
        out = overlap_and_add(dec, self.stride)  # [n_comb, B, C, ac, T]
        return self.post_process(out)
