"""ConvTasNet (speech) with declarative fake-quantization.

TPU-native redesign of the reference ConvTasNetQ
(reference: quantization/qat/models/convtasnetq.py:11-288): a 1-D conv
encoder, a TCN mask network (n_repeats x n_blocks dilated depthwise conv
blocks with GroupNorm/PReLU and res+skip 1x1 convs), mask multiplication,
and a ConvTranspose1d decoder — wrapped by the FQSS input splitter / output
combiner.

Instead of post-hoc module surgery (convtasnetq.py:243-288), every block is
built from the quantized primitives in :mod:`fqss_tpu.nn` with the same
fusion boundaries the reference's quantization plan produces:
Conv+PReLU -> quant, GroupNorm -> quant, res/skip conv -> quant,
skip-add -> quant, mask PReLU -> quant, mask conv+act -> quant, mask-mul ->
quant, encoder/decoder as splitter/combiner I/O layers.

Layout: waveforms enter/leave as [B, T] / [B, S, T] (channel-first audio at
the boundary like the reference); all internal compute is NTC so convs and
the 1x1-conv-as-matmul TCN hit the MXU with fused fake-quant epilogues.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fqss_tpu.nn import QAdd, QConv1d, QConv1dEncoder, QConvTr1dDecoder, QGroupNorm, QMul, QNl
from fqss_tpu.quant.spec import FLOAT, QuantSpec
from fqss_tpu.separation.splitter import postprocess, preprocess

Array = jax.Array

EPS = 1e-8  # convtasnetq.py:8


class ConvBlock(nn.Module):
    """TCN block (convtasnetq.py:11-42): 1x1 conv+PReLU -> gLN -> dilated
    depthwise conv+PReLU -> gLN -> residual & skip 1x1 convs."""

    io_channels: int
    hidden_channels: int
    kernel_size: int
    padding: int
    dilation: int = 1
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        f = QConv1d(self.hidden_channels, 1, nl="prelu", q=self.q, name="conv_in")(x)
        f = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="norm_in")(f)
        f = QConv1d(
            self.hidden_channels,
            self.kernel_size,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.hidden_channels,
            nl="prelu",
            q=self.q,
            name="conv_dw",
        )(f)
        f = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="norm_dw")(f)
        residual = QConv1d(self.io_channels, 1, q=self.q, name="res_conv")(f)
        skip_out = QConv1d(self.io_channels, 1, q=self.q, name="skip_conv")(f)
        feature = QAdd(q=self.q, name="add")(x, residual)
        return feature, skip_out


class MaskGenerator(nn.Module):
    """TCN separation module (convtasnetq.py:45-115)."""

    input_dim: int
    n_srcs: int
    kernel_size: int
    num_feats: int
    num_hidden: int
    num_layers: int
    num_stacks: int
    msk_activate: str
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, M, F]
        feats = QGroupNorm(num_groups=1, epsilon=EPS, q=self.q, name="bottleneck_norm")(x)
        feats = QConv1d(self.num_feats, 1, q=self.q, name="bottleneck_conv")(feats)

        output = None
        idx = 0
        for s in range(self.num_stacks):
            for layer in range(self.num_layers):
                multi = 2**layer
                feats, skip = ConvBlock(
                    io_channels=self.num_feats,
                    hidden_channels=self.num_hidden,
                    kernel_size=self.kernel_size,
                    dilation=multi,
                    padding=multi,
                    q=self.q,
                    name=f"tcn_{s}_{layer}",
                )(feats)
                if output is None:
                    output = skip
                else:
                    output = QAdd(q=self.q, name=f"skip_add_{idx}")(output, skip)
                    idx += 1

        output = QNl(kind="prelu", q=self.q, name="mask_prelu")(output)
        output = QConv1d(
            self.input_dim * self.n_srcs, 1, nl=self.msk_activate, q=self.q, name="mask_conv"
        )(output)
        # [B, M, S*F] -> [B, S, F, M] like the reference's reshape
        b, m, _ = output.shape
        out = output.reshape(b, m, self.n_srcs, self.input_dim)
        return out.transpose(0, 2, 3, 1)


class ConvTasNet(nn.Module):
    """Conv-TasNet QAT model (convtasnetq.py:118-223).

    __call__: [B, T] (or [B, C, T]) mixture -> [B, S, T] separations
    (or [n_combiner-stacked] planes combined by post_process).
    """

    n_srcs: int = 1
    kernel_size: int = 32
    stride: int = 16
    n_filters: int = 512
    mask_kernel_size: int = 3
    bn_chan: int = 128
    hid_chan: int = 512
    n_blocks: int = 8
    n_repeats: int = 3
    mask_act: str = "relu"
    q: QuantSpec = FLOAT

    def pre_process(self, x: Array) -> Array:
        return preprocess(x, n_splitter=self.q.n_splitter)

    def post_process(self, x: Array) -> Array:
        return postprocess(x, n_combiner=self.q.n_combiner)

    @nn.compact
    def __call__(self, x: Array, return_planes: bool = False):
        x = self.pre_process(x)  # [B, n_splitter*C, T]
        batch_size = x.shape[0]

        # Encoder: [B, C', T] -> NTC -> [B, M, F]
        feats = QConv1dEncoder(
            features=self.n_filters,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=False,
            q=self.q,
            name="encoder",
        )(jnp.swapaxes(x, 1, 2))

        # Mask: [B, S, F, M]
        mask = MaskGenerator(
            input_dim=self.n_filters,
            n_srcs=self.n_srcs,
            kernel_size=self.mask_kernel_size,
            num_feats=self.bn_chan,
            num_hidden=self.hid_chan,
            num_layers=self.n_blocks,
            num_stacks=self.n_repeats,
            msk_activate=self.mask_act,
            q=self.q,
            name="masker",
        )(feats)

        feats_sfm = jnp.swapaxes(feats, 1, 2)[:, None]  # [B, 1, F, M]
        masked = QMul(q=self.q, name="mul")(mask, feats_sfm)  # [B, S, F, M]
        masked = masked.reshape(batch_size * self.n_srcs, self.n_filters, -1)

        # Decoder: [B*S, M, F] -> [(n_comb,) B*S, L, 1]
        out_decoder = QConvTr1dDecoder(
            features=1,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=False,
            q=self.q,
            name="decoder",
        )(jnp.swapaxes(masked, 1, 2))

        # -> [n_comb, B, S, 1, L]
        length = out_decoder.shape[-2]
        planes = out_decoder.reshape(self.q.n_combiner, batch_size, self.n_srcs, length, 1)
        planes = jnp.swapaxes(planes, -1, -2)
        out = self.post_process(planes)
        if return_planes:
            return out, jnp.squeeze(planes, -2)
        return out
