"""Model I/O layers: splitter-aware encoders and combiner decoders.

TPU-native equivalents of Conv1dEncoderQ/Conv2dEncoderQ and the
LinearDecoderQ/ConvTr1dDecoderQ/ConvTr2dDecoderQ + ResidualErrorBlock
machinery (reference: quantization/qat/qat_layers.py:993-1421) — the layers
that realize the FQSS paper's MSB/LSB splitter-combiner mechanism at the
network boundary.

Encoders: optional input quantizer -> conv (+NL) -> act-quant. The splitter
channel widening (in_channels -> n_splitter * in_channels) happens naturally
here because the model's ``pre_process`` already emits the widened input; the
Gaussian-matched initialization of the new channels when importing a float
checkpoint lives in :func:`expand_encoder_kernel`.

Decoders: decoder op -> out-quant; with ``n_combiner >= 2`` a chain of
residual-error blocks re-encodes the quantized output, quantizes the latent
residual ``Y - Y_q``, and decodes it into additional output planes (shared
decoder weights unless ``train_res_dec``). Output is stacked
``[n_combiner, ...]`` for the combiner.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from fqss_tpu.nn.layers import (
    MACS,
    Nl,
    QConv1d,
    QConv2d,
    make_act_quantizer,
    make_weight_quantizer,
    mxu_operands,
    sow_macs,
    torch_uniform_init,
)
from fqss_tpu.quant.spec import FLOAT, QuantSpec

Array = jax.Array


def expand_encoder_kernel(kernel: Array, n_splitter: int, rng: jax.Array,
                          lsb_init: str = "gauss") -> Array:
    """Widen a float encoder kernel to n_splitter * Cin input channels.

    Works on the input-channel axis (-2) of (k, Cin, Cout) conv1d or
    (kh, kw, Cin, Cout) conv2d kernels. New channel groups (the LSB-plane
    inputs) are initialized per ``lsb_init``:

    * ``"gauss"`` — Gaussian with the original channel's mean and std**n,
      the reference's scheme (qat_layers.py:1009-1026). NOTE the splitter's
      LSB streams are residuals REMAPPED TO FULL RANGE (process.py:16-37),
      so random LSB weights inject O(1) noise into the merged model's
      encoder output — the widened model starts several dB below its float
      teacher and re-learns for thousands of steps (measured: the FQSS
      music-band arm lags the float trajectory by ~4k steps).
    * ``"zeros"`` — zero the LSB groups, so the merged model computes
      exactly float(MSB-plane) at load and learns to USE the LSB stream
      from a working starting point (beyond-parity option).
    """
    if n_splitter < 2:
        return kernel
    cin = kernel.shape[-2]
    new = [kernel]
    for n_ch in range(1, n_splitter):
        if lsb_init == "zeros":
            new.append(jnp.zeros_like(kernel))
            continue
        block = []
        for c in range(cin):
            rng, sub = jax.random.split(rng)
            w = kernel[..., c, :]
            g = jnp.mean(w) + jax.random.normal(sub, w.shape, w.dtype) * (jnp.std(w) ** n_ch)
            block.append(g[..., None, :])
        new.append(jnp.concatenate(block, axis=-2))
    return jnp.concatenate(new, axis=-2)


class QConv1dEncoder(nn.Module):
    """[in-quant] -> Conv1d -> NL -> act-quant (Conv1dEncoderQ, qat_layers.py:993-1046).

    Expects the splitter-widened input [B, T, n_splitter * audio_channels].
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    nl: str | None = None
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_q = make_act_quantizer(
            self.q, enabled=self.q.in_quant, n_bits=self.q.in_act_n_bits,
            nl_quant=self.q.inout_nl_quant, name="in_quantizer",
        )
        if in_q is not None:
            x = in_q(x)
        return QConv1d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            use_bias=self.use_bias,
            nl=self.nl,
            q=self.q,
            name="conv",
        )(x)


class QConv2dEncoder(nn.Module):
    """[in-quant] -> Conv2d -> NL -> act-quant (Conv2dEncoderQ, qat_layers.py:1049-1102)."""

    features: int
    kernel_size: int | tuple[int, int]
    stride: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    use_bias: bool = True
    nl: str | None = None
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_q = make_act_quantizer(
            self.q, enabled=self.q.in_quant, n_bits=self.q.in_act_n_bits,
            nl_quant=self.q.inout_nl_quant, name="in_quantizer",
        )
        if in_q is not None:
            x = in_q(x)
        return QConv2d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            use_bias=self.use_bias,
            nl=self.nl,
            q=self.q,
            name="conv",
        )(x)


# ---------------------------------------------------------------------------
# Decoders with residual-error combiner chains
# ---------------------------------------------------------------------------


class _ResidualErrorBlock1d(nn.Module):
    """Combiner residual block for ConvTranspose1d decoders
    (ResidualErrorBlock, qat_layers.py:1105-1231).

    forward(Y, y_q, w_decoder): re-encode the quantized decoder output y_q
    with a trainable Conv1d, quantize the latent residual Y - Y_q, decode it
    (shared w_decoder, or a trainable residual decoder when train_res_dec).
    """

    latent_features: int  # decoder in_channels
    out_features: int  # decoder out_channels
    kernel_size: int
    stride: int
    use_bias: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, Y: Array, y_q: Array, w_decoder: Array) -> Array:
        Y_q = QConv1d(
            features=self.latent_features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=self.use_bias,
            q=self.q,
            act_quant=False,
            name="residual_encoder",
        )(y_q)
        res_q = make_act_quantizer(self.q, n_bits=self.q.act_n_bits, name="activation_fake_quantize")
        Y1 = Y - Y_q
        if res_q is not None:
            Y1 = res_q(Y1)
        if self.q.train_res_dec:
            wshape = (self.kernel_size, self.latent_features, self.out_features)
            bound = 1.0 / math.sqrt(self.out_features * self.kernel_size)
            w_dec = self.param("residual_decoder_kernel", torch_uniform_init(bound), wshape)
            wq = make_weight_quantizer(self.q, wshape, ch_axis=2, name="weight_fake_quantize_dec")
            if wq is not None:
                w_dec = wq(w_dec)
        else:
            w_dec = w_decoder
        pad = self.kernel_size - 1
        Y1c, wc = mxu_operands(self.q, Y1, jnp.flip(w_dec, axis=0))
        return lax.conv_general_dilated(
            Y1c,
            wc,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )


class QConvTr1dDecoder(nn.Module):
    """ConvTranspose1d decoder -> out-quant [+ combiner residual planes]
    (ConvTr1dDecoderQ, qat_layers.py:1305-1361).

    Returns [B, T, F] when n_combiner == 1, else [n_combiner, B, T, F].
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        wshape = (self.kernel_size, cin, self.features)
        bound = 1.0 / math.sqrt(self.features * self.kernel_size)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=2)
        w_decoder = wq(w) if wq is not None else w
        pad = self.kernel_size - 1
        xc, wc = mxu_operands(self.q, x, jnp.flip(w_decoder, axis=0))
        x0 = lax.conv_general_dilated(
            xc,
            wc,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            x0 = x0 + b
        sow_macs(self, x.shape[0] * cin * self.features * x0.shape[1] * (self.kernel_size // self.stride))
        out_q = make_act_quantizer(
            self.q, enabled=self.q.out_quant, n_bits=self.q.out_act_n_bits,
            nl_quant=self.q.inout_nl_quant, name="activation_fake_quantize",
        )
        y = out_q(x0) if out_q is not None else x0
        if self.q.n_combiner == 1:
            return y

        reb = _ResidualErrorBlock1d(
            latent_features=cin,
            out_features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=self.use_bias,
            q=self.q,
            name="residual_error_block",
        )
        res_out_q = make_act_quantizer(
            self.q, enabled=self.q.out_quant, n_bits=self.q.out_act_n_bits,
            name="activation_fake_quantize_residual",
        )
        outs = [y]
        for _ in range(1, self.q.n_combiner):
            x = reb(x, y, w_decoder)
            y = res_out_q(x) if res_out_q is not None else x
            outs.append(y)
        return jnp.stack(outs)


class _ResidualErrorBlockDense(nn.Module):
    """Combiner residual block for Linear decoders (qat_layers.py:1110-1121, 1179-1187)."""

    latent_features: int
    out_features: int
    use_bias: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, Y: Array, y_q: Array, w_decoder: Array) -> Array:
        cin = y_q.shape[-1]
        bound = 1.0 / math.sqrt(cin)
        wshape = (cin, self.latent_features)
        w_enc = self.param("residual_encoder_kernel", torch_uniform_init(bound), wshape)
        wq_enc = make_weight_quantizer(self.q, wshape, ch_axis=1, name="weight_fake_quantize")
        if wq_enc is not None:
            w_enc = wq_enc(w_enc)
        yc, wc = mxu_operands(self.q, y_q, w_enc)
        Y_q = jnp.dot(yc, wc, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("residual_encoder_bias", torch_uniform_init(bound), (self.latent_features,))
            Y_q = Y_q + b
        res_q = make_act_quantizer(self.q, n_bits=self.q.act_n_bits, name="activation_fake_quantize")
        Y1 = Y - Y_q
        if res_q is not None:
            Y1 = res_q(Y1)
        if self.q.train_res_dec:
            wshape_d = (self.latent_features, self.out_features)
            bound_d = 1.0 / math.sqrt(self.latent_features)
            w_dec = self.param("residual_decoder_kernel", torch_uniform_init(bound_d), wshape_d)
            wq_dec = make_weight_quantizer(self.q, wshape_d, ch_axis=1, name="weight_fake_quantize_dec")
            if wq_dec is not None:
                w_dec = wq_dec(w_dec)
        else:
            w_dec = w_decoder
        Y1c, wdc = mxu_operands(self.q, Y1, w_dec)
        return jnp.dot(Y1c, wdc, preferred_element_type=jnp.float32)


class QLinearDecoder(nn.Module):
    """Linear decoder -> out-quant [+ combiner planes] (LinearDecoderQ,
    qat_layers.py:1256-1302). Returns [..., F] or [n_combiner, ..., F]."""

    features: int
    use_bias: bool = False
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        bound = 1.0 / math.sqrt(cin)
        wshape = (cin, self.features)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=1)
        w_decoder = wq(w) if wq is not None else w
        xc, wc = mxu_operands(self.q, x, w_decoder)
        x0 = jnp.dot(xc, wc, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            x0 = x0 + b
        sow_macs(self, x.size * self.features)
        out_q = make_act_quantizer(
            self.q, enabled=self.q.out_quant, n_bits=self.q.out_act_n_bits,
            nl_quant=self.q.inout_nl_quant, name="activation_fake_quantize",
        )
        y = out_q(x0) if out_q is not None else x0
        if self.q.n_combiner == 1:
            return y

        reb = _ResidualErrorBlockDense(
            latent_features=cin,
            out_features=self.features,
            use_bias=self.use_bias,
            q=self.q,
            name="residual_error_block",
        )
        res_out_q = make_act_quantizer(
            self.q, enabled=self.q.out_quant, n_bits=self.q.out_act_n_bits,
            name="activation_fake_quantize_residual",
        )
        outs = [y]
        for _ in range(1, self.q.n_combiner):
            x = reb(x, y, w_decoder)
            y = res_out_q(x) if res_out_q is not None else x
            outs.append(y)
        return jnp.stack(outs)


class _ResidualErrorBlock2d(nn.Module):
    """Combiner residual block for ConvTranspose2d decoders
    (ResidualErrorBlock, qat_layers.py:1147-1169, 1203-1217). NHWC."""

    latent_features: int
    out_features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int]
    use_bias: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, Y: Array, y_q: Array, w_decoder: Array) -> Array:
        Y_q = QConv2d(
            features=self.latent_features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=self.use_bias,
            q=self.q,
            act_quant=False,
            name="residual_encoder",
        )(y_q)
        res_q = make_act_quantizer(self.q, n_bits=self.q.act_n_bits, name="activation_fake_quantize")
        Y1 = Y - Y_q
        if res_q is not None:
            Y1 = res_q(Y1)
        kh, kw = self.kernel_size
        b_dec = None
        if self.q.train_res_dec:
            wshape = (kh, kw, self.latent_features, self.out_features)
            bound = 1.0 / math.sqrt(self.out_features * kh * kw)
            w_dec = self.param("residual_decoder_kernel", torch_uniform_init(bound), wshape)
            # the reference's 2d residual decoder applies its own bias
            # (qat_layers.py:1211-1217 conv_transpose2d bias=residual_decoder.bias)
            if self.use_bias:
                b_dec = self.param("residual_decoder_bias", torch_uniform_init(bound), (self.out_features,))
            wq = make_weight_quantizer(self.q, wshape, ch_axis=3, name="weight_fake_quantize_dec")
            if wq is not None:
                w_dec = wq(w_dec)
        else:
            w_dec = w_decoder
        pads = [(kh - 1, kh - 1), (kw - 1, kw - 1)]
        Y1c, wc = mxu_operands(self.q, Y1, jnp.flip(w_dec, axis=(0, 1)))
        out = lax.conv_general_dilated(
            Y1c,
            wc,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if b_dec is not None:
            out = out + b_dec
        return out


class QConvTr2dDecoder(nn.Module):
    """ConvTranspose2d decoder -> out-quant [+ combiner planes]
    (ConvTr2dDecoderQ, qat_layers.py:1364-1421). NHWC.

    Returns [B, H, W, F] or [n_combiner, B, H, W, F]."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int]
    use_bias: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        wshape = (kh, kw, cin, self.features)
        bound = 1.0 / math.sqrt(self.features * kh * kw)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=3)
        w_decoder = wq(w) if wq is not None else w
        pads = [(kh - 1, kh - 1), (kw - 1, kw - 1)]
        xc, wc = mxu_operands(self.q, x, jnp.flip(w_decoder, axis=(0, 1)))
        x0 = lax.conv_general_dilated(
            xc,
            wc,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            x0 = x0 + b
        sow_macs(self, 1.0 * x.shape[0] * cin * self.features * x0.shape[1] * x0.shape[2]
                 * (kh // self.stride[0]) * max(kw // self.stride[1], 1))
        out_q = make_act_quantizer(
            self.q, enabled=self.q.out_quant, n_bits=self.q.out_act_n_bits,
            nl_quant=self.q.inout_nl_quant, name="activation_fake_quantize",
        )
        y = out_q(x0) if out_q is not None else x0
        if self.q.n_combiner == 1:
            return y

        reb = _ResidualErrorBlock2d(
            latent_features=cin,
            out_features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=self.use_bias,
            q=self.q,
            name="residual_error_block",
        )
        res_out_q = make_act_quantizer(
            self.q, enabled=self.q.out_quant, n_bits=self.q.out_act_n_bits,
            name="activation_fake_quantize_residual",
        )
        outs = [y]
        for _ in range(1, self.q.n_combiner):
            x = reb(x, y, w_decoder)
            y = res_out_q(x) if res_out_q is not None else x
            outs.append(y)
        return jnp.stack(outs)
