"""Demucs-family building blocks with declarative fake-quantization.

TPU-native redesign of the reference's demucs blocks
(reference: quantization/qat/models/demucsq.py and hdemucsq.py): LayerScale,
the DConv dilated residual branch, ScaledEmbedding, reflect pad1d, and the
hybrid HEncLayer/HDecLayer used by both the time (1-D) and frequency (2-D)
branches of HTDemucs.

Layouts: time tensors are [B, T, C]; frequency tensors are [B, Fr, T, C]
(NHWC; the freq axis is the conv height). Quantization sites follow the
HTDemucs plan (htdemucsq.py:1157-1242): conv+GELU fused, rewrite+GLU fused,
DConv (conv+GN+GELU, conv+GN+GLU, LayerScale-mul, add), skip-adds.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.nn import (
    QAdd,
    QConv1d,
    QConv2d,
    QConvTr1dDecoder,
    QConvTr2dDecoder,
    QConvTranspose1d,
    QConvTranspose2d,
    QEmbedding,
    QMul,
)
from fqss_tpu.nn.layers import make_act_quantizer
from fqss_tpu.quant.spec import FLOAT, QuantSpec

Array = jax.Array


def pad1d_reflect(x: Array, padding_left: int, padding_right: int) -> Array:
    """F.pad reflect with zero-extension for short inputs
    (hdemucsq.py:25-42: pad1d)."""
    length = x.shape[-1]
    max_pad = max(padding_left, padding_right)
    if length <= max_pad:
        extra = max_pad - length + 1
        extra_right = min(padding_right, extra)
        extra_left = extra - extra_right
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(extra_left, extra_right)])
        padding_left -= extra_left
        padding_right -= extra_right
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(padding_left, padding_right)], mode="reflect")


class QLayerScale(nn.Module):
    """LayerScale [Touvron 2021] with a quantized mul (demucsq.py:19-39).

    Channels-last everywhere here, so the scale broadcasts on the last axis.
    """

    channels: int
    init: float = 0.0
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", lambda rng: jnp.full((self.channels,), self.init, jnp.float32))
        return QMul(q=self.q, name="mul")(x, scale)


class DConv(nn.Module):
    """Dilated residual branch (demucsq.py:110-182). [B, T, C].

    Per depth-layer: conv(k=3, dil=2^d)+GN+GELU [-> BLSTM -> LocalState] ->
    conv1x1 -> GN -> GLU -> LayerScale, added residually. The optional
    BLSTM/LocalState inserts are the legacy HDemucs deep-layer variants
    (demucsq.py:160-176 mods.insert; quant plan hdemucsq.py:889-903).
    Quant plan (plain): htdemucsq.py:1206-1212.
    """

    channels: int
    compress: float = 8
    depth: int = 2
    init: float = 1e-3
    kernel: int = 3
    gelu: bool = True
    lstm: bool = False
    attn: bool = False
    heads: int = 4
    ndecay: int = 4
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.channels / self.compress)
        act = "gelu" if self.gelu else "relu"
        for d in range(self.depth):
            dilation = 2**d
            padding = dilation * (self.kernel // 2)
            y = QConv1d(
                hidden, self.kernel, dilation=dilation, padding=padding,
                norm_groups=1, nl=act, q=self.q, name=f"layer_{d}_conv",
            )(x)
            if self.lstm:
                y = BLSTM(hidden, layers=2, max_steps=200, skip=True, q=self.q,
                          name=f"layer_{d}_lstm")(y)
            if self.attn:
                y = LocalState(hidden, heads=self.heads, ndecay=self.ndecay, q=self.q,
                               name=f"layer_{d}_attn")(y)
            y = QConv1d(
                2 * self.channels, 1, norm_groups=1, nl="glu", q=self.q, name=f"layer_{d}_mix",
            )(y)
            y = QLayerScale(self.channels, self.init, q=self.q, name=f"layer_{d}_scale")(y)
            x = QAdd(q=self.q, name=f"add_{d}")(x, y)
        return x


class ScaledEmbedding(nn.Module):
    """Embedding with boosted LR via `scale`, optionally smoothed
    (hdemucsq.py:45-69). Quantized table lookup + quantized scale mul
    (quant plan: htdemucsq.py:1204-1205)."""

    num_embeddings: int
    features: int
    scale: float = 10.0
    smooth: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, idx: Array) -> Array:
        def init(rng):
            w = jax.random.normal(rng, (self.num_embeddings, self.features), jnp.float32)
            if self.smooth:
                w = jnp.cumsum(w, axis=0)
                w = w / jnp.sqrt(jnp.arange(1, self.num_embeddings + 1, dtype=jnp.float32))[:, None]
            return w / self.scale

        # Inline table + quantizers (same sites as EmbeddingQ, qat_layers.py:489-508).
        table = self.param("embedding", lambda rng: init(rng))
        from fqss_tpu.nn.layers import make_weight_quantizer

        wq = make_weight_quantizer(self.q, table.shape, ch_axis=0)
        if wq is not None:
            table = wq(table)
        out = jnp.take(table, idx, axis=0)
        aq = make_act_quantizer(self.q)
        if aq is not None:
            out = aq(out)
        return QMul(q=self.q, name="mul")(out, jnp.asarray(self.scale, out.dtype))


class HEncLayer(nn.Module):
    """Hybrid encoder layer for time or frequency branches
    (hdemucsq.py:72-162). freq: [B, Fr, T, C]; time: [B, T, C].

    Quantized order note: the plan fuses conv+GELU into one quant point
    (htdemucsq.py:1169-1179), which in the reference's surgered forward runs
    GELU *before* the time-branch inject add; with the default HTDemucs
    config (depth=4, nfft=4096) the branches never merge so inject is unused.
    Here inject (when present) is added after the fused conv+GELU, matching
    the surgered network.
    """

    chout: int
    kernel_size: int = 8
    stride: int = 4
    freq: bool = True
    empty: bool = False
    norm: bool = False
    norm_groups: int = 4
    context: int = 0
    pad: bool = True
    rewrite: bool = True
    dconv: bool = True
    dconv_depth: int = 2
    dconv_comp: float = 8
    dconv_init: float = 1e-3
    dconv_lstm: bool = False  # legacy HDemucs deep layers (hdemucsq.py:509)
    dconv_attn: bool = False
    q: QuantSpec = FLOAT
    is_input_layer: bool = False  # encoder.0/tencoder.0: splitter I/O layer

    @nn.compact
    def __call__(self, x: Array, inject: Array | None = None) -> Array:
        pad = self.kernel_size // 4 if self.pad else 0
        ng = self.norm_groups if self.norm else None

        if self.is_input_layer:
            in_q = make_act_quantizer(
                self.q, enabled=self.q.in_quant, n_bits=self.q.in_act_n_bits,
                nl_quant=self.q.inout_nl_quant, name="in_quantizer",
            )
            if in_q is not None:
                x = in_q(x)

        if not self.freq:
            # pad time length to a multiple of stride (hdemucsq.py:139-142)
            le = x.shape[-2]
            if le % self.stride != 0:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, self.stride - le % self.stride), (0, 0)])

        # empty layers quantize the bare conv output (hdemucsq.py:862-863
        # quantize_modules(m, ['conv']) -> Conv1dQ with its own act quant)
        nl = None if self.empty else "gelu"
        if self.freq:
            y = QConv2d(
                self.chout, (self.kernel_size, 1), stride=(self.stride, 1),
                padding=(pad, 0), nl=nl, q=self.q, name="conv",
            )(x)
        else:
            y = QConv1d(
                self.chout, self.kernel_size, stride=self.stride, padding=pad,
                nl=nl, q=self.q, name="conv",
            )(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.ndim == 3 and y.ndim == 4:
                inject = inject[:, None]
            y = y + inject
        if self.norm:
            y = nn.GroupNorm(num_groups=self.norm_groups, name="norm1")(y)

        if self.dconv:
            if self.freq:
                b, fr, t, c = y.shape
                y = y.reshape(b * fr, t, c)
            y = DConv(self.chout, self.dconv_comp, self.dconv_depth, self.dconv_init,
                      lstm=self.dconv_lstm, attn=self.dconv_attn, q=self.q, name="dconv")(y)
            if self.freq:
                y = y.reshape(b, fr, t, c)

        if self.rewrite:
            k = 1 + 2 * self.context
            if self.freq:
                z = QConv2d(2 * self.chout, k, padding=self.context, nl="glu",
                            norm_groups=ng, q=self.q, name="rewrite")(y)
            else:
                z = QConv1d(2 * self.chout, k, padding=self.context, nl="glu",
                            norm_groups=ng, q=self.q, name="rewrite")(y)
        else:
            z = y
        return z


class HDecLayer(nn.Module):
    """Hybrid decoder layer (hdemucsq.py:259-347). Returns (z, pre).

    ``last=True`` swaps the transposed conv for the combiner decoder
    (replace_decoderq at htdemucsq.py:1184-1194); ``train_res_dec`` is set
    by the model for the final frequency decoder only (decoder.3).
    """

    chin: int
    chout: int
    last: bool = False
    kernel_size: int = 8
    stride: int = 4
    freq: bool = True
    empty: bool = False
    norm: bool = False
    norm_groups: int = 4
    context: int = 1
    pad: bool = True
    rewrite: bool = True
    train_res_dec: bool = False
    gelu: bool = True  # MultiWrap bands defer the GELU to the band merge
    tr_bias: bool = True  # MultiWrap bands own the conv_tr bias (seam math)
    # context_freq=False: the rewrite conv spans context only over TIME
    # (kernel [1, 1+2c], hdemucsq.py:303-306) — required inside MultiWrap so
    # frequency bands stay independent (hdemucsq.py:187-188).
    context_freq: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array, skip: Array | None, length: int | None):
        import dataclasses as _dc

        pad = self.kernel_size // 4 if self.pad else 0
        ng = self.norm_groups if self.norm else None

        if not self.empty:
            x = QAdd(q=self.q, name="add")(x, skip)
            if self.rewrite:
                k = 1 + 2 * self.context
                if self.freq:
                    ksz = k if self.context_freq else (1, k)
                    pd = self.context if self.context_freq else (0, self.context)
                    y = QConv2d(2 * self.chin, ksz, padding=pd, nl="glu",
                                norm_groups=ng, q=self.q, name="rewrite")(x)
                else:
                    y = QConv1d(2 * self.chin, k, padding=self.context, nl="glu",
                                norm_groups=ng, q=self.q, name="rewrite")(x)
            else:
                y = x
        else:
            y = x
            assert skip is None

        dec_q = self.q
        if self.last:
            dec_q = _dc.replace(self.q, train_res_dec=self.train_res_dec and self.q.qat)
            if self.freq:
                z = QConvTr2dDecoder(self.chout, (self.kernel_size, 1), (self.stride, 1),
                                     use_bias=True, q=dec_q, name="conv_tr")(y)
            else:
                z = QConvTr1dDecoder(self.chout, self.kernel_size, self.stride,
                                     use_bias=True, q=dec_q, name="conv_tr")(y)
        else:
            nl = "gelu" if self.gelu else None
            if self.freq:
                z = QConvTranspose2d(self.chout, (self.kernel_size, 1), (self.stride, 1),
                                     nl=nl, use_bias=self.tr_bias, q=self.q, name="conv_tr")(y)
            else:
                z = QConvTranspose1d(self.chout, self.kernel_size, self.stride,
                                     nl=nl, use_bias=self.tr_bias, q=self.q, name="conv_tr")(y)

        if self.freq:
            if pad:
                z = z[..., pad:-pad, :, :]  # freq axis is -3 for 4D and 5D (stacked planes)
        else:
            z = z[..., pad : pad + length, :]
        return z, y


class BLSTM(nn.Module):
    """Chunked BiLSTM with overlap framing (demucsq.py:42-91).

    [B, T, C] -> [B, T, C]. When T > max_steps the input is unfolded into
    50%-overlapping frames of max_steps, the LSTM runs per frame, and the
    outputs are stitched back keeping each frame's center region.
    """

    dim: int
    layers: int = 1
    max_steps: int | None = None
    skip: bool = False
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from fqss_tpu.nn import QDense
        from fqss_tpu.nn.lstm import QLSTM

        b, t, c = x.shape
        y0 = x
        framed = False
        if self.max_steps is not None and t > self.max_steps:
            width = self.max_steps
            stride = width // 2
            nframes = max(0, (t - width + stride - 1) // stride) + 1
            pad_to = (nframes - 1) * stride + width
            xp = jnp.pad(x, ((0, 0), (0, pad_to - t), (0, 0)))
            idx = np.arange(nframes)[:, None] * stride + np.arange(width)[None, :]
            x = xp[:, idx, :].reshape(b * nframes, width, c)
            framed = True

        h = x
        for layer in range(self.layers):
            h = QLSTM(self.dim, bidirectional=True, mode=self.q.lstm_mode, q=self.q,
                      name=f"lstm_{layer}")(h)
            if layer < self.layers - 1:
                h = QDense(self.dim, q=self.q, name=f"proj_{layer}")(h)
        h = QDense(self.dim, q=self.q, name="linear")(h)

        if framed:
            frames = h.reshape(b, nframes, width, self.dim)
            limit = stride // 2
            out = [frames[:, 0, :-limit]]
            for k in range(1, nframes - 1):
                out.append(frames[:, k, limit:-limit])
            if nframes > 1:
                out.append(frames[:, nframes - 1, limit:])
            h = jnp.concatenate(out, axis=1)[:, :t]
        if self.skip:
            h = QAdd(q=self.q, name="add")(h, y0)
        return h


class LocalState(nn.Module):
    """Decaying local attention (demucsq.py:185-244). [B, T, C].

    Content/query/key 1x1 convs; attention logits get a learned per-head
    decay penalty on |i-j|; self-reference masked at -100.
    """

    channels: int
    heads: int = 4
    ndecay: int = 4
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, c = x.shape
        h = self.heads
        d = c // h
        queries = QConv1d(c, 1, q=self.q, act_quant=False, name="query")(x).reshape(b, t, h, d)
        keys = QConv1d(c, 1, q=self.q, act_quant=False, name="key")(x).reshape(b, t, h, d)
        dots = jnp.einsum("bthd,bshd->bhts", keys, queries) / math.sqrt(d)

        if self.ndecay:
            decay_q = QConv1d(h * self.ndecay, 1, q=self.q, act_quant=False, name="query_decay")(x)
            decay_q = jax.nn.sigmoid(decay_q.reshape(b, t, h, self.ndecay)) / 2.0
            delta = jnp.abs(jnp.arange(t)[:, None] - jnp.arange(t)[None, :]).astype(x.dtype)
            decays = jnp.arange(1, self.ndecay + 1, dtype=x.dtype)
            decay_kernel = -decays[:, None, None] * delta[None] / math.sqrt(self.ndecay)
            dots = dots + jnp.einsum("fts,bshf->bhts", decay_kernel, decay_q)

        dots = jnp.where(jnp.eye(t, dtype=bool)[None, None], -100.0, dots)
        weights = jax.nn.softmax(dots, axis=2)
        content = QConv1d(c, 1, q=self.q, act_quant=False, name="content")(x).reshape(b, t, h, d)
        result = jnp.einsum("bhts,bthd->bshd", weights, content).reshape(b, t, c)
        return x + QConv1d(c, 1, q=self.q, act_quant=False, name="proj")(result)


def rescale_params(params, reference: float = 0.1):
    """Demucs weight-rescaling init trick (demucsq.py:94-107 rescale_module):
    every conv/dense kernel (and its bias) is divided by
    sqrt(std(kernel)/reference). Apply once after init, before training."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        if "kernel" in out and not isinstance(out["kernel"], dict):
            k = jnp.asarray(out["kernel"])
            std = jnp.std(k)
            scale = jnp.where(std > 0, jnp.sqrt(std / reference), 1.0)
            out["kernel"] = k / scale
            if "bias" in out and not isinstance(out["bias"], dict):
                out["bias"] = jnp.asarray(out["bias"]) / scale
        return out

    return walk(params)
