"""HTDemucs (Hybrid Transformer Demucs) with declarative fake-quantization.

TPU-native redesign of the reference HTDemucsQ
(reference: quantization/qat/models/htdemucsq.py:27-1242): a spectrogram
branch (4 HEncLayer/HDecLayer 2-D convs over frequency) in parallel with a
waveform branch (4 1-D layers), coupled by a 5-layer cross-domain
transformer (alternating self-attention layers per branch and cross-
attention layers between them, sinusoidal 1-D/2-D embeddings, LayerScale,
norm-first + GroupNorm norm_out), CaC complex-as-channels masking, and an
iSTFT whose output adds to the time branch.

With the default config (depth=4, nfft=4096) the branches never merge by
stride; they only exchange information in the transformer — so the
`inject`/`empty` merge path (htdemucsq.py:1082-1094) is structurally absent
here (asserted in the constructor).

Splitter/combiner: the freq branch splits the normalized CaC spectrogram
(normalize=True), the time branch the normalized waveform (normalize=False)
— htdemucsq.py:1027-1028; combiner planes come from the two last decoders
(freq one with a trainable residual decoder, htdemucsq.py:1194).

Quantization plan parity: htdemucsq.py:1157-1242.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.models.demucs_blocks import HDecLayer, HEncLayer, ScaledEmbedding, pad1d_reflect
from fqss_tpu.nn import QAdd, QConst, QConv1d, QDense, QLayerNorm, QMul, QNl
from fqss_tpu.nn.attention import QMultiheadAttention
from fqss_tpu.nn.layers import make_act_quantizer
from fqss_tpu.ops.stft import ispectro, spectro
from fqss_tpu.quant.spec import FLOAT, QuantSpec
from fqss_tpu.separation.splitter import postprocess, preprocess

Array = jax.Array


def create_sin_embedding(length: int, dim: int, max_period: float = 10000.0) -> np.ndarray:
    """1-D sin embedding [length, 1, dim] (htdemucsq.py:27-40)."""
    pos = np.arange(length, dtype=np.float32).reshape(-1, 1, 1)
    half = dim // 2
    adim = np.arange(half, dtype=np.float32).reshape(1, 1, -1)
    phase = pos / (max_period ** (adim / (half - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)], axis=-1).astype(np.float32)


def create_2d_sin_embedding(d_model: int, height: int, width: int, max_period: float = 10000.0) -> np.ndarray:
    """2-D sin embedding [1, d_model, H, W] (htdemucsq.py:43-76)."""
    if d_model % 4 != 0:
        raise ValueError("2d sin embedding needs d_model % 4 == 0")
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    div = np.exp(np.arange(0.0, half, 2, dtype=np.float32) * -(math.log(max_period) / half))
    pos_w = np.arange(width, dtype=np.float32)[:, None]
    pos_h = np.arange(height, dtype=np.float32)[:, None]
    pe[0:half:2] = np.sin(pos_w * div).T[:, None, :].repeat(height, 1)
    pe[1:half:2] = np.cos(pos_w * div).T[:, None, :].repeat(height, 1)
    pe[half::2] = np.sin(pos_h * div).T[:, :, None].repeat(width, 2)
    pe[half + 1 :: 2] = np.cos(pos_h * div).T[:, :, None].repeat(width, 2)
    return pe[None]


class _QLayerScaleLast(nn.Module):
    """Channel-last LayerScale with quantized mul (demucsq.py:19-39)."""

    channels: int
    init: float = 1e-4
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", lambda rng: jnp.full((self.channels,), self.init, jnp.float32))
        return QMul(q=self.q, name="mul")(x, scale)


class _GroupNormT(nn.Module):
    """MyGroupNorm (htdemucsq.py:124-135): GroupNorm over (T, C) per batch of
    a [B, T, C] tensor, followed by a quantized Const site."""

    num_groups: int = 1
    epsilon: float = 1e-5
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon, name="norm")(x)
        return QConst(q=self.q, name="const")(y)


class SelfAttnLayer(nn.Module):
    """MyTransformerEncoderLayer (htdemucsq.py:138-217), norm-first variant
    with LayerScale, GELU FFN, and GroupNorm norm_out. [B, L, C]."""

    d_model: int
    nhead: int
    dim_feedforward: int
    gelu: bool = True
    layer_scale: bool = True
    layer_scale_init: float = 1e-4
    norm_out: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = QLayerNorm(q=self.q, name="norm1")(x)
        h = QMultiheadAttention(self.d_model, self.nhead, q=self.q, name="self_attn")(h, h, h)
        if self.layer_scale:
            h = _QLayerScaleLast(self.d_model, self.layer_scale_init, q=self.q, name="gamma_1")(h)
        x = QAdd(q=self.q, name="add_norm1")(x, h)

        h = QLayerNorm(q=self.q, name="norm2")(x)
        h = QDense(self.dim_feedforward, nl="gelu" if self.gelu else "relu", q=self.q, name="linear1")(h)
        h = QDense(self.d_model, q=self.q, name="linear2")(h)
        if self.layer_scale:
            h = _QLayerScaleLast(self.d_model, self.layer_scale_init, q=self.q, name="gamma_2")(h)
        x = QAdd(q=self.q, name="add_norm2")(x, h)
        if self.norm_out:
            x = _GroupNormT(q=self.q, name="norm_out")(x)
        return x


class CrossAttnLayer(nn.Module):
    """CrossTransformerEncoderLayer (htdemucsq.py:220-328). q:[B,T,C] k:[B,S,C]."""

    d_model: int
    nhead: int
    dim_feedforward: int
    gelu: bool = True
    layer_scale: bool = True
    layer_scale_init: float = 1e-4
    norm_out: bool = True
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, qx: Array, kx: Array) -> Array:
        hq = QLayerNorm(q=self.q, name="norm1")(qx)
        hk = QLayerNorm(q=self.q, name="norm2")(kx)
        h = QMultiheadAttention(self.d_model, self.nhead, q=self.q, name="cross_attn")(hq, hk, hk)
        if self.layer_scale:
            h = _QLayerScaleLast(self.d_model, self.layer_scale_init, q=self.q, name="gamma_1")(h)
        x = QAdd(q=self.q, name="add_norm1")(qx, h)

        h = QLayerNorm(q=self.q, name="norm3")(x)
        h = QDense(self.dim_feedforward, nl="gelu" if self.gelu else "relu", q=self.q, name="linear1")(h)
        h = QDense(self.d_model, q=self.q, name="linear2")(h)
        if self.layer_scale:
            h = _QLayerScaleLast(self.d_model, self.layer_scale_init, q=self.q, name="gamma_2")(h)
        x = QAdd(q=self.q, name="add_norm2")(x, h)
        if self.norm_out:
            x = _GroupNormT(q=self.q, name="norm_out")(x)
        return x


class CrossTransformerEncoder(nn.Module):
    """Cross-domain transformer (htdemucsq.py:331-523): alternating per-branch
    self-attention and between-branch cross-attention over the flattened
    spectrogram tokens [B, T1*Fr, C] and waveform tokens [B, T2, C]."""

    dim: int
    num_heads: int = 8
    num_layers: int = 5
    hidden_scale: float = 4.0
    max_period: float = 10000.0
    weight_pos_embed: float = 1.0
    norm_in: bool = True
    cross_first: bool = False
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, x: Array, xt: Array) -> tuple[Array, Array]:
        # x: [B, Fr, T1, C] ; xt: [B, T2, C]
        b, fr, t1, c = x.shape
        pos2d = create_2d_sin_embedding(c, fr, t1, self.max_period)  # [1, C, Fr, T1]
        pos2d = jnp.asarray(pos2d).transpose(0, 3, 2, 1).reshape(1, t1 * fr, c)  # b (t1 fr) c
        pos2d = QConst(q=self.q, name="const_pos_emb_2d")(pos2d)
        x = x.transpose(0, 2, 1, 3).reshape(b, t1 * fr, c)  # (t1 fr) token order
        if self.norm_in:
            x = QLayerNorm(q=self.q, name="norm_in")(x)
        x = QAdd(q=self.q, name="add_x")(x, self.weight_pos_embed * pos2d)

        t2 = xt.shape[1]
        pos = jnp.asarray(create_sin_embedding(t2, c, self.max_period)).transpose(1, 0, 2)  # [1, T2, C]
        pos = QConst(q=self.q, name="const_pos_emb")(pos)
        if self.norm_in:
            xt = QLayerNorm(q=self.q, name="norm_in_t")(xt)
        xt = QAdd(q=self.q, name="add_xt")(xt, self.weight_pos_embed * pos)

        hidden = int(self.dim * self.hidden_scale)
        classic_parity = 1 if self.cross_first else 0
        for idx in range(self.num_layers):
            if idx % 2 == classic_parity:
                x = SelfAttnLayer(self.dim, self.num_heads, hidden, q=self.q, name=f"layer_{idx}")(x)
                xt = SelfAttnLayer(self.dim, self.num_heads, hidden, q=self.q, name=f"layer_t_{idx}")(xt)
            else:
                old_x = x
                x = CrossAttnLayer(self.dim, self.num_heads, hidden, q=self.q, name=f"layer_{idx}")(x, xt)
                xt = CrossAttnLayer(self.dim, self.num_heads, hidden, q=self.q, name=f"layer_t_{idx}")(xt, old_x)

        x = x.reshape(b, t1, fr, c).transpose(0, 2, 1, 3)  # back to [B, Fr, T1, C]
        return x, xt


class HTDemucs(nn.Module):
    """HTDemucs QAT model (htdemucsq.py:532-1151).

    __call__: [B, audio_channels, T] -> [B, n_sources, audio_channels, T].
    ``train=True`` uses the input length as the segment (training mode);
    eval inputs shorter than segment*samplerate are right-padded like
    use_train_segment (htdemucsq.py:997-1007) by the caller/OLA.
    """

    sources: tuple = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    nfft: int = 4096
    depth: int = 4
    kernel_size: int = 8
    stride: int = 4
    time_stride: int = 2
    context: int = 1
    context_enc: int = 0
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_depth: int = 2
    dconv_comp: float = 8
    dconv_init: float = 1e-3
    freq_emb_weight: float = 0.2
    emb_scale: float = 10
    emb_smooth: bool = True
    t_layers: int = 5
    t_heads: int = 8
    t_hidden_scale: float = 4.0
    # 1x1 quantized channel up/downsamplers around the transformer
    # (htdemucsq.py:880-892,1104-1118; quantized at 1198-1201). The reference
    # surgery requires them (its quantize_model assumes bottom_channels > 0).
    bottom_channels: int = 0
    cac: bool = True
    samplerate: int = 44100
    segment: float = 10
    q: QuantSpec = FLOAT
    # Serving hook: when set, replaces the whole transformer block — the
    # bottom_channels 1x1 up/downsamplers plus the cross transformer — with
    # an external (x, xt) -> (x, xt) function. serve/htdemucs_int8.py uses
    # it to run those sites as true s8 MXU matmuls on the learned grids
    # while the conv branches keep this module's (weight-folded) math.
    transformer_override: object = None

    @property
    def n_srcs(self) -> int:
        return len(self.sources)

    @property
    def hop_length(self) -> int:
        return self.nfft // 4

    def _spec(self, x: Array) -> Array:
        """STFT with demucs's exact padding dance (htdemucsq.py:931-951)."""
        hl = self.hop_length
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        x = pad1d_reflect(x, pad, pad + le * hl - x.shape[-1])
        z = spectro(x, self.nfft, hl)[..., :-1, :]
        return z[..., 2 : 2 + le]

    def _ispec(self, z: Array, length: int) -> Array:
        """iSTFT inverse of _spec (htdemucsq.py:953-961)."""
        hl = self.hop_length
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (2, 2)])
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        x = ispectro(z, hl, length=le)
        return x[..., pad : pad + length]

    def _magnitude(self, z: Array) -> Array:
        """CaC: complex [B,C,Fr,T] -> real channels [B,C*2,Fr,T] (htdemucsq.py:963-972)."""
        if self.cac:
            b, c, fr, t = z.shape
            m = jnp.stack([z.real, z.imag], axis=2)  # [B, C, 2, Fr, T]
            return m.reshape(b, c * 2, fr, t)
        return jnp.abs(z)

    def _mask(self, m: Array) -> Array:
        """[B,S,C*2,Fr,T] -> complex [B,S,C,Fr,T] (htdemucsq.py:974-978)."""
        b, s, c2, fr, t = m.shape
        out = m.reshape(b, s, c2 // 2, 2, fr, t)
        return jax.lax.complex(out[:, :, :, 0], out[:, :, :, 1])

    @nn.compact
    def __call__(self, mix: Array, train: bool = True) -> Array:
        length = mix.shape[-1]
        length_pre_pad = None
        if not train:
            training_length = int(self.segment * self.samplerate)
            if length < training_length:
                length_pre_pad = length
                mix = jnp.pad(mix, [(0, 0)] * (mix.ndim - 1) + [(0, training_length - length)])
                length = training_length

        # ---- pre-process (htdemucsq.py:997-1030)
        z = self._spec(mix)
        mag = self._magnitude(z)  # [B, C', Fr, T]
        mean = mag.mean(axis=(1, 2, 3), keepdims=True)
        std = mag.std(axis=(1, 2, 3), keepdims=True)
        x = (mag - mean) / (1e-5 + std)
        meant = mix.mean(axis=(1, 2), keepdims=True)
        stdt = mix.std(axis=(1, 2), keepdims=True)
        xt = (mix - meant) / (1e-5 + stdt)
        x = preprocess(x, n_splitter=self.q.n_splitter)  # widen channels
        xt = preprocess(xt, n_splitter=self.q.n_splitter, normalize=False)

        b = x.shape[0]
        fq, t_spec = x.shape[-2], x.shape[-1]

        # channels-last layouts
        x = x.transpose(0, 2, 3, 1)  # [B, Fr, T, C]
        xt = jnp.swapaxes(xt, 1, 2)  # [B, T, C]

        # ---- encoders
        chout = self.channels
        saved, saved_t, lengths, lengths_t = [], [], [], []
        enc_channels = []
        for idx in range(self.depth):
            norm = idx >= self.norm_starts
            enc_channels.append(chout)
            lengths.append(x.shape[-3])  # freq size
            lengths_t.append(xt.shape[-2])
            xt = HEncLayer(
                chout, self.kernel_size, self.stride, freq=False, norm=norm,
                norm_groups=self.norm_groups, context=self.context_enc,
                dconv_depth=self.dconv_depth, dconv_comp=self.dconv_comp,
                dconv_init=self.dconv_init, q=self.q,
                is_input_layer=(idx == 0), name=f"tencoder_{idx}",
            )(xt)
            saved_t.append(xt)
            x = HEncLayer(
                chout, self.kernel_size, self.stride, freq=True, norm=norm,
                norm_groups=self.norm_groups, context=self.context_enc,
                dconv_depth=self.dconv_depth, dconv_comp=self.dconv_comp,
                dconv_init=self.dconv_init, q=self.q,
                is_input_layer=(idx == 0), name=f"encoder_{idx}",
            )(x)
            if idx == 0 and self.freq_emb_weight:
                frs = jnp.arange(x.shape[-3])
                emb = ScaledEmbedding(
                    x.shape[-3], x.shape[-1], scale=self.emb_scale,
                    smooth=self.emb_smooth, q=self.q, name="freq_emb",
                )(frs)  # [Fr, C]
                emb_b = jnp.broadcast_to(emb[None, :, None, :], x.shape)
                scaled = QMul(q=self.q, name="mul_freq")(emb_b, jnp.asarray(self.freq_emb_weight, x.dtype))
                x = QAdd(q=self.q, name="add_freq")(x, scaled)
            saved.append(x)
            chout = int(self.growth * chout)

        # ---- cross transformer
        if self.t_layers > 0 and self.transformer_override is not None:
            x, xt = self.transformer_override(x, xt)
        elif self.t_layers > 0:
            if self.bottom_channels:
                bb, fr_b, t_b, c_b = x.shape
                x2 = QConv1d(self.bottom_channels, 1, q=self.q, name="channel_upsampler")(
                    x.reshape(bb, fr_b * t_b, c_b))
                x = x2.reshape(bb, fr_b, t_b, self.bottom_channels)
                xt = QConv1d(self.bottom_channels, 1, q=self.q, name="channel_upsampler_t")(xt)
            x, xt = CrossTransformerEncoder(
                dim=x.shape[-1], num_heads=self.t_heads, num_layers=self.t_layers,
                hidden_scale=self.t_hidden_scale, q=self.q, name="crosstransformer",
            )(x, xt)
            if self.bottom_channels:
                x2 = QConv1d(c_b, 1, q=self.q, name="channel_downsampler")(
                    x.reshape(bb, fr_b * t_b, self.bottom_channels))
                x = x2.reshape(bb, fr_b, t_b, c_b)
                xt = QConv1d(c_b, 1, q=self.q, name="channel_downsampler_t")(xt)

        # ---- decoders
        chin = self.audio_channels * self.n_srcs
        chin_z = chin * 2 if self.cac else chin
        for idx in range(self.depth):
            # decoder idx corresponds to encoder depth-1-idx
            enc_idx = self.depth - 1 - idx
            last = enc_idx == 0
            norm = enc_idx >= self.norm_starts
            chout_dec = chin_z if last else enc_channels[enc_idx - 1] if enc_idx > 0 else chin_z
            skip = saved.pop(-1)
            x, _pre = HDecLayer(
                chin=enc_channels[enc_idx],
                chout=chout_dec,
                last=last,
                kernel_size=self.kernel_size,
                stride=self.stride,
                freq=True,
                norm=norm,
                norm_groups=self.norm_groups,
                context=self.context,
                train_res_dec=True,  # decoder.3 trains its residual decoder (htdemucsq.py:1194)
                q=self.q,
                name=f"decoder_{idx}",
            )(x, skip, lengths.pop(-1))
            skip_t = saved_t.pop(-1)
            chout_t = chin if last else enc_channels[enc_idx - 1] if enc_idx > 0 else chin
            xt, _pre_t = HDecLayer(
                chin=enc_channels[enc_idx],
                chout=chout_t,
                last=last,
                kernel_size=self.kernel_size,
                stride=self.stride,
                freq=False,
                norm=norm,
                norm_groups=self.norm_groups,
                context=self.context,
                train_res_dec=False,
                q=self.q,
                name=f"tdecoder_{idx}",
            )(xt, skip_t, lengths_t.pop(-1))

        # back to channel-first planes
        n_comb = self.q.n_combiner
        if n_comb == 1:
            x = x[None]
            xt = xt[None]
        x = x.transpose(0, 1, 4, 2, 3)  # [n_comb, B, C', Fr, T]
        xt = jnp.swapaxes(xt, -1, -2)  # [n_comb, B, C, T]
        x = x.reshape(n_comb, b, self.n_srcs, -1, fq, t_spec)
        xt = xt.reshape(n_comb, b, self.n_srcs, -1, xt.shape[-1])

        # ---- post-process (htdemucsq.py:1033-1064)
        x = postprocess(x, n_combiner=n_comb)
        xt_c = postprocess(xt, n_combiner=n_comb)
        x = x * std[:, None] + mean[:, None]
        xt_c = xt_c * stdt[:, None] + meant[:, None]
        zout = self._mask(x)  # [B, S, C, Fq, T] complex
        wave = self._ispec(zout, length)  # [B, S, C, length]
        xt_c = xt_c[..., :length]
        out = xt_c + wave
        if length_pre_pad:
            out = out[..., :length_pre_pad]
        return out
