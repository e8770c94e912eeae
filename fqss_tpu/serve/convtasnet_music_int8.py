"""Int8 serving engine for ConvTasNet-music (stereo, 4-stem MUSDB).

Same construction as :mod:`fqss_tpu.serve.convtasnet_int8` applied to the
music variant (models/convtasnet_music.py; reference
quantization/qat/models/convtasnetq_music.py:178-333): every 1x1 conv in
the R=4 x X=10 TCN (conv1x1, pointwise, bottleneck, mask conv) and the
Linear decoder run as true s8 x s8 -> s32 MXU matmuls on the activation
grids, with int8-materialized activations between stages; the
encoder/depthwise convs, norms, and overlap-and-add run in f32/bf16.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fqss_tpu.models.convtasnet_music import EPS, ConvTasNetMusic
from fqss_tpu.models.dptnet import overlap_and_add
from fqss_tpu.separation.splitter import postprocess, preprocess
from fqss_tpu.serve.convtasnet_int8 import (
    _act_grid,
    _dequant_weight,
    _gn1,
    _int1x1,
    _int8_weight,
    _prelu,
    _QAct,
    _requant,
)

Array = jax.Array


class ConvTasNetMusicInt8Engine:
    """Deployable int8 inference engine for the music ConvTasNet.

    Usage matches ConvTasNetInt8Engine: build from (model, QAT variables),
    call with [B, audio_channels, T]; returns [B, n_sources, ac, T'].
    """

    def __init__(self, model: ConvTasNetMusic, variables: dict, compute_dtype: str = "bfloat16"):
        if model.q.n_combiner > 2:
            raise NotImplementedError("combiner chains beyond 2 planes")
        self.model = model
        self.dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        q = model.q
        if not (q.qat and q.act_quant and q.weight_quant):
            raise ValueError("int8 engine requires a fully fake-quantized model")
        if q.act_n_bits != 8 or q.weight_n_bits != 8 or q.out_act_n_bits != 8:
            raise NotImplementedError("the int8 engine maps 8-bit grids onto s8 hardware")
        if q.in_quant and (q.in_act_n_bits != 8 or q.inout_nl_quant):
            raise NotImplementedError(
                "the int8 engine's input requant assumes a linear 8-bit input grid"
            )
        p = jax.device_get(variables["params"])
        qp = jax.device_get(variables["qparams"])

        P: dict[str, Any] = {}
        G: dict[str, Any] = {}
        W8: dict[str, Any] = {}

        P["enc_kernel"] = _dequant_weight(
            p["encoder"]["conv"]["kernel"], qp["encoder"]["conv"].get("weight_fake_quantize"), ch_axis=2
        )
        G["enc_out"] = _act_grid(qp["encoder"]["conv"]["activation_fake_quantize"], q.act_n_bits)
        if "in_quantizer" in qp["encoder"]:
            G["enc_in"] = _act_grid(qp["encoder"]["in_quantizer"], q.in_act_n_bits)

        sp, sq = p["separator"], qp["separator"]
        P["ln_scale"] = np.asarray(sp["layer_norm"]["norm"]["scale"], np.float32)
        P["ln_bias"] = np.asarray(sp["layer_norm"]["norm"]["bias"], np.float32)
        G["ln"] = _act_grid(sq["layer_norm"]["activation_fake_quantize"], q.act_n_bits)
        W8["bottleneck"] = _int8_weight(
            sp["bottleneck"]["kernel"], sq["bottleneck"]["weight_fake_quantize"], None
        )
        G["bottleneck"] = _act_grid(sq["bottleneck"]["activation_fake_quantize"], q.act_n_bits)

        self.blocks = []
        for r in range(model.n_repeats):
            for xi in range(model.n_blocks):
                name = f"tcn_{r}_{xi}"
                bp, bq = sp[name], sq[name]
                ds_p, ds_q = bp["dsconv"], bq["dsconv"]
                self.blocks.append({
                    "w_in": _int8_weight(bp["conv1x1"]["kernel"], bq["conv1x1"]["weight_fake_quantize"], None),
                    "a_in": np.asarray(bp["conv1x1"]["nl"]["alpha"], np.float32),
                    "g_in": _act_grid(bq["conv1x1"]["activation_fake_quantize"], q.act_n_bits),
                    "n1_scale": np.asarray(bp["norm"]["norm"]["scale"], np.float32),
                    "n1_bias": np.asarray(bp["norm"]["norm"]["bias"], np.float32),
                    "g_n1": _act_grid(bq["norm"]["activation_fake_quantize"], q.act_n_bits),
                    "w_dw": _dequant_weight(ds_p["depthwise"]["kernel"], ds_q["depthwise"].get("weight_fake_quantize"), ch_axis=2),
                    "a_dw": np.asarray(ds_p["depthwise"]["nl"]["alpha"], np.float32),
                    "g_dw": _act_grid(ds_q["depthwise"]["activation_fake_quantize"], q.act_n_bits),
                    "n2_scale": np.asarray(ds_p["norm"]["norm"]["scale"], np.float32),
                    "n2_bias": np.asarray(ds_p["norm"]["norm"]["bias"], np.float32),
                    "g_n2": _act_grid(ds_q["norm"]["activation_fake_quantize"], q.act_n_bits),
                    "w_pw": _int8_weight(ds_p["pointwise"]["kernel"], ds_q["pointwise"]["weight_fake_quantize"], None),
                    "g_pw": _act_grid(ds_q["pointwise"]["activation_fake_quantize"], q.act_n_bits),
                    "g_add": _act_grid(bq["add"]["activation_fake_quantize"], q.act_n_bits),
                    "dilation": 2**xi,
                    "padding": (model.conv_kernel - 1) * 2**xi // 2,
                })

        W8["mask_conv"] = _int8_weight(sp["mask_conv"]["kernel"], sq["mask_conv"]["weight_fake_quantize"], None)
        G["mask_conv"] = _act_grid(sq["mask_conv"]["activation_fake_quantize"], q.act_n_bits)
        G["mul"] = _act_grid(qp["mul"]["activation_fake_quantize"], q.act_n_bits)

        dp, dq = p["decoder"], qp["decoder"]
        # Linear decoder kernel [cin, ac*kernel]; stored as (1, K, N) for _int8_weight
        W8["decoder"] = _int8_weight(
            np.asarray(dp["kernel"])[None], dq["weight_fake_quantize"], None
        )
        P["dec_kernel"] = _dequant_weight(dp["kernel"], dq.get("weight_fake_quantize"), ch_axis=1)
        if q.out_quant:
            G["dec_out"] = _act_grid(dq["activation_fake_quantize"], q.out_act_n_bits)
        if q.n_combiner > 1:
            rp, rq = dp["residual_error_block"], dq["residual_error_block"]
            P["re_kernel"] = _dequant_weight(
                rp["residual_encoder_kernel"], rq.get("weight_fake_quantize"), ch_axis=1
            )
            P["re_bias"] = (
                np.asarray(rp["residual_encoder_bias"], np.float32)
                if "residual_encoder_bias" in rp else None
            )
            G["re_latent"] = _act_grid(rq["activation_fake_quantize"], q.act_n_bits)
            if q.out_quant:
                G["dec_res_out"] = _act_grid(dq["activation_fake_quantize_residual"], q.out_act_n_bits)
            if q.train_res_dec:
                P["res_dec_kernel"] = _dequant_weight(
                    rp["residual_decoder_kernel"], rq.get("weight_fake_quantize_dec"), ch_axis=1
                )

        self.P, self.G, self.W8 = P, G, W8
        self._fwd = jax.jit(self._forward)

    def __call__(self, x: Array) -> Array:
        return self._fwd(x)

    def _conv(self, x: Array, w: np.ndarray, stride: int = 1, padding: int = 0, dilation: int = 1, groups: int = 1) -> Array:
        return lax.conv_general_dilated(
            x.astype(self.dt),
            jnp.asarray(w, self.dt),
            window_strides=(stride,),
            padding=[(padding, padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        )

    def _forward(self, x: Array) -> Array:
        m = self.model
        q = m.q
        P, G, W8 = self.P, self.G, self.W8

        x = preprocess(x, n_splitter=q.n_splitter, normalize=False)
        B = x.shape[0]
        feats_in = jnp.swapaxes(x, 1, 2)
        if "enc_in" in G:
            feats_in = _requant(feats_in, G["enc_in"]).f32
        feats = jax.nn.relu(self._conv(feats_in, P["enc_kernel"], stride=m.stride))
        feats_q = _requant(feats, G["enc_out"])  # [B, K, N]

        # channel-wise LayerNorm over the filter axis
        h = feats_q.f32
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
        h = (h - mu) * lax.rsqrt(var + EPS) * P["ln_scale"] + P["ln_bias"]
        h_q = _requant(h, G["ln"])
        h_q = _requant(_int1x1(h_q, W8["bottleneck"]), G["bottleneck"])

        for blk in self.blocks:
            y = _int1x1(h_q, blk["w_in"])
            y = _prelu(y, jnp.asarray(blk["a_in"]))
            y_q = _requant(y, blk["g_in"])
            y = _gn1(y_q.f32, jnp.asarray(blk["n1_scale"]), jnp.asarray(blk["n1_bias"]))
            y_q = _requant(y, blk["g_n1"])
            y = self._conv(
                y_q.f32, blk["w_dw"], padding=blk["padding"], dilation=blk["dilation"],
                groups=y_q.Xs.shape[-1],
            )
            y = _prelu(y, jnp.asarray(blk["a_dw"]))
            y_q = _requant(y, blk["g_dw"])
            y = _gn1(y_q.f32, jnp.asarray(blk["n2_scale"]), jnp.asarray(blk["n2_bias"]))
            y_q = _requant(y, blk["g_n2"])
            y_q = _requant(_int1x1(y_q, blk["w_pw"]), blk["g_pw"])
            h_q = _requant(y_q.f32 + h_q.f32, blk["g_add"])

        mask = _int1x1(h_q, W8["mask_conv"])
        mask = jax.nn.relu(mask) if m.mask_act == "relu" else jax.nn.sigmoid(mask)
        mask_q = _requant(mask, G["mask_conv"])

        b, k, _ = mask_q.Xs.shape
        mask = mask_q.f32.reshape(B, k, m.n_srcs, m.n_filters).transpose(0, 2, 1, 3)  # [B, C, K, N]
        masked_q = _requant(mask * feats_q.f32[:, None], G["mul"])  # [B, C, K, N]

        # Linear decoder as int8 matmul over the filter axis
        mq = _QAct(masked_q.Xs.reshape(B * m.n_srcs, k, m.n_filters), masked_q.grid)
        dec = _int1x1(mq, W8["decoder"])  # [B*C, K, ac*kernel]
        y0 = _requant(dec, G["dec_out"]).f32 if q.out_quant else dec
        planes = [y0]
        if q.n_combiner == 2:
            Y_q = jnp.dot(y0.astype(self.dt), jnp.asarray(P["re_kernel"], self.dt),
                          preferred_element_type=jnp.float32)
            if P.get("re_bias") is not None:
                Y_q = Y_q + jnp.asarray(P["re_bias"])
            Y1 = _requant(mq.f32 - Y_q, G["re_latent"]).f32
            w_dec = P["res_dec_kernel"] if q.train_res_dec else P["dec_kernel"]
            dec1 = jnp.dot(Y1.astype(self.dt), jnp.asarray(w_dec, self.dt),
                           preferred_element_type=jnp.float32)
            y1 = _requant(dec1, G["dec_res_out"]).f32 if q.out_quant else dec1
            planes.append(y1)

        out = jnp.stack(planes).reshape(
            q.n_combiner, B, m.n_srcs, k, m.audio_channels, m.kernel_size
        )
        out = jnp.swapaxes(out, 3, 4)  # [n_comb, B, C, ac, K, kernel]
        out = overlap_and_add(out, m.stride)
        return postprocess(out, n_combiner=q.n_combiner)
