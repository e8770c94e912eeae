"""Int8 serving engine for the FQSS ConvTasNet.

Runs the fake-quantized ConvTasNet forward (models/convtasnet.py, itself a
redesign of reference quantization/qat/models/convtasnetq.py:118-223) with
the FLOP-dominant 1x1 convolutions executed as TRUE int8 matmuls on the MXU
(s8 x s8 -> s32, the v5e's double-rate path), instead of fake-quant f32.

Why this is exact: after QAT, every activation-quantizer output lies on its
8-bit grid ``y = delta * X + mn`` with integer ``X in [0, 255]``, and every
weight-quantizer output on its per-channel symmetric grid
``w = s_w[c] * W`` with ``W in [-128, 127]`` (quant/fake_quant.py,
reference qat_quant.py:125-147). A 1x1 conv of grid values is therefore

    out[c] = delta * s_w[c] * dot(X - 128, W)[c]
           + (mn + 128 * delta) * s_w[c] * sum_k(W[k, c]) + bias[c]

with the dot computed exactly in int32 — bit-equal to the f32 fake-quant
forward up to f32 accumulation order (the int32 accumulation is exact, so
the engine is if anything *more* accurate). 1x1 convs carry ~99% of the
TCN's MACs; the encoder/decoder/depthwise convs and the GN/PReLU/requant
epilogues run in f32 or bf16 (``compute_dtype``).

The engine consumes the standard QAT ``variables`` (params + qparams) —
no separate export step — and mirrors the quantizer placement of the flax
model exactly (same grid per site).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fqss_tpu.models.convtasnet import EPS, ConvTasNet
from fqss_tpu.separation.splitter import postprocess, preprocess
from fqss_tpu.serve.common import (
    Grid as _Grid,
    Int8Weight as _Int8Weight,
    QAct as _QAct,
    act_grid as _act_grid,
    dequant_weight as _dequant_weight,
    gn1,
    int8_matmul as _int1x1,
    int8_weight as _int8_weight,
    prelu as _prelu,
    requant as _requant,
)

Array = jax.Array


def _gn1(x: Array, scale: Array, bias: Array, eps: float = EPS) -> Array:
    """GroupNorm(num_groups=1) over (T, C) — the reference's gLN."""
    return gn1(x, scale, bias, eps)


class ConvTasNetInt8Engine:
    """Deployable int8 inference engine built from a QAT checkpoint.

    Usage::

        engine = ConvTasNetInt8Engine(model, variables)   # host-side prep
        y = engine(x)                                     # jitted int8 forward

    ``compute_dtype`` selects the dtype of the non-int8 convs
    (encoder/decoder/depthwise): 'float32' for bit-parity testing,
    'bfloat16' for serving speed. ``use_pallas=True`` routes the fused
    matmul+dequant+NL+requant through
    :func:`fqss_tpu.ops.pallas_quant.int8_matmul_requant_pallas` (identical
    semantics; one VMEM pass per tile).
    """

    def __init__(
        self,
        model: ConvTasNet,
        variables: dict,
        compute_dtype: str = "bfloat16",
        use_pallas: bool = False,
    ):
        if model.q.n_combiner > 2:
            raise NotImplementedError("combiner chains beyond 2 planes (matches the reference configs)")
        self.model = model
        self.use_pallas = use_pallas
        self.dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        p = jax.device_get(variables["params"])
        qp = jax.device_get(variables["qparams"])
        q = model.q
        if not (q.qat and q.act_quant and q.weight_quant):
            raise ValueError("int8 engine requires a fully fake-quantized model")
        if q.act_n_bits != 8 or q.weight_n_bits != 8 or q.out_act_n_bits != 8:
            raise NotImplementedError("the int8 engine maps 8-bit grids onto s8 hardware")
        if q.in_quant and (q.in_act_n_bits != 8 or q.inout_nl_quant):
            raise NotImplementedError(
                "the int8 engine's input requant assumes a linear 8-bit input grid"
            )

        P: dict[str, Any] = {}
        G: dict[str, _Grid] = {}
        W8: dict[str, _Int8Weight] = {}

        # ---- encoder (f32/bf16 conv; weight fake-quant folded host-side)
        enc = p["encoder"]["conv"]
        enc_q = qp["encoder"]["conv"]
        P["enc_kernel"] = _dequant_weight(enc["kernel"], enc_q.get("weight_fake_quantize"), ch_axis=2)
        G["enc_out"] = _act_grid(enc_q["activation_fake_quantize"])
        if "in_quantizer" in qp["encoder"]:
            G["enc_in"] = _act_grid(qp["encoder"]["in_quantizer"], q.in_act_n_bits)

        # ---- masker
        mk_p, mk_q = p["masker"], qp["masker"]
        P["bn_norm_scale"] = np.asarray(mk_p["bottleneck_norm"]["norm"]["scale"], np.float32)
        P["bn_norm_bias"] = np.asarray(mk_p["bottleneck_norm"]["norm"]["bias"], np.float32)
        G["bn_norm"] = _act_grid(mk_q["bottleneck_norm"]["activation_fake_quantize"])
        W8["bn_conv"] = _int8_weight(
            mk_p["bottleneck_conv"]["kernel"],
            mk_q["bottleneck_conv"]["weight_fake_quantize"],
            mk_p["bottleneck_conv"].get("bias"),
        )
        G["bn_conv"] = _act_grid(mk_q["bottleneck_conv"]["activation_fake_quantize"])

        self.blocks = []
        n_blocks = model.n_repeats * model.n_blocks
        idx = 0
        for s in range(model.n_repeats):
            for layer in range(model.n_blocks):
                name = f"tcn_{s}_{layer}"
                bp, bq = mk_p[name], mk_q[name]
                blk = {
                    "w_in": _int8_weight(bp["conv_in"]["kernel"], bq["conv_in"]["weight_fake_quantize"], bp["conv_in"].get("bias")),
                    "a_in": np.asarray(bp["conv_in"]["nl"]["alpha"], np.float32),
                    "g_in": _act_grid(bq["conv_in"]["activation_fake_quantize"]),
                    "ni_scale": np.asarray(bp["norm_in"]["norm"]["scale"], np.float32),
                    "ni_bias": np.asarray(bp["norm_in"]["norm"]["bias"], np.float32),
                    "g_ni": _act_grid(bq["norm_in"]["activation_fake_quantize"]),
                    "w_dw": _dequant_weight(bp["conv_dw"]["kernel"], bq["conv_dw"].get("weight_fake_quantize"), ch_axis=2),
                    "b_dw": np.asarray(bp["conv_dw"]["bias"], np.float32) if "bias" in bp["conv_dw"] else None,
                    "a_dw": np.asarray(bp["conv_dw"]["nl"]["alpha"], np.float32),
                    "g_dw": _act_grid(bq["conv_dw"]["activation_fake_quantize"]),
                    "nd_scale": np.asarray(bp["norm_dw"]["norm"]["scale"], np.float32),
                    "nd_bias": np.asarray(bp["norm_dw"]["norm"]["bias"], np.float32),
                    "g_nd": _act_grid(bq["norm_dw"]["activation_fake_quantize"]),
                    "w_res": _int8_weight(bp["res_conv"]["kernel"], bq["res_conv"]["weight_fake_quantize"], bp["res_conv"].get("bias")),
                    "g_res": _act_grid(bq["res_conv"]["activation_fake_quantize"]),
                    "w_skip": _int8_weight(bp["skip_conv"]["kernel"], bq["skip_conv"]["weight_fake_quantize"], bp["skip_conv"].get("bias")),
                    "g_skip": _act_grid(bq["skip_conv"]["activation_fake_quantize"]),
                    "g_add": _act_grid(bq["add"]["activation_fake_quantize"]),
                    "dilation": 2**layer,
                }
                if idx > 0:
                    blk["g_skip_add"] = _act_grid(mk_q[f"skip_add_{idx - 1}"]["activation_fake_quantize"])
                self.blocks.append(blk)
                idx += 1
        assert len(self.blocks) == n_blocks

        P["mask_prelu_alpha"] = np.asarray(mk_p["mask_prelu"]["nl"]["alpha"], np.float32)
        G["mask_prelu"] = _act_grid(mk_q["mask_prelu"]["activation_fake_quantize"])
        W8["mask_conv"] = _int8_weight(
            mk_p["mask_conv"]["kernel"], mk_q["mask_conv"]["weight_fake_quantize"], mk_p["mask_conv"].get("bias")
        )
        G["mask_conv"] = _act_grid(mk_q["mask_conv"]["activation_fake_quantize"])
        G["mul"] = _act_grid(qp["mul"]["activation_fake_quantize"])

        # ---- decoder (+ combiner residual block)
        dp, dq = p["decoder"], qp["decoder"]
        P["dec_kernel"] = _dequant_weight(dp["kernel"], dq.get("weight_fake_quantize"), ch_axis=2)
        if q.out_quant:
            G["dec_out"] = _act_grid(dq["activation_fake_quantize"], q.out_act_n_bits)
        if q.n_combiner > 1:
            rq = dq["residual_error_block"]
            rp = dp["residual_error_block"]
            P["re_kernel"] = _dequant_weight(
                rp["residual_encoder"]["kernel"], rq["residual_encoder"].get("weight_fake_quantize"), ch_axis=2
            )
            P["re_bias"] = (
                np.asarray(rp["residual_encoder"]["bias"], np.float32) if "bias" in rp["residual_encoder"] else None
            )
            G["re_latent"] = _act_grid(rq["activation_fake_quantize"])
            if q.out_quant:
                G["dec_res_out"] = _act_grid(dq["activation_fake_quantize_residual"], q.out_act_n_bits)
            if q.train_res_dec:
                P["res_dec_kernel"] = _dequant_weight(
                    rp["residual_decoder_kernel"], rq.get("weight_fake_quantize_dec"), ch_axis=2
                )

        self.P, self.G, self.W8 = P, G, W8
        self._fwd = jax.jit(self._forward)

    # -- jitted forward ----------------------------------------------------

    def __call__(self, x: Array) -> Array:
        return self._fwd(x)

    def _int1x1_requant(self, qa: _QAct, w: _Int8Weight, g_out: _Grid, alpha=None) -> _QAct:
        """Fused int8 matmul -> dequant -> [PReLU/ReLU] -> requant -> int8.

        alpha: None = identity, float/array = PReLU slope (0.0 = ReLU).
        """
        if self.use_pallas:
            from fqss_tpu.ops.pallas_quant import int8_matmul_requant_pallas

            corr = (qa.grid.mn + 128.0 * qa.grid.delta) * w.scale * w.sum_w
            if w.bias is not None:
                corr = corr + w.bias
            a = 1.0 if alpha is None else float(np.asarray(alpha).reshape(-1)[0])
            b, t, k = qa.Xs.shape
            out = int8_matmul_requant_pallas(
                qa.Xs.reshape(b * t, k),
                jnp.asarray(w.w_int),
                jnp.asarray(qa.grid.delta * w.scale),
                jnp.asarray(corr),
                jnp.float32(a),
                jnp.float32(g_out.delta),
                jnp.float32(g_out.mn),
            )
            return _QAct(out.reshape(b, t, -1), g_out)
        v = _int1x1(qa, w)
        if alpha is not None:
            v = _prelu(v, jnp.asarray(alpha))
        return _requant(v, g_out)

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

    def _convT(self, x: Array, w: np.ndarray, stride: int, kernel_size: int) -> Array:
        pad = kernel_size - 1
        return lax.conv_general_dilated(
            x.astype(self.dt),
            jnp.flip(jnp.asarray(w, self.dt), axis=0),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )

    def _forward(self, x: Array) -> Array:
        m = self.model
        P, G, W8 = self.P, self.G, self.W8
        q = m.q

        x = preprocess(x, n_splitter=q.n_splitter)  # [B, C', T]
        B = x.shape[0]
        x = jnp.swapaxes(x, 1, 2)  # NTC

        if "enc_in" in G:
            x = _requant(x, G["enc_in"]).f32
        feats = self._conv(x, P["enc_kernel"], stride=m.stride)
        feats_q = _requant(feats, G["enc_out"])

        # bottleneck
        h = _gn1(feats_q.f32, P["bn_norm_scale"], P["bn_norm_bias"])
        h_q = _requant(h, G["bn_norm"])
        h_q = self._int1x1_requant(h_q, W8["bn_conv"], G["bn_conv"])

        skip_sum_q = None
        for i, blk in enumerate(self.blocks):
            f_q = self._int1x1_requant(h_q, blk["w_in"], blk["g_in"], alpha=blk["a_in"])
            f = _gn1(f_q.f32, jnp.asarray(blk["ni_scale"]), jnp.asarray(blk["ni_bias"]))
            f_q = _requant(f, blk["g_ni"])
            f = self._conv(
                f_q.f32, blk["w_dw"], padding=blk["dilation"], dilation=blk["dilation"], groups=f_q.Xs.shape[-1]
            )
            if blk["b_dw"] is not None:
                f = f + jnp.asarray(blk["b_dw"])
            f = _prelu(f, jnp.asarray(blk["a_dw"]))
            f_q = _requant(f, blk["g_dw"])
            f = _gn1(f_q.f32, jnp.asarray(blk["nd_scale"]), jnp.asarray(blk["nd_bias"]))
            f_q = _requant(f, blk["g_nd"])
            residual_q = self._int1x1_requant(f_q, blk["w_res"], blk["g_res"])
            skip_q = self._int1x1_requant(f_q, blk["w_skip"], blk["g_skip"])
            h_q = _requant(h_q.f32 + residual_q.f32, blk["g_add"])
            if skip_sum_q is None:
                skip_sum_q = skip_q
            else:
                skip_sum_q = _requant(skip_sum_q.f32 + skip_q.f32, blk["g_skip_add"])

        o = _prelu(skip_sum_q.f32, jnp.asarray(P["mask_prelu_alpha"]))
        o_q = _requant(o, G["mask_prelu"])
        if m.mask_act == "relu":
            o_q = self._int1x1_requant(o_q, W8["mask_conv"], G["mask_conv"], alpha=0.0)
        else:
            o = jax.nn.sigmoid(_int1x1(o_q, W8["mask_conv"]))
            o_q = _requant(o, G["mask_conv"])

        # mask multiply: [B, T, S*F] -> [B, S, F, T] like the model
        t = o_q.Xs.shape[1]
        mask = o_q.f32.reshape(B, t, m.n_srcs, m.n_filters).transpose(0, 2, 3, 1)
        feats_sfm = jnp.swapaxes(feats_q.f32, 1, 2)[:, None]  # [B, 1, F, T]
        masked = _requant(mask * feats_sfm, G["mul"]).f32  # [B, S, F, T]
        masked = masked.reshape(B * m.n_srcs, m.n_filters, -1)
        masked = jnp.swapaxes(masked, 1, 2)  # [B*S, T, F]

        # decoder + combiner planes
        x0 = self._convT(masked, P["dec_kernel"], stride=m.stride, kernel_size=m.kernel_size)
        y = _requant(x0, G["dec_out"]).f32 if q.out_quant else x0
        planes = [y]
        if q.n_combiner == 2:
            Y_q = self._conv(y, P["re_kernel"], stride=m.stride)
            if P.get("re_bias") is not None:
                Y_q = Y_q + jnp.asarray(P["re_bias"])
            Y1 = _requant(masked - Y_q, G["re_latent"]).f32
            w_dec = P["res_dec_kernel"] if q.train_res_dec else P["dec_kernel"]
            dec = self._convT(Y1, w_dec, stride=m.stride, kernel_size=m.kernel_size)
            y = _requant(dec, G["dec_res_out"]).f32 if q.out_quant else dec
            planes.append(y)

        length = planes[0].shape[-2]
        out = jnp.stack(planes).reshape(q.n_combiner, B, m.n_srcs, length, 1)
        out = jnp.swapaxes(out, -1, -2)
        return postprocess(out, n_combiner=q.n_combiner)
