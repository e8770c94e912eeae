"""Int8 serving engine for the FQSS Sepformer.

Runs the fake-quantized Sepformer forward (models/sepformer.py, a redesign
of reference quantization/qat/models/sepformerq.py:342-527) with every
FLOP-dominant matmul executed as a TRUE s8 x s8 -> s32 MXU matmul on the
learned activation/weight grids (serve/common.py math):

* per transformer layer (2 dual-path blocks x 2 transformer blocks x
  n_layers): the MHA in-projection and out-projection and the two FFN
  linears — >90% of the model's MACs;
* the masker bottleneck 1x1 conv, the mask-head Conv2d (a dense over
  channels-last), and the end 1x1 conv.

Between int8 sites activations are materialized as int8 planes
(1 byte/elem). The attention bmms (QK^T, probs x V) stay in f32/bf16: the
attention-logit and softmax quantizer sites are NO-OPS in the reference
(the `attn - ...` vs `attn = ...` typo, qat_layers.py:934,936 — replicated
by nn/attention.py), so the softmax probabilities are not on any grid.
Also f32/bf16: norms, the encoder/decoder convs, and the mask-head gate
convs (their input is the un-quantized merge_segments sum, which lies off
every 8-bit grid — faithful to the model's quantizer placement).

The engine consumes standard QAT ``variables`` (params + qparams) and is
layer-exact vs the fake-quant forward up to f32 summation order; end-to-end
it agrees at the model's own cross-compilation grid-noise floor (see
tests/test_serve_transformer_int8.py).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.models.dptnet import merge_segments, split_segments
from fqss_tpu.models.sepformer import EPS, EPS_T, Sepformer, sinusoidal_pe
from fqss_tpu.separation.splitter import postprocess, preprocess
from fqss_tpu.serve.common import (
    Grid,
    QAct,
    act_grid,
    check_8bit_spec,
    conv1d,
    conv_transpose1d,
    dequant_weight,
    gn1,
    int8_matmul,
    int8_weight,
    layer_norm,
    prelu,
    requant,
)

Array = jax.Array


def _norm_params(p: dict) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(p["norm"]["scale"], np.float32), np.asarray(p["norm"]["bias"], np.float32)


def _mha_pack(p: dict, qp: dict) -> dict:
    """Freeze one QMultiheadAttention (nn/attention.py) into engine form."""
    return {
        "w_in": int8_weight(p["in_proj_kernel"], qp["weight_fake_quantize_in"], p["in_proj_bias"]),
        "w_out": int8_weight(p["out_proj_kernel"], qp["weight_fake_quantize_out"], p["out_proj_bias"]),
        "g_q": act_grid(qp["activation_fake_quantize_q"]),
        "g_k": act_grid(qp["activation_fake_quantize_k"]),
        "g_v": act_grid(qp["activation_fake_quantize_v"]),
        "g_div": act_grid(qp["activation_fake_quantize_div"]),
        "g_head": act_grid(qp["activation_fake_quantize_head"]),
        "g_out": act_grid(qp["activation_fake_quantize"]),
    }


def _tlayer_pack(p: dict, qp: dict) -> dict:
    """One Sepformer TransformerLayer (models/sepformer.py:55-74)."""
    n1s, n1b = _norm_params(p["norm1"])
    n2s, n2b = _norm_params(p["norm2"])
    return {
        "n1_scale": n1s, "n1_bias": n1b,
        "g_norm1": act_grid(qp["norm1"]["activation_fake_quantize"]),
        "mha": _mha_pack(p["mha"], qp["mha"]),
        "n2_scale": n2s, "n2_bias": n2b,
        "g_norm2": act_grid(qp["norm2"]["activation_fake_quantize"]),
        "w_ffn_in": int8_weight(p["ffn_in"]["kernel"], qp["ffn_in"]["weight_fake_quantize"], p["ffn_in"].get("bias")),
        "g_ffn_in": act_grid(qp["ffn_in"]["activation_fake_quantize"]),
        "g_relu": act_grid(qp["ffn_relu"]["activation_fake_quantize"]),
        "w_ffn_out": int8_weight(p["ffn_out"]["kernel"], qp["ffn_out"]["weight_fake_quantize"], p["ffn_out"].get("bias")),
        "g_ffn_out": act_grid(qp["ffn_out"]["activation_fake_quantize"]),
    }


class SepformerInt8Engine:
    """Deployable int8 inference engine built from a Sepformer QAT checkpoint.

    Usage::

        engine = SepformerInt8Engine(model, variables)   # host-side prep
        y = engine(x)                                    # jitted int8 forward

    ``compute_dtype`` selects the dtype of the non-int8 convs/bmms:
    'float32' for parity testing, 'bfloat16' for serving speed.
    """

    def __init__(self, model: Sepformer, variables: dict, compute_dtype: str = "bfloat16"):
        q = model.q
        if q.n_combiner > 2:
            raise NotImplementedError("combiner chains beyond 2 planes (matches the reference configs)")
        check_8bit_spec(q)
        self.model = model
        self.dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        p = jax.device_get(variables["params"])
        qp = jax.device_get(variables["qparams"])

        P: dict[str, Any] = {}
        G: dict[str, Grid] = {}

        # ---- encoder (f32/bf16 conv + ReLU; weight fake-quant folded)
        P["enc_kernel"] = dequant_weight(p["encoder"]["conv"]["kernel"],
                                         qp["encoder"]["conv"].get("weight_fake_quantize"), ch_axis=2)
        G["enc_out"] = act_grid(qp["encoder"]["conv"]["activation_fake_quantize"])
        if "in_quantizer" in qp.get("encoder", {}):
            G["enc_in"] = act_grid(qp["encoder"]["in_quantizer"], q.in_act_n_bits)

        # ---- masker
        mp, mq = p["masker"], qp["masker"]
        P["norm_scale"], P["norm_bias"] = _norm_params(mp["norm"])
        G["norm"] = act_grid(mq["norm"]["activation_fake_quantize"])
        P["w_bn"] = int8_weight(mp["conv1d"]["kernel"], mq["conv1d"]["weight_fake_quantize"], None)
        G["bn"] = act_grid(mq["conv1d"]["activation_fake_quantize"])

        self.dp_blocks = []
        for i in range(model.n_repeats):
            dp_p, dp_q = mp[f"dp_{i}"], mq[f"dp_{i}"]
            blk = {}
            for side in ("intra", "inter"):
                tb_p, tb_q = dp_p[f"{side}_transformer_block"], dp_q[f"{side}_transformer_block"]
                ns, nb = _norm_params(tb_p["norm"])
                blk[side] = {
                    "g_pos_const": act_grid(tb_q["pos_const"]["activation_fake_quantize"]),
                    "g_pos_add": act_grid(tb_q["pos_add"]["activation_fake_quantize"]),
                    "layers": [
                        _tlayer_pack(tb_p[f"layer_{j}"], tb_q[f"layer_{j}"])
                        for j in range(model.n_layers)
                    ],
                    "n_scale": ns, "n_bias": nb,
                    "g_norm": act_grid(tb_q["norm"]["activation_fake_quantize"]),
                }
                gs, gb = _norm_params(dp_p[f"{side}_norm"])
                blk[f"{side}_norm_scale"], blk[f"{side}_norm_bias"] = gs, gb
                blk[f"g_{side}_norm"] = act_grid(dp_q[f"{side}_norm"]["activation_fake_quantize"])
                blk[f"g_{side}_add"] = act_grid(dp_q[f"{side}_add"]["activation_fake_quantize"])
            self.dp_blocks.append(blk)

        P["prelu_alpha"] = np.asarray(mp["prelu"]["nl"]["alpha"], np.float32)
        G["prelu"] = act_grid(mq["prelu"]["activation_fake_quantize"])
        P["w_conv2d"] = int8_weight(mp["conv2d"]["kernel"], mq["conv2d"]["weight_fake_quantize"],
                                    mp["conv2d"].get("bias"))
        G["conv2d"] = act_grid(mq["conv2d"]["activation_fake_quantize"])
        # gate convs: input is the un-quantized merge sum -> f32 with folded weights
        for gate in ("net_out", "net_gate"):
            P[f"{gate}_kernel"] = dequant_weight(mp[gate]["kernel"],
                                                 mq[gate].get("weight_fake_quantize"), ch_axis=2)
            P[f"{gate}_bias"] = np.asarray(mp[gate]["bias"], np.float32) if "bias" in mp[gate] else None
            G[gate] = act_grid(mq[gate]["activation_fake_quantize"])
        G["masker_mul"] = act_grid(mq["mul"]["activation_fake_quantize"])
        P["w_end"] = int8_weight(mp["end_conv"]["kernel"], mq["end_conv"]["weight_fake_quantize"], None)
        G["end_conv"] = act_grid(mq["end_conv"]["activation_fake_quantize"])

        G["mul"] = act_grid(qp["mul"]["activation_fake_quantize"])

        # ---- decoder (+ combiner residual plane)
        dp, dq = p["decoder"], qp["decoder"]
        P["dec_kernel"] = dequant_weight(dp["kernel"], dq.get("weight_fake_quantize"), ch_axis=2)
        if q.out_quant:
            G["dec_out"] = act_grid(dq["activation_fake_quantize"], q.out_act_n_bits)
        if q.n_combiner > 1:
            rp, rq = dp["residual_error_block"], dq["residual_error_block"]
            P["re_kernel"] = dequant_weight(rp["residual_encoder"]["kernel"],
                                            rq["residual_encoder"].get("weight_fake_quantize"), ch_axis=2)
            G["re_latent"] = act_grid(rq["activation_fake_quantize"])
            if q.out_quant:
                G["dec_res_out"] = act_grid(dq["activation_fake_quantize_residual"], q.out_act_n_bits)
            if q.train_res_dec:
                P["res_dec_kernel"] = dequant_weight(rp["residual_decoder_kernel"],
                                                     rq.get("weight_fake_quantize_dec"), ch_axis=2)

        self.pe = sinusoidal_pe(2500, model.n_filters)
        self.P, self.G = P, G
        self._fwd = jax.jit(self._forward)

    def __call__(self, x: Array) -> Array:
        return self._fwd(x)

    # -- jitted forward ----------------------------------------------------

    def _bmm(self, a: Array, b: Array, sub: str) -> Array:
        return jnp.einsum(sub, a.astype(self.dt), b.astype(self.dt),
                          preferred_element_type=jnp.float32)

    def _mha(self, qa: QAct, L: dict) -> Array:
        """Quantized MHA on an on-grid input; returns the f32 grid output."""
        m = self.model
        E, h = m.n_filters, m.n_heads
        d = E // h
        B, Lq, _ = qa.Xs.shape
        y3 = int8_matmul(qa, L["w_in"])  # [B, L, 3E] (+bias)
        # per-tensor quantization commutes with slicing (the model quantizes
        # the full 3E projection then slices, nn/attention.py:74-78)
        Q = requant(y3[..., :E], L["g_q"]).f32
        K = requant(y3[..., E : 2 * E], L["g_k"]).f32
        V = requant(y3[..., 2 * E :], L["g_v"]).f32
        Qh = Q.reshape(B, Lq, h, d).transpose(0, 2, 1, 3) / math.sqrt(d)
        Qh = requant(Qh, L["g_div"]).f32
        Kh = K.reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        Vh = V.reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(self._bmm(Qh, Kh, "bhqd,bhkd->bhqk"), axis=-1)
        heads = self._bmm(attn, Vh, "bhqk,bhkd->bhqd")
        y = heads.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        y_q = requant(y, L["g_head"])  # g_head commutes with the head merge
        out = int8_matmul(y_q, L["w_out"])
        return requant(out, L["g_out"]).f32

    def _tlayer(self, x: Array, L: dict) -> Array:
        xn = requant(layer_norm(x, L["n1_scale"], L["n1_bias"], EPS_T), L["g_norm1"])
        x = x + self._mha(xn, L["mha"])
        xn2 = requant(layer_norm(x, L["n2_scale"], L["n2_bias"], EPS_T), L["g_norm2"])
        y = requant(int8_matmul(xn2, L["w_ffn_in"]), L["g_ffn_in"])
        y = requant(jax.nn.relu(y.f32), L["g_relu"])
        y = requant(int8_matmul(y, L["w_ffn_out"]), L["g_ffn_out"])
        return x + y.f32

    def _tblock(self, x: Array, tb: dict) -> Array:
        pe = jnp.asarray(self.pe)[None, : x.shape[1]]
        pe_q = requant(pe, tb["g_pos_const"]).f32
        x = requant(x + pe_q, tb["g_pos_add"]).f32
        for L in tb["layers"]:
            x = self._tlayer(x, L)
        return requant(layer_norm(x, tb["n_scale"], tb["n_bias"], EPS_T), tb["g_norm"]).f32

    def _forward(self, x: Array) -> Array:
        m = self.model
        q = m.q
        P, G = self.P, self.G

        x = preprocess(x, n_splitter=q.n_splitter)  # [B, C', T]
        B = x.shape[0]
        x = jnp.swapaxes(x, 1, 2)
        if "enc_in" in G:
            x = requant(x, G["enc_in"]).f32
        feats = jax.nn.relu(conv1d(x, P["enc_kernel"], self.dt, stride=m.stride))
        feats_q = requant(feats, G["enc_out"])  # [B, M, F]

        xn = requant(gn1(feats_q.f32, P["norm_scale"], P["norm_bias"], EPS), G["norm"])
        xc = requant(int8_matmul(xn, P["w_bn"]), G["bn"])

        segs, gap = split_segments(xc.f32, m.chunk_size)  # [B, K, S, F]
        b, k, s, f = segs.shape
        h = segs
        for blk in self.dp_blocks:
            intra = jnp.swapaxes(h, 1, 2).reshape(b * s, k, f)
            intra = self._tblock(intra, blk["intra"])
            intra = jnp.swapaxes(intra.reshape(b, s, k, f), 1, 2)
            intra = requant(gn1(intra, blk["intra_norm_scale"], blk["intra_norm_bias"], EPS),
                            blk["g_intra_norm"]).f32
            intra = requant(intra + h, blk["g_intra_add"]).f32
            inter = intra.reshape(b * k, s, f)
            inter = self._tblock(inter, blk["inter"])
            inter = inter.reshape(b, k, s, f)
            inter = requant(gn1(inter, blk["inter_norm_scale"], blk["inter_norm_bias"], EPS),
                            blk["g_inter_norm"]).f32
            h = requant(inter + intra, blk["g_inter_add"]).f32

        y = requant(prelu(h, jnp.asarray(P["prelu_alpha"])), G["prelu"])
        y = requant(int8_matmul(y, P["w_conv2d"]), G["conv2d"]).f32  # [B, K, S, spk*F]
        y = y.reshape(b, k, s, m.n_srcs, f).transpose(0, 3, 1, 2, 4).reshape(b * m.n_srcs, k, s, f)
        y = merge_segments(y, gap, lambda a, bb: a + bb)  # off-grid sum -> f32 gates

        gate_out = conv1d(y, P["net_out_kernel"], self.dt)
        if P["net_out_bias"] is not None:
            gate_out = gate_out + jnp.asarray(P["net_out_bias"])
        gate_out = requant(jnp.tanh(gate_out), G["net_out"]).f32
        gate = conv1d(y, P["net_gate_kernel"], self.dt)
        if P["net_gate_bias"] is not None:
            gate = gate + jnp.asarray(P["net_gate_bias"])
        gate = requant(jax.nn.sigmoid(gate), G["net_gate"]).f32
        y = requant(gate_out * gate, G["masker_mul"])
        y = requant(jax.nn.relu(int8_matmul(y, P["w_end"])), G["end_conv"]).f32
        mask = y.reshape(B, m.n_srcs, -1, m.n_filters)  # [B, S, M, F]

        masked = requant(mask * feats_q.f32[:, None], G["mul"]).f32
        masked = masked.reshape(B * m.n_srcs, -1, m.n_filters)

        x0 = conv_transpose1d(masked, P["dec_kernel"], self.dt, stride=m.stride,
                              kernel_size=m.kernel_size)
        y0 = requant(x0, G["dec_out"]).f32 if q.out_quant else x0
        planes = [y0]
        if q.n_combiner == 2:
            Y_q = conv1d(y0, P["re_kernel"], self.dt, stride=m.stride)
            Y1 = requant(masked - Y_q, G["re_latent"]).f32
            w_dec = P["res_dec_kernel"] if q.train_res_dec else P["dec_kernel"]
            dec = conv_transpose1d(Y1, w_dec, self.dt, stride=m.stride, kernel_size=m.kernel_size)
            y1 = requant(dec, G["dec_res_out"]).f32 if q.out_quant else dec
            planes.append(y1)

        length = planes[0].shape[-2]
        out = jnp.stack(planes).reshape(q.n_combiner, B, m.n_srcs, length, 1)
        return postprocess(jnp.swapaxes(out, -1, -2), n_combiner=q.n_combiner)
