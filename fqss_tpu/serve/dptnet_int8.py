"""Int8 serving engine for the FQSS DPTNet.

Runs the fake-quantized DPTNet forward (models/dptnet.py, a redesign of
reference quantization/qat/models/dptnetq.py:311-478) with the matmuls whose
inputs live on a learned 8-bit grid executed as TRUE s8 x s8 -> s32 MXU
matmuls (serve/common.py): the MHA in/out-projections of every dual-path
layer, the separator bottleneck 1x1, the DPT output Conv2d (dense), the
gated output convs, and the mask 1x1 conv.

Stays f32/bf16 (with host-folded fake-quant weights) where the model's
quantizer placement leaves inputs OFF-grid — exactness over enthusiasm:

* the LSTM feed-forward (delegated to the flax QLSTM on its own variable
  subtree — identical recurrence, any lstm_mode) and the post-LSTM linear
  (its input is relu(LSTM grid output); 0 is not a grid point of the
  asymmetric grid, dptnetq.py:94 has no quant site there);
* the first row layer's in-projection (split_segments zero-padding is
  off-grid until the first add/norm quant site);
* the attention bmms (the reference's attn/softmax quant sites are no-ops);
* the tiny Linear decoder (E -> kernel_size=2) and its residual block.

End-to-end the engine agrees with the jitted fake-quant forward at the
model's own cross-compilation grid-noise floor
(tests/test_serve_transformer_int8.py).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.models.dptnet import EPS, DPTNet, merge_segments, overlap_and_add, split_segments
from fqss_tpu.nn.lstm import QLSTM
from fqss_tpu.separation.splitter import postprocess, preprocess
from fqss_tpu.serve.common import (
    Grid,
    QAct,
    act_grid,
    check_8bit_spec,
    conv1d,
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


class DPTNetInt8Engine:
    """Deployable int8 inference engine built from a DPTNet QAT checkpoint.

    Usage matches the other engines: build from (model, QAT variables), call
    with [B, T]; returns [B, n_srcs, T'].
    """

    def __init__(self, model: DPTNet, variables: dict, compute_dtype: str = "bfloat16",
                 pallas_lstm: bool = False):
        q = model.q
        if pallas_lstm:
            import dataclasses

            q = dataclasses.replace(q, pallas_lstm=True)
        if q.n_combiner > 2:
            raise NotImplementedError("combiner chains beyond 2 planes")
        check_8bit_spec(q)
        self.model = model
        self.dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        p = jax.device_get(variables["params"])
        qp = jax.device_get(variables["qparams"])
        qs = jax.device_get(variables.get("qstats", {}))

        P: dict[str, Any] = {}
        G: dict[str, Grid] = {}

        P["enc_kernel"] = dequant_weight(p["encoder"]["conv"]["kernel"],
                                         qp["encoder"]["conv"].get("weight_fake_quantize"), ch_axis=2)
        G["enc_out"] = act_grid(qp["encoder"]["conv"]["activation_fake_quantize"])
        if "in_quantizer" in qp.get("encoder", {}):
            G["enc_in"] = act_grid(qp["encoder"]["in_quantizer"], q.in_act_n_bits)

        P["ln_scale"], P["ln_bias"] = _norm_params(p["enc_LN"])
        G["enc_LN"] = act_grid(qp["enc_LN"]["activation_fake_quantize"])

        sp, sq = p["separator"], qp["separator"]
        ss = qs.get("separator", {})
        P["w_bn"] = int8_weight(sp["BN"]["kernel"], sq["BN"]["weight_fake_quantize"], None)
        G["bn"] = act_grid(sq["BN"]["activation_fake_quantize"])

        dpt_p, dpt_q = sp["DPT"], sq["DPT"]
        dpt_s = ss.get("DPT", {})
        self.layers = []
        for i in range(model.layer):
            for side in ("row", "col"):
                name = f"{side}_{i}"
                lp, lq = dpt_p[name], dpt_q[name]
                mp, mq = lp["self_attn"], lq["self_attn"]
                n1s, n1b = _norm_params(lp["norm1"])
                n2s, n2b = _norm_params(lp["norm2"])
                self.layers.append({
                    "side": side,
                    # row_0's input carries off-grid split-padding zeros
                    "on_grid": not (side == "row" and i == 0),
                    "mha": {
                        "w_in": int8_weight(mp["in_proj_kernel"], mq["weight_fake_quantize_in"],
                                            mp["in_proj_bias"]),
                        "w_in_f32": dequant_weight(mp["in_proj_kernel"],
                                                   mq["weight_fake_quantize_in"], ch_axis=1),
                        "b_in": np.asarray(mp["in_proj_bias"], np.float32),
                        "w_out": int8_weight(mp["out_proj_kernel"], mq["weight_fake_quantize_out"],
                                             mp["out_proj_bias"]),
                        "g_q": act_grid(mq["activation_fake_quantize_q"]),
                        "g_k": act_grid(mq["activation_fake_quantize_k"]),
                        "g_v": act_grid(mq["activation_fake_quantize_v"]),
                        "g_div": act_grid(mq["activation_fake_quantize_div"]),
                        "g_head": act_grid(mq["activation_fake_quantize_head"]),
                        "g_out": act_grid(mq["activation_fake_quantize"]),
                    },
                    "g_add1": act_grid(lq["add_norm1"]["activation_fake_quantize"]),
                    "n1_scale": n1s, "n1_bias": n1b,
                    "g_norm1": act_grid(lq["norm1"]["activation_fake_quantize"]),
                    "lstm_vars": {
                        k: v for k, v in (
                            ("params", lp["lstm"]),
                            ("qparams", lq.get("lstm", {})),
                            ("qstats", dpt_s.get(name, {}).get("lstm")),
                        ) if v
                    },
                    "w_linear": dequant_weight(lp["linear"]["kernel"],
                                               lq["linear"].get("weight_fake_quantize"), ch_axis=1),
                    "b_linear": np.asarray(lp["linear"]["bias"], np.float32)
                    if "bias" in lp["linear"] else None,
                    "g_linear": act_grid(lq["linear"]["activation_fake_quantize"]),
                    "g_add2": act_grid(lq["add_norm2"]["activation_fake_quantize"]),
                    "n2_scale": n2s, "n2_bias": n2b,
                    "g_norm2": act_grid(lq["norm2"]["activation_fake_quantize"]),
                })
        P["prelu_alpha"] = np.asarray(dpt_p["out_prelu"]["nl"]["alpha"], np.float32)
        G["prelu"] = act_grid(dpt_q["out_prelu"]["activation_fake_quantize"])
        P["w_out_conv"] = int8_weight(dpt_p["out_conv"]["kernel"],
                                      dpt_q["out_conv"]["weight_fake_quantize"],
                                      dpt_p["out_conv"].get("bias"))
        G["out_conv"] = act_grid(dpt_q["out_conv"]["activation_fake_quantize"])

        G["merge_add"] = act_grid(sq["add"]["activation_fake_quantize"])
        for gate in ("output", "output_gate"):
            P[f"w_{gate}"] = int8_weight(sp[gate]["kernel"], sq[gate]["weight_fake_quantize"],
                                         sp[gate].get("bias"))
            G[gate] = act_grid(sq[gate]["activation_fake_quantize"])
        G["sep_mul"] = act_grid(sq["mul"]["activation_fake_quantize"])

        P["w_mask"] = int8_weight(p["mask_conv1x1"]["kernel"],
                                  qp["mask_conv1x1"]["weight_fake_quantize"], None)
        G["mask"] = act_grid(qp["mask_conv1x1"]["activation_fake_quantize"])
        G["mul"] = act_grid(qp["mul"]["activation_fake_quantize"])

        dp, dq = p["decoder"], qp["decoder"]
        P["dec_kernel"] = dequant_weight(dp["kernel"], dq.get("weight_fake_quantize"), ch_axis=1)
        if q.out_quant:
            G["dec_out"] = act_grid(dq["activation_fake_quantize"], q.out_act_n_bits)
        if q.n_combiner > 1:
            rp, rq = dp["residual_error_block"], dq["residual_error_block"]
            P["re_kernel"] = dequant_weight(rp["residual_encoder_kernel"],
                                            rq.get("weight_fake_quantize"), ch_axis=1)
            P["re_bias"] = (np.asarray(rp["residual_encoder_bias"], np.float32)
                            if "residual_encoder_bias" in rp else None)
            G["re_latent"] = act_grid(rq["activation_fake_quantize"])
            if q.out_quant:
                G["dec_res_out"] = act_grid(dq["activation_fake_quantize_residual"], q.out_act_n_bits)
            if q.train_res_dec:
                P["res_dec_kernel"] = dequant_weight(rp["residual_decoder_kernel"],
                                                     rq.get("weight_fake_quantize_dec"), ch_axis=1)

        self._lstm = QLSTM(model.hidden_dim, bidirectional=True, mode=q.lstm_mode, q=q)
        self.P, self.G = P, G
        self._fwd = jax.jit(self._forward)

    def __call__(self, x: Array) -> Array:
        return self._fwd(x)

    # -- jitted forward ----------------------------------------------------

    def _bmm(self, a: Array, b: Array, sub: str) -> Array:
        return jnp.einsum(sub, a.astype(self.dt), b.astype(self.dt),
                          preferred_element_type=jnp.float32)

    def _mha(self, x: Array, M: dict, on_grid: bool, g_in: Grid) -> Array:
        """Quantized MHA; ``x`` f32. int8 in-proj when the input is on g_in."""
        m = self.model
        E, h = m.feature_dim, 4
        d = E // h
        B, Lq, _ = x.shape
        if on_grid:
            y3 = int8_matmul(requant(x, g_in), M["w_in"])
        else:
            y3 = jnp.dot(x.astype(self.dt), jnp.asarray(M["w_in_f32"], self.dt),
                         preferred_element_type=jnp.float32) + jnp.asarray(M["b_in"])
        Q = requant(y3[..., :E], M["g_q"]).f32
        K = requant(y3[..., E : 2 * E], M["g_k"]).f32
        V = requant(y3[..., 2 * E :], M["g_v"]).f32
        Qh = Q.reshape(B, Lq, h, d).transpose(0, 2, 1, 3) / math.sqrt(d)
        Qh = requant(Qh, M["g_div"]).f32
        Kh = K.reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        Vh = V.reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(self._bmm(Qh, Kh, "bhqd,bhkd->bhqk"), axis=-1)
        heads = self._bmm(attn, Vh, "bhqk,bhkd->bhqd")
        y = heads.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return requant(int8_matmul(requant(y, M["g_head"]), M["w_out"]), M["g_out"]).f32

    def _tlayer(self, src: Array, L: dict, g_in: Grid) -> Array:
        """ImprovedTransformerLayer (models/dptnet.py:83-101); f32 in/out."""
        src2 = self._mha(src, L["mha"], L["on_grid"], g_in)
        src = requant(src + src2, L["g_add1"]).f32
        src = requant(layer_norm(src, L["n1_scale"], L["n1_bias"], 1e-5), L["g_norm1"]).f32
        y = self._lstm.apply(L["lstm_vars"], src)
        y = jax.nn.relu(y)  # not a quant point (dptnetq.py:94) -> f32 linear
        y2 = jnp.dot(y.astype(self.dt), jnp.asarray(L["w_linear"], self.dt),
                     preferred_element_type=jnp.float32)
        if L["b_linear"] is not None:
            y2 = y2 + jnp.asarray(L["b_linear"])
        src2 = requant(y2, L["g_linear"]).f32
        src = requant(src + src2, L["g_add2"]).f32
        return requant(layer_norm(src, L["n2_scale"], L["n2_bias"], 1e-5), L["g_norm2"]).f32

    def _forward(self, x: Array) -> Array:
        m = self.model
        q = m.q
        P, G = self.P, self.G

        x = preprocess(x, n_splitter=q.n_splitter)  # [B, C', T]
        B = x.shape[0]
        x = jnp.swapaxes(x, 1, 2)
        if "enc_in" in G:
            x = requant(x, G["enc_in"]).f32
        mixture_w = requant(
            jax.nn.relu(conv1d(x, P["enc_kernel"], self.dt, stride=m.kernel_size // 2)),
            G["enc_out"],
        )  # [B, L, E]

        score = requant(gn1(mixture_w.f32, P["ln_scale"], P["ln_bias"], EPS), G["enc_LN"])
        feats = requant(int8_matmul(score, P["w_bn"]), G["bn"])  # [B, L, N]

        segs, rest = split_segments(feats.f32, m.segment_size)  # [B, K, S, N]
        b, k, s, n = segs.shape
        out = segs
        # the input grid of each layer's MHA: g_bn for row_0 (unused, off-grid),
        # then the previous layer's norm2 grid
        g_prev = G["bn"]
        for L in self.layers:
            if L["side"] == "row":
                h = jnp.swapaxes(out, 1, 2).reshape(b * s, k, n)
                h = self._tlayer(h, L, g_prev)
                out = jnp.swapaxes(h.reshape(b, s, k, n), 1, 2)
            else:
                h = out.reshape(b * k, s, n)
                h = self._tlayer(h, L, g_prev)
                out = h.reshape(b, k, s, n)
            g_prev = L["g_norm2"]

        out = requant(prelu(out, jnp.asarray(P["prelu_alpha"])), G["prelu"])
        out = requant(int8_matmul(out, P["w_out_conv"]), G["out_conv"]).f32  # [B,K,S,spk*N]
        out = out.reshape(b, k, s, m.n_srcs, m.feature_dim)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b * m.n_srcs, k, s, m.feature_dim)
        merged = merge_segments(out, rest, lambda a, bb: requant(a + bb, G["merge_add"]).f32)

        merged_q = requant(merged, G["merge_add"])
        gate_a = requant(jnp.tanh(int8_matmul(merged_q, P["w_output"])), G["output"]).f32
        gate_b = requant(jax.nn.sigmoid(int8_matmul(merged_q, P["w_output_gate"])),
                         G["output_gate"]).f32
        bf = requant(gate_a * gate_b, G["sep_mul"])  # [B*nspk, T, N]

        mask = requant(jax.nn.relu(int8_matmul(bf, P["w_mask"])), G["mask"]).f32
        est_mask = mask.reshape(B, m.n_srcs, -1, m.enc_dim)
        source_w = requant(mixture_w.f32[:, None] * est_mask, G["mul"]).f32

        x0 = jnp.dot(source_w.astype(self.dt), jnp.asarray(P["dec_kernel"], self.dt),
                     preferred_element_type=jnp.float32)
        y0 = requant(x0, G["dec_out"]).f32 if q.out_quant else x0
        planes = [y0]
        if q.n_combiner == 2:
            Y_q = jnp.dot(y0.astype(self.dt), jnp.asarray(P["re_kernel"], self.dt),
                          preferred_element_type=jnp.float32)
            if P.get("re_bias") is not None:
                Y_q = Y_q + jnp.asarray(P["re_bias"])
            Y1 = requant(source_w - Y_q, G["re_latent"]).f32
            w_dec = P["res_dec_kernel"] if q.train_res_dec else P["dec_kernel"]
            dec = jnp.dot(Y1.astype(self.dt), jnp.asarray(w_dec, self.dt),
                          preferred_element_type=jnp.float32)
            y1 = requant(dec, G["dec_res_out"]).f32 if q.out_quant else dec
            planes.append(y1)

        est = jnp.stack(planes).reshape(q.n_combiner, B, m.n_srcs, -1, m.kernel_size)
        est = overlap_and_add(est, m.kernel_size // 2)
        out = est.reshape(q.n_combiner, B, m.n_srcs, 1, -1)
        return postprocess(out, n_combiner=q.n_combiner)
