"""Partial int8 serving engine for the FQSS HTDemucs.

HTDemucs's FLOPs split into two regimes (reference
quantization/qat/models/htdemucsq.py:532-1242):

* the strided/2-D conv encoder-decoder branches, whose conv inputs are NOT
  on an 8-bit grid at the conv boundary (GroupNorm/DConv sums in between) —
  these stay f32/bf16 with host-folded weights (serve/fold.py), bitwise the
  values the QAT forward computes every call;
* the grid-on matmul sites: the ``bottom_channels`` 1x1 channel
  up/downsamplers (htdemucsq.py:880-892,1104-1118) and every cross-domain
  transformer projection — MHA in/out-proj and the two FFN linears per
  layer (htdemucsq.py:138-328) — whose inputs come straight off a learned
  activation-quantizer grid. Those execute here as TRUE s8 x s8 -> s32 MXU
  matmuls with int8-materialized activations (serve/common.py math), the
  same exact-grid machinery the Sepformer/DPTNet engines use.

Architecture: rather than re-deriving the whole hybrid forward (STFT,
padding dance, CaC, iSTFT), the engine folds the model's weights once and
re-uses the model's own __call__ for the conv branches, swapping ONLY the
transformer block via ``HTDemucs.transformer_override`` — a hand-written
int8 dataflow over the packed grids. Conv-branch math is therefore
identical to the fake-quant forward by construction; the transformer block
is layer-exact on its grids (tests/test_serve_htdemucs_int8.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fqss_tpu.models.htdemucs import (
    HTDemucs,
    create_2d_sin_embedding,
    create_sin_embedding,
)
from fqss_tpu.serve.common import (
    Grid,
    QAct,
    act_grid,
    check_8bit_spec,
    gn1,
    int8_matmul,
    int8_weight,
    layer_norm,
    requant,
)
from fqss_tpu.serve.fold import fold_quantized_weights

Array = jax.Array

_EPS = 1e-5  # QLayerNorm / _GroupNormT epsilon (nn/layers.py:446)


def _norm(p: dict) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(p["norm"]["scale"], np.float32), np.asarray(p["norm"]["bias"], np.float32)


def _attn_pack(p: dict, qp: dict) -> dict:
    """Freeze one QMultiheadAttention (nn/attention.py:32-136)."""
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


def _layer_pack(lp: dict, lq: dict, cross: bool) -> dict:
    """One SelfAttnLayer / CrossAttnLayer (models/htdemucs.py:98-159)."""
    attn = "cross_attn" if cross else "self_attn"
    ffn_norm = "norm3" if cross else "norm2"
    out = {
        "cross": cross,
        "n1": _norm(lp["norm1"]),
        "g_n1": act_grid(lq["norm1"]["activation_fake_quantize"]),
        "attn": _attn_pack(lp[attn], lq[attn]),
        "gamma_1": np.asarray(lp["gamma_1"]["scale"], np.float32),
        "g_gamma_1": act_grid(lq["gamma_1"]["mul"]["activation_fake_quantize"]),
        "g_add1": act_grid(lq["add_norm1"]["activation_fake_quantize"]),
        "nf": _norm(lp[ffn_norm]),
        "g_nf": act_grid(lq[ffn_norm]["activation_fake_quantize"]),
        "w_lin1": int8_weight(lp["linear1"]["kernel"], lq["linear1"]["weight_fake_quantize"],
                              lp["linear1"].get("bias")),
        "g_lin1": act_grid(lq["linear1"]["activation_fake_quantize"]),
        "w_lin2": int8_weight(lp["linear2"]["kernel"], lq["linear2"]["weight_fake_quantize"],
                              lp["linear2"].get("bias")),
        "g_lin2": act_grid(lq["linear2"]["activation_fake_quantize"]),
        "gamma_2": np.asarray(lp["gamma_2"]["scale"], np.float32),
        "g_gamma_2": act_grid(lq["gamma_2"]["mul"]["activation_fake_quantize"]),
        "g_add2": act_grid(lq["add_norm2"]["activation_fake_quantize"]),
        "n_out": _norm(lp["norm_out"]),
        "g_out": act_grid(lq["norm_out"]["const"]["activation_fake_quantize"]),
    }
    if cross:
        out["n2"] = _norm(lp["norm2"])
        out["g_n2"] = act_grid(lq["norm2"]["activation_fake_quantize"])
    return out


class HTDemucsInt8Engine:
    """Deployable partial-int8 engine built from an HTDemucs QAT checkpoint.

    Usage::

        engine = HTDemucsInt8Engine(model, variables)  # host-side prep
        y = engine(x)                                  # jitted forward

    ``compute_dtype`` selects the dtype of the folded conv branches and the
    attention bmms ('float32' for parity testing, 'bfloat16' for serving).
    """

    def __init__(self, model: HTDemucs, variables: dict, compute_dtype: str = "bfloat16"):
        q = model.q
        check_8bit_spec(q)
        if model.t_layers <= 0:
            raise NotImplementedError("HTDemucs without a transformer: use fold_quantized_weights")
        self.model = model
        self.dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

        p = jax.device_get(variables["params"])
        qp = jax.device_get(variables["qparams"])
        ct_p, ct_q = p["crosstransformer"], qp["crosstransformer"]

        P: dict[str, Any] = {
            "norm_in": _norm(ct_p["norm_in"]),
            "norm_in_t": _norm(ct_p["norm_in_t"]),
        }
        G: dict[str, Grid] = {
            "pos2d": act_grid(ct_q["const_pos_emb_2d"]["activation_fake_quantize"]),
            "norm_in": act_grid(ct_q["norm_in"]["activation_fake_quantize"]),
            "add_x": act_grid(ct_q["add_x"]["activation_fake_quantize"]),
            "pos": act_grid(ct_q["const_pos_emb"]["activation_fake_quantize"]),
            "norm_in_t": act_grid(ct_q["norm_in_t"]["activation_fake_quantize"]),
            "add_xt": act_grid(ct_q["add_xt"]["activation_fake_quantize"]),
        }
        self.layers = []
        for idx in range(model.t_layers):
            cross = idx % 2 == 1  # cross_first=False (models/htdemucs.py:197)
            self.layers.append((
                _layer_pack(ct_p[f"layer_{idx}"], ct_q[f"layer_{idx}"], cross),
                _layer_pack(ct_p[f"layer_t_{idx}"], ct_q[f"layer_t_{idx}"], cross),
            ))

        if model.bottom_channels:
            last = model.depth - 1
            for name, enc in (("up", f"encoder_{last}"), ("up_t", f"tencoder_{last}")):
                suffix = "_t" if name.endswith("_t") else ""
                cu = f"channel_upsampler{suffix}"
                cd = f"channel_downsampler{suffix}"
                P[f"w_{name}"] = int8_weight(p[cu]["kernel"], qp[cu]["weight_fake_quantize"],
                                             p[cu].get("bias"))
                # upsampler input rides the encoder's final (rewrite GLU) grid
                G[f"in_{name}"] = act_grid(qp[enc]["rewrite"]["activation_fake_quantize"])
                G[name] = act_grid(qp[cu]["activation_fake_quantize"])
                P[f"w_down{suffix}"] = int8_weight(p[cd]["kernel"], qp[cd]["weight_fake_quantize"],
                                                   p[cd].get("bias"))
                G[f"down{suffix}"] = act_grid(qp[cd]["activation_fake_quantize"])
        self.P, self.G = P, G

        folded_model, folded_vars = fold_quantized_weights(model, variables)
        serving_q = dataclasses.replace(folded_model.q, compute_dtype=compute_dtype)
        self._serving_model = folded_model.clone(q=serving_q, transformer_override=self._transformer)
        self._vars = folded_vars
        self._fwd = jax.jit(self._forward, static_argnames=("train",))

    def _forward(self, x: Array, train: bool = True) -> Array:
        return self._serving_model.apply(self._vars, x, train=train)

    def __call__(self, x: Array, train: bool = True) -> Array:
        return self._fwd(x, train=train)

    # -- int8 transformer dataflow (the override) ---------------------------

    def _bmm(self, a: Array, b: Array, sub: str) -> Array:
        return jnp.einsum(sub, a.astype(self.dt), b.astype(self.dt),
                          preferred_element_type=jnp.float32)

    def _mha(self, qa: QAct, ka: QAct, L: dict) -> Array:
        """Quantized MHA on on-grid inputs; cross-attention when qa is not ka."""
        m = self.model
        E = qa.Xs.shape[-1]
        h = m.t_heads
        d = E // h
        B, Lq, _ = qa.Xs.shape
        Lk = ka.Xs.shape[1]
        # full in-proj on each input, quantize, then slice (nn/attention.py:66-79)
        y3q = int8_matmul(qa, L["w_in"])
        y3k = y3q if qa is ka else int8_matmul(ka, L["w_in"])
        Q = requant(y3q, L["g_q"]).f32[..., :E]
        K = requant(y3k, L["g_k"]).f32[..., E : 2 * E]
        V = requant(y3k, L["g_v"]).f32[..., 2 * E :]
        Qh = Q.reshape(B, Lq, h, d).transpose(0, 2, 1, 3) / math.sqrt(d)
        Qh = requant(Qh, L["g_div"]).f32
        Kh = K.reshape(B, Lk, h, d).transpose(0, 2, 1, 3)
        Vh = V.reshape(B, Lk, h, d).transpose(0, 2, 1, 3)
        # attn/softmax quantizer sites are reference no-ops (qat_layers.py:934,936)
        attn = jax.nn.softmax(self._bmm(Qh, Kh, "bhqd,bhkd->bhqk"), axis=-1)
        heads = self._bmm(attn, Vh, "bhqk,bhkd->bhqd")
        y = heads.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        y_q = requant(y, L["g_head"])  # per-tensor grid commutes with head merge
        out = int8_matmul(y_q, L["w_out"])
        return requant(out, L["g_out"]).f32

    def _ffn(self, x: Array, L: dict) -> Array:
        """norm -> linear1+GELU -> linear2 -> LayerScale -> residual add."""
        hn = requant(layer_norm(x, *L["nf"], _EPS), L["g_nf"])
        y = requant(jax.nn.gelu(int8_matmul(hn, L["w_lin1"]), approximate=False), L["g_lin1"])
        y = requant(int8_matmul(y, L["w_lin2"]), L["g_lin2"]).f32
        y = requant(y * jnp.asarray(L["gamma_2"]), L["g_gamma_2"]).f32
        return requant(x + y, L["g_add2"]).f32

    def _layer(self, x: QAct, k: QAct | None, L: dict) -> QAct:
        """SelfAttnLayer (k is None) / CrossAttnLayer (models/htdemucs.py:98-159)."""
        xf = x.f32
        hq = requant(layer_norm(xf, *L["n1"], _EPS), L["g_n1"])
        if k is None:
            h = self._mha(hq, hq, L["attn"])
        else:
            hk = requant(layer_norm(k.f32, *L["n2"], _EPS), L["g_n2"])
            h = self._mha(hq, hk, L["attn"])
        h = requant(h * jnp.asarray(L["gamma_1"]), L["g_gamma_1"]).f32
        y = requant(xf + h, L["g_add1"]).f32
        y = self._ffn(y, L)
        return requant(gn1(y, *L["n_out"], _EPS), L["g_out"])

    def _transformer(self, x: Array, xt: Array) -> tuple[Array, Array]:
        """The override: [B, Fr, T1, C], [B, T2, C] -> same shapes."""
        m = self.model
        P, G = self.P, self.G
        b, fr, t1, c_in = x.shape

        if m.bottom_channels:
            xq = requant(x.reshape(b, fr * t1, c_in), G["in_up"])
            x = requant(int8_matmul(xq, P["w_up"]), G["up"]).f32.reshape(
                b, fr, t1, m.bottom_channels)
            xtq = requant(xt, G["in_up_t"])
            xt = requant(int8_matmul(xtq, P["w_up_t"]), G["up_t"]).f32

        c = x.shape[-1]
        pos2d = create_2d_sin_embedding(c, fr, t1, 10000.0)  # [1, C, Fr, T1]
        pos2d = jnp.asarray(pos2d).transpose(0, 3, 2, 1).reshape(1, t1 * fr, c)
        pos2d = requant(pos2d, G["pos2d"]).f32
        xs = x.transpose(0, 2, 1, 3).reshape(b, t1 * fr, c)
        xs = requant(layer_norm(xs, *P["norm_in"], _EPS), G["norm_in"]).f32
        xs = requant(xs + pos2d, G["add_x"])

        t2 = xt.shape[1]
        pos = jnp.asarray(create_sin_embedding(t2, c, 10000.0)).transpose(1, 0, 2)
        pos = requant(pos, G["pos"]).f32
        xts = requant(layer_norm(xt, *P["norm_in_t"], _EPS), G["norm_in_t"]).f32
        xts = requant(xts + pos, G["add_xt"])

        for Lx, Lt in self.layers:
            if not Lx["cross"]:
                xs = self._layer(xs, None, Lx)
                xts = self._layer(xts, None, Lt)
            else:
                old_x = xs
                xs = self._layer(xs, xts, Lx)
                xts = self._layer(xts, old_x, Lt)

        if m.bottom_channels:
            xd = requant(int8_matmul(xs, P["w_down"]), G["down"]).f32
            x_out = xd.reshape(b, t1, fr, c_in).transpose(0, 2, 1, 3)
            xt_out = requant(int8_matmul(xts, P["w_down_t"]), G["down_t"]).f32
        else:
            x_out = xs.f32.reshape(b, t1, fr, c).transpose(0, 2, 1, 3)
            xt_out = xts.f32
        return x_out, xt_out
