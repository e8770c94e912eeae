"""Quantized multi-head attention.

TPU-native equivalent of MultiheadAttentionQ
(reference: quantization/qat/qat_layers.py:865-990), with the reference's
exact quant-point placement: each of Q/K/V goes through the FULL in-proj
(3E outputs) and is fake-quantized before the chunk split; q/sqrt(E) is
quantized; attention logits and softmax have quantizer sites that are
**no-ops in the reference** due to the `attn - ...` vs `attn = ...` typo
(qat_layers.py:934,936) — replicated by default and fixable via
``fix_attn_quant=True``; the merged heads and the out-proj output are
quantized.

Layout: batch-first [B, L, E] (the reference transposes torch's seq-first;
batched on TPU the [B*h, L, d] bmm pair maps straight onto the MXU).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from fqss_tpu.nn.layers import make_act_quantizer, make_weight_quantizer, mxu_operands, torch_uniform_init
from fqss_tpu.ops import pallas_attention
from fqss_tpu.quant.spec import FLOAT, QuantSpec

Array = jax.Array


class QMultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    q: QuantSpec = FLOAT
    fix_attn_quant: bool = False  # True: actually apply the attn/softmax quantizers

    @nn.compact
    def __call__(self, query: Array, key: Array, value: Array) -> Array:
        E = self.embed_dim
        h = self.num_heads
        d = E // h
        B, Lq, _ = query.shape
        Lk = key.shape[1]

        bound = 1.0 / math.sqrt(E)
        w_in = self.param("in_proj_kernel", torch_uniform_init(bound), (E, 3 * E))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        w_out = self.param("out_proj_kernel", torch_uniform_init(bound), (E, E))
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        wq_in = make_weight_quantizer(self.q, (E, 3 * E), ch_axis=1, name="weight_fake_quantize_in")
        wq_out = make_weight_quantizer(self.q, (E, E), ch_axis=1, name="weight_fake_quantize_out")
        if wq_in is not None:
            w_in = wq_in(w_in)
            w_out = wq_out(w_out)

        aq = lambda name: make_act_quantizer(self.q, name=name)
        q_q, q_k, q_v = aq("activation_fake_quantize_q"), aq("activation_fake_quantize_k"), aq("activation_fake_quantize_v")
        q_div = aq("activation_fake_quantize_div")
        q_attn = aq("activation_fake_quantize_attn")
        q_soft = aq("activation_fake_quantize_softmax")
        q_head = aq("activation_fake_quantize_head")
        q_out = aq("activation_fake_quantize")

        # Full in-proj on each input, quantize, then take the relevant third
        # (faithful to qat_layers.py:907-922).
        qc, w_in_c = mxu_operands(self.q, query, w_in)
        kc, _ = mxu_operands(self.q, key, w_in)
        vc, _ = mxu_operands(self.q, value, w_in)
        dot = lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32)
        Xq = dot(qc, w_in_c) + b_in
        Xk = dot(kc, w_in_c) + b_in
        Xv = dot(vc, w_in_c) + b_in
        if q_q is not None:
            Xq, Xk, Xv = q_q(Xq), q_k(Xk), q_v(Xv)
        Q = Xq[..., :E]
        K = Xk[..., E : 2 * E]
        V = Xv[..., 2 * E :]

        # [B, L, E] -> [B, h, L, d]
        Qh = Q.reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        Kh = K.reshape(B, Lk, h, d).transpose(0, 2, 1, 3)
        Vh = V.reshape(B, Lk, h, d).transpose(0, 2, 1, 3)

        Qh = Qh / math.sqrt(d)
        if q_div is not None:
            Qh = q_div(Qh)

        # Fused Pallas attention core (ops/pallas_attention.py): QK^T,
        # softmax, AV, and the head fake-quant in one VMEM pass — the [L, L]
        # logits never reach HBM. Legal exactly because the attn/softmax
        # quantizer sites are reference no-ops; the fix_attn_quant variant
        # (and the MSE/observer-window cases) use the XLA path below.
        if (
            self.q.pallas_attn
            and not self.fix_attn_quant
            and q_head is not None
            and self.q.act_quantizer == "linear"
            and not self.is_initializing()
            and pallas_attention.supported(Lq, Lk, d)
        ):
            hmn, hmx = q_head(None, ranges_only=True)
            heads = pallas_attention.fused_attention(
                Qh.reshape(B * h, Lq, d),
                Kh.reshape(B * h, Lk, d),
                Vh.reshape(B * h, Lk, d),
                hmn,
                hmx,
                self.q.act_n_bits,
            ).reshape(B, h, Lq, d)
            y = heads.transpose(0, 2, 1, 3).reshape(B, Lq, E)
            yc, w_out_c = mxu_operands(self.q, y, w_out)
            y = dot(yc, w_out_c) + b_out
            return q_out(y) if q_out is not None else y

        Qc, Kc = mxu_operands(self.q, Qh, Kh)
        attn = jnp.einsum("bhqd,bhkd->bhqk", Qc, Kc, preferred_element_type=jnp.float32)
        if q_attn is not None and self.fix_attn_quant:
            attn = q_attn(attn)
        elif q_attn is not None:
            q_attn(attn)  # reference no-op site: evaluated, result discarded
        attn = jax.nn.softmax(attn, axis=-1)
        if q_soft is not None and self.fix_attn_quant:
            attn = q_soft(attn)
        elif q_soft is not None:
            q_soft(attn)
        Ac, Vc = mxu_operands(self.q, attn, Vh)
        heads = jnp.einsum("bhqk,bhkd->bhqd", Ac, Vc, preferred_element_type=jnp.float32)
        if q_head is not None:
            heads = q_head(heads)

        y = heads.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        yc, w_out_c = mxu_operands(self.q, y, w_out)
        y = dot(yc, w_out_c) + b_out
        return q_out(y) if q_out is not None else y
