"""Quantized primitive layers (flax, channels-last, TPU-native).

Re-designs the reference's fake-quantized layer wrappers
(reference: quantization/qat/qat_layers.py) as first-class flax modules.
Instead of wrapping float torch modules by surgery, each layer *is* the
fused (op -> [norm] -> [nonlinearity] -> act-fake-quant) block, configured
declaratively from a :class:`~fqss_tpu.quant.QuantSpec`. With ``q.qat=False``
the same module is the float teacher.

Layout: 1-D audio tensors are **NTC** (batch, time, channels) and 2-D are
**NHWC** — channels ride the TPU lane dimension so convs/matmuls tile onto
the MXU and the fake-quant epilogues fuse into them. Conv kernels are stored
``(k, Cin/groups, Cout)`` ('WIO'); transposed-conv kernels
``(k, Cin, Cout)`` with per-out-channel quantization, matching the
reference's per-channel axes (Conv: axis 0 of [Co,Ci,k]; ConvT: axis 1 of
[Ci,Co,k] — qat_layers.py:296-305).

Every layer sows its analytic MAC count into the ``macs`` collection when
the caller marks it mutable — the TPU equivalent of the reference's
``calc_mac_op``/``set_mac_op`` profiling (qat_layers.py:148-153 etc.).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from fqss_tpu.nn.nonlin import Nl
from fqss_tpu.quant.quantizers import ActQuantizer, MseActQuantizer, WeightQuantizer
from fqss_tpu.quant.spec import FLOAT, QuantSpec

Array = jax.Array

MACS = "macs"


def sow_macs(mod: nn.Module, value) -> None:
    """Record an analytic MAC count (skipped during init so the macs
    collection only exists when a caller asks for it via mutable=['macs'])."""
    if not mod.is_initializing():
        mod.sow(MACS, "mac_op", jnp.asarray(value, jnp.float32))



# ---------------------------------------------------------------------------
# Construction helpers
# ---------------------------------------------------------------------------


def torch_uniform_init(bound: float):
    """U(-bound, bound) — matches torch's kaiming_uniform(a=sqrt(5)) layer init."""

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


def make_act_quantizer(
    q: QuantSpec,
    *,
    enabled: bool | None = None,
    n_bits: int | None = None,
    nl_quant: bool = False,
    name: str = "activation_fake_quantize",
):
    """Build the post-op activation quantizer (or None when disabled).

    Mirrors LayerQ.__init__ (qat_layers.py:49-59): an activation quantizer
    when q.act_quant (or the explicit override), identity otherwise.
    ``nl_quant=True`` selects the mu-law quantizer (inout_nl_quant paths).
    """
    on = q.act_quant if enabled is None else enabled
    if not (q.qat and on):
        return None
    bits = q.act_n_bits if n_bits is None else n_bits
    if nl_quant:
        return ActQuantizer(n_bits=bits, kind="mulaw", gradient_based=q.gradient_based, observer=q.observer,
                            max_observations=q.max_observations, name=name)
    if q.act_quantizer == "mse":
        return MseActQuantizer(n_bits=bits, gradient_based=q.gradient_based, observer=q.observer,
                               max_observations=q.max_observations, name=name)
    return ActQuantizer(n_bits=bits, gradient_based=q.gradient_based, observer=q.observer,
                        max_observations=q.max_observations, use_pallas=q.pallas_qat, name=name)


def make_weight_quantizer(
    q: QuantSpec,
    weight_shape: Sequence[int],
    ch_axis: int,
    *,
    name: str = "weight_fake_quantize",
):
    if not (q.qat and q.weight_quant):
        return None
    return WeightQuantizer(
        weight_shape=tuple(weight_shape),
        ch_axis=ch_axis,
        n_bits=q.weight_n_bits,
        gradient_based=q.gradient_based,
        observer=q.observer,
        use_pallas=q.pallas_qat,
        name=name,
    )


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def mxu_operands(q: QuantSpec, x: Array, w: Array) -> tuple[Array, Array]:
    """Cast matmul/conv operands to the spec's MXU compute dtype.

    Grid math (fake-quant) runs in f32 before this; accumulation stays f32
    via preferred_element_type at every call site."""
    dt = q.mxu_dtype
    if dt == x.dtype:
        return x, w
    return x.astype(dt), w.astype(dt)


def conv_out_len(li: int, k: int, stride: int, padding: int, dilation: int) -> int:
    return math.floor((li + 2 * padding - dilation * (k - 1) - 1) / stride + 1)


def convt_out_len(li: int, k: int, stride: int, padding: int, dilation: int, output_padding: int) -> int:
    return (li - 1) * stride - 2 * padding + dilation * (k - 1) + output_padding + 1


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


class QConv1d(nn.Module):
    """Fused fake-quant Conv1d [+GroupNorm] [+NL] [+act-quant].

    Covers Conv1dQ / Conv1dNlQ / Conv1dGnNlQ (qat_layers.py:124-258).
    Input/output: [B, T, C].
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    nl: str | None = None
    norm_groups: int | None = None
    norm_eps: float = 1e-5
    q: QuantSpec = FLOAT
    act_quant: bool | None = None
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        wshape = (self.kernel_size, cin // self.groups, self.features)
        fan_in = (cin // self.groups) * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=2)
        if wq is not None:
            w = wq(w)
        xc, wc = mxu_operands(self.q, x, w)
        y = lax.conv_general_dilated(
            xc,
            wc,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            y = y + b
        lo = y.shape[1]
        sow_macs(self, x.shape[0] * cin // self.groups * self.features * lo * self.kernel_size
                                             + (2 * y.size if self.norm_groups else 0))
        if self.norm_groups is not None:
            y = nn.GroupNorm(num_groups=self.norm_groups, epsilon=self.norm_eps, name="norm")(y)
        if self.nl:
            y = Nl(self.nl, name="nl")(y)
        aq = make_act_quantizer(self.q, enabled=self.act_quant, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QConv2d(nn.Module):
    """Fused fake-quant Conv2d [+GroupNorm] [+NL] [+act-quant]
    (qat_layers.py:156-293). NHWC."""

    features: int
    kernel_size: int | tuple[int, int]
    stride: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    dilation: int | tuple[int, int] = 1
    groups: int = 1
    use_bias: bool = True
    nl: str | None = None
    norm_groups: int | None = None
    norm_eps: float = 1e-5
    q: QuantSpec = FLOAT
    act_quant: bool | None = None
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        d = _pair(self.dilation)
        cin = x.shape[-1]
        wshape = (k[0], k[1], cin // self.groups, self.features)
        fan_in = (cin // self.groups) * k[0] * k[1]
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=3)
        if wq is not None:
            w = wq(w)
        xc, wc = mxu_operands(self.q, x, w)
        y = lax.conv_general_dilated(
            xc,
            wc,
            window_strides=s,
            padding=[(p[0], p[0]), (p[1], p[1])],
            rhs_dilation=d,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            y = y + b
        sow_macs(self, 
            x.shape[0] * (cin // self.groups) * self.features * y.shape[1] * y.shape[2] * k[0] * k[1])
        if self.norm_groups is not None:
            y = nn.GroupNorm(num_groups=self.norm_groups, epsilon=self.norm_eps, name="norm")(y)
        if self.nl:
            y = Nl(self.nl, name="nl")(y)
        aq = make_act_quantizer(self.q, enabled=self.act_quant, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QConvTranspose1d(nn.Module):
    """Fused fake-quant ConvTranspose1d [+NL] [+act-quant].

    Torch conv_transpose1d semantics (qat_layers.py:296-327,365-398) via a
    kernel-flipped input-dilated conv. Kernel stored (k, Cin, Cout); weight
    quantization is per out-channel (axis 2), the layout-equivalent of the
    reference's ch_out_idx=1 on [Cin, Cout, k].
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    nl: str | None = None
    q: QuantSpec = FLOAT
    act_quant: bool | None = None
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        wshape = (self.kernel_size, cin, self.features)
        # torch convT init bound: 1/sqrt(Cin * k) with fan computed on [Cin,Co,k] -> fan_in = Co*k?
        # torch uses weight.size(1)*k = Cout*k for ConvTranspose fan_in via _calculate_fan..
        bound = 1.0 / math.sqrt(self.features * self.kernel_size)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=2)
        if wq is not None:
            w = wq(w)
        pad = self.dilation * (self.kernel_size - 1) - self.padding
        xc, wc = mxu_operands(self.q, x, jnp.flip(w, axis=0))
        y = lax.conv_general_dilated(
            xc,
            wc,
            window_strides=(1,),
            padding=[(pad, pad + self.output_padding)],
            lhs_dilation=(self.stride,),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            y = y + b
        sow_macs(self, 
            x.shape[0] * cin * self.features * y.shape[1] * (self.kernel_size // self.stride))
        if self.nl:
            y = Nl(self.nl, name="nl")(y)
        aq = make_act_quantizer(self.q, enabled=self.act_quant, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QConvTranspose2d(nn.Module):
    """Fake-quant ConvTranspose2d [+NL] [+act-quant] (qat_layers.py:330-435). NHWC."""

    features: int
    kernel_size: int | tuple[int, int]
    stride: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    output_padding: int | tuple[int, int] = 0
    dilation: int | tuple[int, int] = 1
    use_bias: bool = True
    nl: str | None = None
    q: QuantSpec = FLOAT
    act_quant: bool | None = None
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        d = _pair(self.dilation)
        cin = x.shape[-1]
        wshape = (k[0], k[1], cin, self.features)
        bound = 1.0 / math.sqrt(self.features * k[0] * k[1])
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=3)
        if wq is not None:
            w = wq(w)
        pads = [
            (d[0] * (k[0] - 1) - p[0], d[0] * (k[0] - 1) - p[0] + op[0]),
            (d[1] * (k[1] - 1) - p[1], d[1] * (k[1] - 1) - p[1] + op[1]),
        ]
        xc, wc = mxu_operands(self.q, x, jnp.flip(w, axis=(0, 1)))
        y = lax.conv_general_dilated(
            xc,
            wc,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=s,
            rhs_dilation=d,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            y = y + b
        sow_macs(self, 
            x.shape[0] * cin * self.features * y.shape[1] * y.shape[2]
            * (k[0] // s[0]) * (k[1] // s[1]))
        if self.nl:
            y = Nl(self.nl, name="nl")(y)
        aq = make_act_quantizer(self.q, enabled=self.act_quant, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


# ---------------------------------------------------------------------------
# Dense / Embedding
# ---------------------------------------------------------------------------


class QDense(nn.Module):
    """Fake-quant Linear [+NL] [+act-quant] (LinearQ/LinearNlQ, qat_layers.py:521-568).

    Kernel stored (in, out); per-out-channel weight quant (axis 1) matches the
    reference's axis 0 on torch's [out, in].
    """

    features: int
    use_bias: bool = True
    nl: str | None = None
    q: QuantSpec = FLOAT
    act_quant: bool | None = None
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        bound = 1.0 / math.sqrt(cin)
        wshape = (cin, self.features)
        w = self.param("kernel", torch_uniform_init(bound), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=1)
        if wq is not None:
            w = wq(w)
        xc, wc = mxu_operands(self.q, x, w)
        y = jnp.dot(xc, wc, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(bound), (self.features,))
            y = y + b
        sow_macs(self, x.size * self.features)
        if self.nl:
            y = Nl(self.nl, name="nl")(y)
        aq = make_act_quantizer(self.q, enabled=self.act_quant, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QEmbedding(nn.Module):
    """Fake-quant embedding lookup (EmbeddingQ, qat_layers.py:489-508)."""

    num_embeddings: int
    features: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, idx: Array) -> Array:
        wshape = (self.num_embeddings, self.features)
        table = self.param("embedding", nn.initializers.normal(1.0), wshape)
        wq = make_weight_quantizer(self.q, wshape, ch_axis=0)
        if wq is not None:
            table = wq(table)
        y = jnp.take(table, idx, axis=0)
        aq = make_act_quantizer(self.q)
        return aq(y) if aq is not None else y


# ---------------------------------------------------------------------------
# Norms (norm -> act-quant)
# ---------------------------------------------------------------------------


class QGroupNorm(nn.Module):
    """GroupNorm -> act-quant (GroupNormQ, qat_layers.py:438-452). Channels-last."""

    num_groups: int
    epsilon: float = 1e-5
    q: QuantSpec = FLOAT
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon, name="norm")(x)
        sow_macs(self, 2 * x.size)
        aq = make_act_quantizer(self.q, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QLayerNorm(nn.Module):
    """LayerNorm -> act-quant (LayerNormQ, qat_layers.py:455-469)."""

    epsilon: float = 1e-5
    q: QuantSpec = FLOAT
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(epsilon=self.epsilon, name="norm")(x)
        sow_macs(self, 2 * x.size)
        aq = make_act_quantizer(self.q, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QBatchNorm(nn.Module):
    """BatchNorm -> act-quant (BatchNormQ, qat_layers.py:472-486).

    Running stats live in flax's ``batch_stats`` collection; pass
    ``use_running_average=True`` for eval.
    """

    epsilon: float = 1e-5
    momentum: float = 0.9
    q: QuantSpec = FLOAT
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        y = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            name="norm",
        )(x)
        sow_macs(self, x.size)
        aq = make_act_quantizer(self.q, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


# ---------------------------------------------------------------------------
# Graph-explicit quant points: binary ops, activations, constants
# ---------------------------------------------------------------------------


class QNl(nn.Module):
    """Nonlinearity -> act-quant (NlQ, qat_layers.py:511-518)."""

    kind: str
    q: QuantSpec = FLOAT
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Nl(self.kind, name="nl")(x)
        aq = make_act_quantizer(self.q, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class _BinaryQ(nn.Module):
    op: str = "add"
    q: QuantSpec = FLOAT
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array) -> Array:
        if self.op == "add":
            y = x1 + x2
        elif self.op == "sub":
            y = x1 - x2
        elif self.op == "mul":
            y = x1 * x2
            sow_macs(self, max(x1.size, x2.size if hasattr(x2, "size") else 0))
        elif self.op == "div":
            y = x1 / x2
        else:
            raise ValueError(self.op)
        aq = make_act_quantizer(self.q, n_bits=self.act_n_bits)
        return aq(y) if aq is not None else y


class QAdd(_BinaryQ):
    """add -> act-quant (AddQ, qat_layers.py:62-71)."""

    op: str = "add"


class QSub(_BinaryQ):
    op: str = "sub"


class QMul(_BinaryQ):
    """mul -> act-quant (MulQ, qat_layers.py:86-101)."""

    op: str = "mul"


class QDiv(_BinaryQ):
    op: str = "div"


class QConst(nn.Module):
    """Identity -> act-quant: marks a graph constant/IO quant point
    (ConstQ, qat_layers.py:116-121; used for positional encodings)."""

    q: QuantSpec = FLOAT
    act_n_bits: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        aq = make_act_quantizer(self.q, n_bits=self.act_n_bits)
        return aq(x) if aq is not None else x
