import sys, time, dataclasses
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from fqss_tpu.quant import QuantSpec
from fqss_tpu.quant.spec import FLOAT
import fqss_tpu.models.dptnet as D
from fqss_tpu.nn import QAdd, QDense, QLayerNorm
from fqss_tpu.nn.attention import QMultiheadAttention
from fqss_tpu.nn.lstm import QLSTM
import flax.linen as nn

Q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True,
              compute_dtype="bfloat16", pallas_lstm=True)
B, T = 8, 32000
x = jax.random.uniform(jax.random.PRNGKey(0), (B, T), minval=-1, maxval=1)

SKIP_FFN = False
SKIP_ATTN = False

class AblationLayer(nn.Module):
    d_model: int
    nhead: int
    hidden_size: int
    q: QuantSpec = FLOAT

    @nn.compact
    def __call__(self, src):
        if not SKIP_ATTN:
            src2 = QMultiheadAttention(self.d_model, self.nhead, q=self.q, name="self_attn")(src, src, src)
            src = QAdd(q=self.q, name="add_norm1")(src, src2)
            src = QLayerNorm(q=self.q, name="norm1")(src)
        if not SKIP_FFN:
            y = QLSTM(self.hidden_size, bidirectional=True, mode=self.q.lstm_mode, q=self.q, name="lstm")(src)
            y = jax.nn.relu(y)
            src2 = QDense(self.d_model, q=self.q, name="linear")(y)
            src = QAdd(q=self.q, name="add_norm2")(src, src2)
            src = QLayerNorm(q=self.q, name="norm2")(src)
        return src

orig = D.ImprovedTransformerLayer
def timeit(fn, *args, n=6):
    slc = lambda out: jax.tree_util.tree_leaves(out)[0].ravel()[:1]
    np.asarray(jax.device_get(slc(fn(*args, jnp.float32(-1.0)))))
    t0 = time.perf_counter()
    outs = [slc(fn(*args, jnp.float32(i))) for i in range(n)]
    for o in outs:
        np.asarray(jax.device_get(o))
    return (time.perf_counter() - t0) / n

for name, (sf, sa, q) in {
    "full_pallas": (False, False, Q),
    "no_ffn": (True, False, Q),
    "no_attn": (False, True, Q),
    "no_both": (True, True, Q),
}.items():
    SKIP_FFN, SKIP_ATTN = sf, sa
    D.ImprovedTransformerLayer = AblationLayer
    model = D.DPTNet(n_srcs=2, kernel_size=2, q=q)
    v = model.init(jax.random.PRNGKey(1), x)
    fwd = jax.jit(lambda vv, xx, tick: model.apply(vv, xx + tick * 1e-6))
    dt = timeit(fwd, v, x)
    print(f"{name:12s}: {dt*1e3:8.2f} ms", flush=True)
D.ImprovedTransformerLayer = orig
