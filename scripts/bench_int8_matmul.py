"""Tune int8_matmul_requant_pallas at the ConvTasNet TCN 1x1 serving shape.

ConvTasNet full-size engine: TCN 1x1 convs dominate — per block the
bottleneck is [M, 512] x [512, 512] with M = batch*frames = 32 * 12000 =
384k (bench workload 32 x 12s @ 8k, stride 8). Sweep Pallas tile sizes
against (a) the XLA int8 path the engine uses today, (b) a plain bf16
matmul (the fake-quant serving floor), and report ms + effective TOPS.
"""
import sys, time, itertools, functools
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from fqss_tpu.ops.pallas_quant import int8_matmul_requant_pallas

M, K, N = 384_000, 512, 512
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.integers(-128, 128, (M, K), dtype=np.int8))
w = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
scale = jnp.asarray(rng.uniform(1e-4, 2e-4, N).astype(np.float32))
corr = jnp.asarray(rng.uniform(-0.1, 0.1, N).astype(np.float32))
alpha, od, omn = jnp.float32(0.25), jnp.float32(1/128), jnp.float32(-1.0)

def timeit(fn, *args, n=8):
    o = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    return (time.perf_counter() - t0) / n

flops = 2 * M * K * N

# XLA int8 + separate requant (what the engine does today)
@jax.jit
def xla_int8(xs, w):
    acc = jax.lax.dot_general(xs, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32).astype(jnp.float32)
    v = acc * scale + corr
    v = jnp.where(v >= 0, v, alpha * v)
    X = jnp.clip(jnp.round((v - omn) / od), 0.0, 255.0)
    return (X - 128.0).astype(jnp.int8)

dt = timeit(xla_int8, xs, w)
print(f"XLA int8+requant     : {dt*1e3:8.2f} ms  {flops/dt/1e12:6.2f} T/s", flush=True)

# bf16 matmul floor
xb = xs.astype(jnp.bfloat16); wb = w.astype(jnp.bfloat16)
@jax.jit
def xla_bf16(xb, wb):
    return jax.lax.dot_general(xb, wb, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
dt = timeit(xla_bf16, xb, wb)
print(f"XLA bf16 matmul      : {dt*1e3:8.2f} ms  {flops/dt/1e12:6.2f} T/s", flush=True)

for tm, tn in itertools.product((256, 512, 1024, 2048), (256, 512)):
    try:
        fn = jax.jit(functools.partial(int8_matmul_requant_pallas, tm=tm, tn=tn))
        dt = timeit(fn, xs, w, scale, corr, alpha, od, omn)
        print(f"pallas tm={tm:5d} tn={tn:4d}: {dt*1e3:8.2f} ms  {flops/dt/1e12:6.2f} T/s", flush=True)
    except Exception as e:
        print(f"pallas tm={tm:5d} tn={tn:4d}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
