"""Isolated fused-Pallas-vs-XLA attention core benchmark.

Shapes follow the Sepformer intra-chunk attention (reference:
quantization/qat/models/sepformerq.py:241-301 — chunks of K=250, 8 heads)
batched as [B*chunks*heads, L, d]. Pipelined-throughput timing: every call
gets distinct inputs, all outputs fetched at the end (see PARITY.md round-2
timing notes).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fqss_tpu.ops.pallas_attention import _attention_xla, fused_attention


def pipelined(fn, args_list, iters):
    import sys

    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[:1]]  # warm-up/compile
    jax.block_until_ready(outs)
    print(f"  compiled in {time.perf_counter()-t0:.1f}s", flush=True, file=sys.stderr)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    for o in outs:
        _ = jax.device_get(o[0, 0, :1])
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bh", type=int, default=512, help="batch*chunks*heads")
    ap.add_argument("--l", type=int, default=250)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()

    key = jax.random.PRNGKey(0)
    mn = jnp.full((1,), -1.0, jnp.float32)
    mx = jnp.full((1,), 1.0, jnp.float32)
    args_list = []
    for i in range(4):
        k1, k2, k3, key = jax.random.split(key, 4)
        qs = jax.random.normal(k1, (a.bh, a.l, a.d), jnp.float32) * 0.2
        k = jax.random.normal(k2, (a.bh, a.l, a.d), jnp.float32)
        v = jax.random.normal(k3, (a.bh, a.l, a.d), jnp.float32)
        args_list.append((qs, k, v, mn, mx))

    xla = jax.jit(lambda q, k, v, mn, mx: _attention_xla(q, k, v, mn, mx, 8))
    pal = jax.jit(lambda q, k, v, mn, mx: fused_attention(q, k, v, mn, mx, 8))

    t_xla = pipelined(xla, args_list, a.iters)
    t_pal = pipelined(pal, args_list, a.iters)
    flops = 4 * a.bh * a.l * a.l * a.d
    print(f"shape BH={a.bh} L={a.l} d={a.d}  ({flops/1e9:.2f} GFLOP/call)")
    print(f"xla   : {t_xla*1e3:8.2f} ms  ({flops/t_xla/1e12:.2f} TF/s)")
    print(f"pallas: {t_pal*1e3:8.2f} ms  ({flops/t_pal/1e12:.2f} TF/s)  speedup {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
