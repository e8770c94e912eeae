"""Pallas LSTM recurrence kernel vs lax.scan at DPTNet shapes (real TPU).

DPTNet's dual-path transformer runs 24 directional LSTM scans per forward
(reference: quantization/qat/models/dptnetq.py:60-97); per-step overhead,
not FLOPs, dominates. This measures the isolated recurrence both ways with
the honest pipelined-timing harness (see bench.py).

Run: python scripts/bench_lstm.py [T B H]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.ops.pallas_lstm import _lstm_scan, lstm_sequence


def timeit(fn, *args, n=8):
    np.asarray(jax.device_get(fn(*args, jnp.float32(-1.0)).ravel()[:1]))
    t0 = time.perf_counter()
    outs = [fn(*args, jnp.float32(i)).ravel()[:1] for i in range(n)]
    for o in outs:
        np.asarray(jax.device_get(o))
    return (time.perf_counter() - t0) / n


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    # DPTNet-ish default: segment length T=130, B = batch*n_segments (the
    # vmapped batch of row/col scans), H=128 (hidden_dim).
    T, B, H = (int(a) for a in args) if len(args) == 3 else (130, 256, 128)
    print(f"device: {jax.devices()}  T={T} B={B} H={H}", flush=True)
    rng = jax.random.PRNGKey(0)
    ih = jax.random.normal(rng, (T, B, 4 * H)) * 0.1
    whh = jax.random.normal(jax.random.PRNGKey(1), (H, 4 * H)) * 0.1

    scan = jax.jit(lambda ih, w, tick: _lstm_scan(ih + tick * 1e-6, w))
    pall = jax.jit(lambda ih, w, tick: lstm_sequence(ih + tick * 1e-6, w))

    y0 = np.asarray(jax.device_get(scan(ih, whh, jnp.float32(0.0))))
    y1 = np.asarray(jax.device_get(pall(ih, whh, jnp.float32(0.0))))
    err = np.abs(y0 - y1).max()
    sdr = 10 * np.log10((y0**2).mean() / max(((y0 - y1) ** 2).mean(), 1e-30))
    print(f"agreement: max|diff|={err:.3e}  {sdr:.1f} dB", flush=True)

    d_scan = timeit(scan, ih, whh)
    print(f"lax.scan : {d_scan*1e3:9.3f} ms  ({d_scan/T*1e6:7.2f} us/step)", flush=True)
    d_pall = timeit(pall, ih, whh)
    print(f"pallas   : {d_pall*1e3:9.3f} ms  ({d_pall/T*1e6:7.2f} us/step)  "
          f"speedup {d_scan/d_pall:.2f}x", flush=True)


if __name__ == "__main__":
    main()
