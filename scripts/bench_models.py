"""Per-model batched inference throughput on the real TPU chip (honest timing).

Produces the PARITY.md per-model table: full-size FQSS-8bit QAT forwards at
production batch sizes, f32 vs bf16 MXU compute. Timing varies an input per
call and reads a slice of each output back to the host (see bench.py for why
that is required through the axon tunnel).

Run: python scripts/bench_models.py [model ...]   (default: all)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.quant import QuantSpec

Q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)

# (name, builder kwargs, batch, seconds, sample_rate, stereo)
CASES = {
    "convtasnet": dict(batch=32, seconds=12.0, sr=8000, stereo=False),
    "dptnet": dict(batch=4, seconds=4.0, sr=8000, stereo=False),
    "sepformer": dict(batch=8, seconds=4.0, sr=8000, stereo=False),
    "convtasnet_music": dict(batch=2, seconds=4.0, sr=44100, stereo=True),
    "htdemucs": dict(batch=2, seconds=6.0, sr=44100, stereo=True),
}


def build(name: str, q: QuantSpec):
    if name == "convtasnet":
        from fqss_tpu.models import ConvTasNet

        return ConvTasNet(n_srcs=2, kernel_size=16, stride=8, q=q)
    if name == "dptnet":
        from fqss_tpu.models.dptnet import DPTNet

        return DPTNet(n_srcs=2, kernel_size=2, q=q)
    if name == "sepformer":
        from fqss_tpu.models.sepformer import Sepformer

        return Sepformer(n_srcs=2, kernel_size=16, stride=8, q=q)
    if name == "convtasnet_music":
        from fqss_tpu.models.convtasnet_music import ConvTasNetMusic

        return ConvTasNetMusic(q=q)
    if name == "htdemucs":
        from fqss_tpu.models.htdemucs import HTDemucs

        return HTDemucs(q=q)
    raise ValueError(name)


def timeit(fn, *args, n=10):
    """Pipelined throughput timing (see bench.py): vary an input per call,
    dispatch all n, then fetch a slice of every output."""
    slc = lambda out: jax.tree_util.tree_leaves(out)[0].ravel()[:1]
    np.asarray(jax.device_get(slc(fn(*args, jnp.float32(-1.0)))))
    t0 = time.perf_counter()
    outs = [slc(fn(*args, jnp.float32(i))) for i in range(n)]
    for o in outs:
        np.asarray(jax.device_get(o))
    return (time.perf_counter() - t0) / n


def bench_case(name: str, engines: bool = False, pallas_lstm: bool = False, pallas_attn: bool = False):
    c = CASES[name]
    T = int(c["seconds"] * c["sr"])
    shape = (c["batch"], 2, T) if c["stereo"] else (c["batch"], T)
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1.0, maxval=1.0)
    for dtype in ("float32", "bfloat16"):
        q = dataclasses.replace(Q, compute_dtype=dtype, pallas_lstm=pallas_lstm, pallas_attn=pallas_attn)
        model = build(name, q)
        try:
            variables = model.init(jax.random.PRNGKey(1), x)
            fwd = jax.jit(lambda v, x, tick: model.apply(v, x + tick * 1e-6))
            dt = timeit(fwd, variables, x, n=8)
            sa = c["batch"] * c["seconds"] / dt
            print(f"{name:18s} {dtype:9s} batch={c['batch']:3d} x {c['seconds']:.0f}s "
                  f"{dt*1e3:9.2f} ms {sa:12,.0f} sec-audio/s", flush=True)
        except Exception as e:
            print(f"{name:18s} {dtype:9s} FAILED: {type(e).__name__}: {e}", flush=True)
        if engines and dtype == "bfloat16":
            try:
                from fqss_tpu.serve import make_int8_engine

                engine = make_int8_engine(model, dict(variables), compute_dtype=dtype)
                eng_fwd = jax.jit(lambda xx, tick: engine._forward(xx + tick * 1e-6))
                dt = timeit(eng_fwd, x, n=8)
                sa = c["batch"] * c["seconds"] / dt
                print(f"{name:18s} int8-eng  batch={c['batch']:3d} x {c['seconds']:.0f}s "
                      f"{dt*1e3:9.2f} ms {sa:12,.0f} sec-audio/s", flush=True)
            except NotImplementedError:
                pass
            except Exception as e:
                print(f"{name:18s} int8-eng  FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(CASES)
    engines = "--engines" in sys.argv
    pallas_lstm = "--pallas-lstm" in sys.argv
    pallas_attn = "--pallas-attn" in sys.argv
    print(f"device: {jax.devices()}", flush=True)
    for n in names:
        bench_case(n, engines=engines, pallas_lstm=pallas_lstm, pallas_attn=pallas_attn)


if __name__ == "__main__":
    main()
