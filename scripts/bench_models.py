"""Per-model batched inference throughput on the real TPU chip (honest timing).

Produces the PARITY.md per-model table AND the driver-visible artifact
(BENCH_models_rNN.json): full-size FQSS-8bit QAT forwards at batch sizes
large enough to amortize the axon tunnel latency, across every serving path
(f32, bf16, bf16+Pallas LSTM/attention where the model has those sites,
int8 engine) — the JSON row records the best path per model.

Timing varies an input per call and reads a slice of each output back to
the host (see bench.py for why that is required through the tunnel).

Run: python scripts/bench_models.py [model ...] [--json OUT.json] [--engines]
"""

from __future__ import annotations

import dataclasses
import json
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
# Batches are sized so one call is >= ~100 ms of device work — large enough
# that the tunnel round-trip does not dominate (VERDICT r3 item 6).
CASES = {
    "convtasnet": dict(batch=32, seconds=12.0, sr=8000, stereo=False),
    "dptnet": dict(batch=8, seconds=4.0, sr=8000, stereo=False),
    "sepformer": dict(batch=8, seconds=4.0, sr=8000, stereo=False),
    "convtasnet_music": dict(batch=8, seconds=4.0, sr=44100, stereo=True),
    "htdemucs": dict(batch=8, seconds=6.0, sr=44100, stereo=True),
}

# Pallas kernel sites per model: LSTM recurrence (DPTNet FFN), fused
# attention (Sepformer/DPTNet/HTDemucs transformers).
PALLAS_PATHS = {
    "dptnet": ("pallas_lstm", "pallas_attn"),
    "sepformer": ("pallas_attn",),
    "htdemucs": ("pallas_attn",),
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


def bench_case(name: str, engines: bool = False, batch: int | None = None) -> dict:
    c = dict(CASES[name])
    if batch is not None:
        c["batch"] = batch
    T = int(c["seconds"] * c["sr"])
    shape = (c["batch"], 2, T) if c["stereo"] else (c["batch"], T)
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1.0, maxval=1.0)
    sec_audio = c["batch"] * c["seconds"]

    paths: dict[str, float] = {}
    variables = None

    def record(path: str, dt: float):
        paths[path] = dt
        print(f"{name:18s} {path:12s} batch={c['batch']:3d} x {c['seconds']:.0f}s "
              f"{dt*1e3:9.2f} ms {sec_audio/dt:12,.0f} sec-audio/s", flush=True)

    run_specs = [("float32", {}), ("bfloat16", {})]
    for flag in PALLAS_PATHS.get(name, ()):
        run_specs.append((f"bf16+{flag}", {flag: True}))

    for path, kernel_kw in run_specs:
        dtype = "float32" if path == "float32" else "bfloat16"
        q = dataclasses.replace(Q, compute_dtype=dtype, **kernel_kw)
        model = build(name, q)
        try:
            variables = model.init(jax.random.PRNGKey(1), x)
            fwd = jax.jit(lambda v, x, tick: model.apply(v, x + tick * 1e-6))
            record(path, timeit(fwd, variables, x, n=8))
        except Exception as e:
            print(f"{name:18s} {path:12s} FAILED: {type(e).__name__}: {e}", flush=True)

    if engines and variables is not None:
        try:
            from fqss_tpu.serve import make_int8_engine

            model = build(name, dataclasses.replace(Q, compute_dtype="bfloat16"))
            engine = make_int8_engine(model, dict(variables), compute_dtype="bfloat16")
            eng_fwd = jax.jit(lambda xx, tick: engine._forward(xx + tick * 1e-6))
            record("int8-engine", timeit(eng_fwd, x, n=8))
        except NotImplementedError:
            pass
        except Exception as e:
            print(f"{name:18s} int8-engine  FAILED: {type(e).__name__}: {e}", flush=True)

    best = min(paths, key=paths.get) if paths else None
    row = {
        "model": name,
        "batch": c["batch"],
        "seconds": c["seconds"],
        "sample_rate": c["sr"],
        "best_path": best,
        "best_ms_per_call": round(paths[best] * 1e3, 2) if best else None,
        "best_sec_audio_per_s": round(sec_audio / paths[best], 1) if best else None,
        "paths_ms": {k: round(v * 1e3, 2) for k, v in paths.items()},
    }
    if best:
        print(f"{name:18s} best: {best} ({row['best_sec_audio_per_s']:,} sec-audio/s)\n", flush=True)
    else:
        print(f"{name:18s} all paths FAILED\n", flush=True)
    return row


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", choices=list(CASES) + [[]], default=[])
    ap.add_argument("--engines", action="store_true")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--merge", action="store_true",
                    help="update the named models' rows in an existing --json file")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the per-model default batch size")
    a = ap.parse_args()
    names = a.models or list(CASES)
    print(f"device: {jax.devices()}", flush=True)
    rows = [bench_case(n, engines=a.engines, batch=a.batch) for n in names]
    if a.json_out:
        if a.merge and os.path.exists(a.json_out):
            with open(a.json_out) as f:
                old = {r["model"]: r for r in json.load(f)["rows"]}
            old.update({r["model"]: r for r in rows})
            rows = [old[n] for n in CASES if n in old]
        with open(a.json_out, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rows": rows}, f, indent=1)
        print(f"wrote {a.json_out}", flush=True)


if __name__ == "__main__":
    main()
