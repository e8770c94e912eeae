"""Benchmark: QAT inference throughput on TPU vs PyTorch-CPU reference.

Prints one JSON metric line per non-flagship model family (on its
measured-best serving path, vs_baseline = ratio over the last committed
BENCH_models_r*.json — a driver-visible regression detector), then the
flagship line LAST: {"metric": "convtasnet_fqss8bit_infer_throughput", ...}
(the line the driver parses).

Metric: seconds of audio separated per wall-clock second per chip by the
full-size fake-quantized ConvTasNet (n_splitter=2/n_combiner=2, the FQSS
8-bit configuration) on 12 s @ 8 kHz segments (testing_cfg segment length,
configs/dptnet_2spks_8k.yaml:117), batch 32, bf16 MXU compute (the serving
fast path; quantizer grid math stays f32). vs_baseline = ratio over the
reference PyTorch model running the same workload on this host's CPU
(measured once and cached in .bench_cache.json; BASELINE.md target: >= 20x).

Timing methodology (IMPORTANT): through the axon TPU tunnel,
jax.block_until_ready does not reliably wait for device execution and
identical repeat dispatches can be served from a cache, which inflates naive
timing loops by orders of magnitude; separately, every synchronized call
pays a ~250 ms tunnel round-trip latency regardless of program. Honest
THROUGHPUT timing therefore (a) varies an input scalar per call so no two
dispatches are identical, (b) dispatches all iterations then fetches a
slice of EVERY output before the clock stops — the serving-pipeline
pattern, overlapping the tunnel latency with device execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SEG = 96000  # 12 s @ 8 kHz
BATCH = 32
N_SRC = 2
KERNEL, STRIDE = 16, 8


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from fqss_tpu.models import ConvTasNet
    from fqss_tpu.quant import QuantSpec

    q = QuantSpec(
        qat=True,
        observer=False,
        n_splitter=2,
        n_combiner=2,
        out_quant=True,
        compute_dtype="bfloat16",
    )
    model = ConvTasNet(n_srcs=N_SRC, kernel_size=KERNEL, stride=STRIDE, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, SEG), minval=-1.0, maxval=1.0)
    variables = model.init(jax.random.PRNGKey(1), x)

    def throughput(m, v) -> float:
        fwd = jax.jit(lambda v, x, tick: m.apply(v, x + tick * 1e-6))
        # compile + warm (readback forces real completion through the tunnel)
        np.asarray(jax.device_get(fwd(v, x, jnp.float32(-1.0))[0, 0, :1]))
        n_iter = 20
        t0 = time.perf_counter()
        outs = [fwd(v, x, jnp.float32(i))[0, 0, :1] for i in range(n_iter)]
        for o in outs:
            np.asarray(jax.device_get(o))
        dt = time.perf_counter() - t0
        return n_iter * BATCH * SEG / 8000.0 / dt  # sec-of-audio / sec

    # Deployment path: weight fake-quant folded once at load (serve/fold.py,
    # bitwise-equal outputs) — saves the per-forward weight quant-dequant.
    # Report the better of the two honest paths.
    from fqss_tpu.serve.fold import fold_quantized_weights

    smodel, svars = fold_quantized_weights(model, variables)
    return max(throughput(model, variables), throughput(smodel, svars))


def bench_torch_cpu_reference() -> float | None:
    """Reference ConvTasNetQ (float-surgery QAT path is torch-only; we bench
    the float forward which lower-bounds its cost) on this host's CPU."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")
    if os.path.exists(cache):
        try:
            return json.load(open(cache))["torch_cpu_sec_audio_per_sec"]
        except Exception:
            pass
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return None
    try:
        import types

        import torch

        for name in ("torchmetrics", "torchmetrics.audio", "torchmetrics.audio.stoi", "torchaudio"):
            sys.modules.setdefault(name, types.ModuleType(name))
        sys.modules["torchmetrics"].ScaleInvariantSignalNoiseRatio = object
        sys.modules["torchmetrics"].SignalDistortionRatio = object
        sys.modules["torchmetrics.audio.stoi"].ShortTimeObjectiveIntelligibility = object
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            for name in ("matplotlib", "matplotlib.pyplot"):
                sys.modules.setdefault(name, types.ModuleType(name))
        if ref not in sys.path:
            sys.path.insert(0, ref)
        from quantization.qat.models.convtasnetq import ConvTasNetQ

        tm = ConvTasNetQ(n_spks=N_SRC, kernel_size=KERNEL, stride=STRIDE).eval()
        x = torch.rand(1, SEG) * 2 - 1
        with torch.no_grad():
            tm(x)  # warm
            n_iter, t0 = 3, time.perf_counter()
            for _ in range(n_iter):
                tm(x)
            dt = time.perf_counter() - t0
        value = n_iter * SEG / 8000.0 / dt
        json.dump({"torch_cpu_sec_audio_per_sec": value}, open(cache, "w"))
        return value
    except Exception:
        return None


def bench_all_models() -> list[dict]:
    """One throughput line per model family on its measured-best serving path
    (serve/autopath.py table), so a regression in any family shows up in the
    driver-captured artifact, not only in builder-committed files (VERDICT r4
    item 7). vs_baseline here is the ratio over the last committed per-model
    bench table (BENCH_models_r*.json) — ~1.0 means no regression."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import bench_models as bm

    from fqss_tpu.serve.autopath import BEST_PATHS, path_label

    prev = {}
    cands = sorted(f for f in os.listdir(repo) if f.startswith("BENCH_models_r") and f.endswith(".json"))
    if cands:
        with open(os.path.join(repo, cands[-1])) as f:
            prev = {r["model"]: r for r in json.load(f)["rows"]}

    by_key = {v: k for k, v in {
        "ConvTasNet": "convtasnet", "Sepformer": "sepformer", "DPTNet": "dptnet",
        "ConvTasNetMusic": "convtasnet_music", "HTDemucs": "htdemucs"}.items()}
    rows = []
    for name, c in bm.CASES.items():
        if name == "convtasnet":
            continue  # flagship metric covers it (full multi-path bench)
        overrides = dict(BEST_PATHS[by_key[name]])
        q = dataclasses.replace(bm.Q, **overrides)
        model = bm.build(name, q)
        T = int(c["seconds"] * c["sr"])
        shape = (c["batch"], 2, T) if c["stereo"] else (c["batch"], T)
        x = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1.0, maxval=1.0)
        variables = model.init(jax.random.PRNGKey(1), x)
        fwd = jax.jit(lambda v, xx, tick: model.apply(v, xx + tick * 1e-6))
        dt = bm.timeit(fwd, variables, x, n=8)
        val = c["batch"] * c["seconds"] / dt
        base = (prev.get(name) or {}).get("best_sec_audio_per_s")
        rows.append({
            "metric": f"{name}_fqss8bit_infer_throughput",
            "value": round(val, 1),
            "unit": "sec_audio_per_sec_per_chip",
            "vs_baseline": round(val / base, 3) if base else None,
            "path": path_label(overrides),
        })
    return rows


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_tpu")
    try:
        for row in bench_all_models():
            print(json.dumps(row), flush=True)
    except Exception as e:  # per-model lines are best-effort; flagship must print
        print(f"(per-model bench skipped: {type(e).__name__}: {e})", file=sys.stderr)
    tpu = bench_tpu()
    cpu = bench_torch_cpu_reference()
    vs = tpu / cpu if cpu else None
    print(json.dumps({
        "metric": "convtasnet_fqss8bit_infer_throughput",
        "value": round(tpu, 2),
        "unit": "sec_audio_per_sec_per_chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
