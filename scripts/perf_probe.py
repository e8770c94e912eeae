"""Perf probe: where does the ConvTasNet QAT forward time go on a v5e chip?

Measures (1) the current f32 QAT forward, (2) the float forward (isolates
fake-quant overhead), (3) raw matmul rates f32/bf16/int8 at TCN shapes to
size the headroom for a low-precision serving path.

Run: python scripts/perf_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fqss_tpu.models import ConvTasNet
from fqss_tpu.quant import QuantSpec

SEG = 96000
BATCH = 32
KERNEL, STRIDE = 16, 8


import numpy as np


def timeit(fn, *args, n=30, pipelined=True):
    """Honest timing through the axon TPU tunnel.

    Two tunnel pathologies shape this: (a) repeated identical (executable,
    inputs) dispatches can be served without re-execution, so every call gets
    a distinct `tick` folded into its inputs; (b) block_until_ready is
    unreliable, so completion is forced by fetching a slice of each output.

    pipelined=True (default; the serving/training-loop pattern): dispatch all
    n calls, then fetch a slice of every output — per-call dispatch/sync
    latency (~250 ms through this tunnel regardless of program!) overlaps
    with device execution, so this measures THROUGHPUT.
    pipelined=False: fetch after every call — measures per-call LATENCY
    including the tunnel round trip.
    """
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(fn(*args, jnp.float32(-1.0)))[0].ravel()[:1]))
    ticks = [jnp.float32(i) for i in range(n)]
    slc = lambda out: jax.tree_util.tree_leaves(out)[0].ravel()[:1]
    t0 = time.perf_counter()
    if pipelined:
        outs = [slc(fn(*args, t)) for t in ticks]
        for o in outs:
            np.asarray(jax.device_get(o))
    else:
        for t in ticks:
            np.asarray(jax.device_get(slc(fn(*args, t))))
    return (time.perf_counter() - t0) / n


def bench_model(q: QuantSpec, label: str, n=8):
    model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, SEG), minval=-1.0, maxval=1.0)
    variables = model.init(jax.random.PRNGKey(1), x)
    fwd = jax.jit(lambda v, x, tick: model.apply(v, x + tick * 1e-6))
    dt = timeit(fwd, variables, x, n=n)
    sa = BATCH * SEG / 8000.0 / dt
    print(f"{label:36s} {dt*1e3:8.2f} ms   {sa:12,.0f} sec-audio/s", flush=True)
    return dt


def bench_matmuls():
    # TCN 1x1 conv shape: M = B * T_frames, K=128->512 etc.
    M, K, N = 32 * 12000, 512, 512
    REP = 20  # chain REP dependent matmuls inside one jit so nothing overlaps

    for dt_in, dt_acc, label in [
        (jnp.float32, jnp.float32, "matmul f32"),
        (jnp.bfloat16, jnp.float32, "matmul bf16 (f32 acc)"),
        (jnp.int8, jnp.int32, "matmul int8 (i32 acc)"),
    ]:
        key = jax.random.PRNGKey(0)
        if dt_in == jnp.int8:
            a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
            b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)

            def f(a, b, tick):
                acc = a + tick.astype(jnp.int8)
                for _ in range(REP):
                    o = jax.lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32)
                    acc = (o >> 8).astype(jnp.int8)  # feed output back, keep int8
                return acc
        else:
            a = jax.random.normal(key, (M, K), dt_in)
            b = jax.random.normal(key, (K, N), dt_in)

            def f(a, b, tick):
                acc = a + tick.astype(dt_in)
                for _ in range(REP):
                    o = jax.lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    acc = (o * 1e-3).astype(dt_in)
                return acc
        jf = jax.jit(f)
        try:
            d = timeit(jf, a, b, n=5) / REP
            tops = 2 * M * K * N / d / 1e12
            print(f"{label:36s} {d*1e3:8.3f} ms   {tops:8.1f} T(FL)OP/s", flush=True)
        except Exception as e:
            print(f"{label:36s} FAILED: {type(e).__name__}: {e}")


def bench_engine(q: QuantSpec, compute_dtype: str, use_pallas: bool, label: str, n=8):
    import dataclasses

    from fqss_tpu.serve import ConvTasNetInt8Engine

    model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, SEG), minval=-1.0, maxval=1.0)
    # one observer pass for sane ranges (init ranges are fine for perf)
    obs_model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=dataclasses.replace(q, observer=True))
    variables = dict(obs_model.init(jax.random.PRNGKey(1), x))
    engine = ConvTasNetInt8Engine(model, variables, compute_dtype=compute_dtype, use_pallas=use_pallas)
    fwd = jax.jit(lambda x, tick: engine._forward(x + tick * 1e-6))
    dt = timeit(fwd, x, n=n)
    sa = BATCH * SEG / 8000.0 / dt
    print(f"{label:36s} {dt*1e3:8.2f} ms   {sa:12,.0f} sec-audio/s", flush=True)
    return dt


def bench_fold(n=8):
    """QAT fake-quant forward vs the weight-folded serving path
    (serve/fold.py) on the same checkpoint — the fold removes the per-call
    weight quant-dequant (bitwise-equal outputs)."""
    import dataclasses

    from fqss_tpu.serve.fold import fold_quantized_weights

    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2,
                  out_quant=True, compute_dtype="bfloat16")
    model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, SEG), minval=-1.0, maxval=1.0)
    variables = dict(model.init(jax.random.PRNGKey(1), x))
    fwd = jax.jit(lambda v, x, tick: model.apply(v, x + tick * 1e-6))
    dt = timeit(fwd, variables, x, n=n)
    print(f"{'QAT fake-quant bf16':36s} {dt*1e3:8.2f} ms   {BATCH*SEG/8000.0/dt:12,.0f} sec-audio/s", flush=True)
    smodel, svars = fold_quantized_weights(model, variables)
    sfwd = jax.jit(lambda v, x, tick: smodel.apply(v, x + tick * 1e-6))
    dtf = timeit(sfwd, svars, x, n=n)
    print(f"{'weight-folded serving bf16':36s} {dtf*1e3:8.2f} ms   {BATCH*SEG/8000.0/dtf:12,.0f} sec-audio/s", flush=True)
    return dt, dtf


def bench_train_step(n=8):
    """Honest KD QAT train-step time (full-size ConvTasNet, batch 4 x 3s@8k,
    student fwd + teacher fwd + loss + bwd + clipped Adam step) — replaces
    the round-1 number that used the broken timing loop."""
    import dataclasses

    from fqss_tpu.quant import QuantSpec
    from fqss_tpu.train import TrainConfig, create_train_state, make_optimizer, make_train_step

    B, T = 4, 24000
    arch = {}
    for a in sys.argv:
        if a.startswith("--blocks="):
            arch = dict(n_blocks=int(a.split("=")[1]), n_repeats=1)
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=q, **arch)
    teacher = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=QuantSpec(), **arch)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, T), minval=-1.0, maxval=1.0)
    src = jax.random.uniform(jax.random.PRNGKey(1), (B, 2, T), minval=-1.0, maxval=1.0)
    qvars = dict(model.init(jax.random.PRNGKey(2), x))
    tvars = teacher.init(jax.random.PRNGKey(2), x)
    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3)
    tx = make_optimizer(cfg)
    state = create_train_state(qvars, tx, teacher_params=tvars["params"])
    step = make_train_step(model, teacher, tx, cfg)

    state, m0 = step(state, x, src)  # compile
    np.asarray(jax.device_get(m0["loss"]))
    # Training-loop pattern: steps chain through the donated state (true
    # data dependency -> no overlap between steps on device), losses are
    # fetched once at the end — per-call tunnel sync latency overlaps.
    n = 20
    losses = []
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step(state, x + jnp.float32(i) * 1e-6, src)
        losses.append(metrics["loss"])
    for l in losses:
        np.asarray(jax.device_get(l))
    dt = (time.perf_counter() - t0) / n
    print(f"{'KD train step (B=4 x 3s)':36s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def bench_grad_probe(n=5):
    """Split the train-step cost: forward-only vs plain-grad vs KD grad."""
    from fqss_tpu.quant import QuantSpec

    B, T = 4, 24000
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=q)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, T), minval=-1.0, maxval=1.0)
    variables = dict(model.init(jax.random.PRNGKey(1), x))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    fwd = jax.jit(lambda p, x, tick: model.apply({"params": p, **rest}, x + tick * 1e-6))
    dt = timeit(fwd, params, x, n=n)
    print(f"{'fwd only (B=4 x 3s)':36s} {dt*1e3:8.2f} ms", flush=True)

    def loss(p, x):
        return jnp.sum(jnp.abs(model.apply({"params": p, **rest}, x)))

    g = jax.jit(lambda p, x, tick: jax.grad(loss)(p, x + tick * 1e-6))
    dt = timeit(g, params, x, n=n)
    print(f"{'grad(params) only':36s} {dt*1e3:8.2f} ms", flush=True)


def bench_state_cost(n=6):
    """Isolate the tunnel's per-step cost of threading a large train state:
    a donated jit that only adds 1e-6 to every leaf (zero real compute)."""
    import dataclasses
    import functools

    from fqss_tpu.quant import QuantSpec
    from fqss_tpu.train import TrainConfig, create_train_state, make_optimizer

    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNet(n_srcs=2, kernel_size=KERNEL, stride=STRIDE, q=q)
    x = jnp.zeros((1, 8000))
    qvars = dict(model.init(jax.random.PRNGKey(2), x))
    tx = make_optimizer(TrainConfig())
    state = create_train_state(qvars, tx, teacher_params=qvars["params"])
    n_bytes = sum(a.size * a.dtype.itemsize for a in jax.tree_util.tree_leaves(state))
    print(f"state bytes: {n_bytes/1e6:.1f} MB, leaves: {len(jax.tree_util.tree_leaves(state))}")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def touch(s, tick):
        return jax.tree_util.tree_map(lambda a: a + jnp.asarray(tick, a.dtype) * 0, s)

    state = touch(state, jnp.float32(-1.0))
    np.asarray(jax.device_get(state.step))
    t0 = time.perf_counter()
    for i in range(n):
        state = touch(state, jnp.float32(i))
        np.asarray(jax.device_get(state.step))
    dt = (time.perf_counter() - t0) / n
    print(f"{'state-only donated step':36s} {dt*1e3:8.2f} ms", flush=True)


def main():
    import dataclasses

    print(f"device: {jax.devices()}")
    if "--matmuls" in sys.argv:
        bench_matmuls()
        return
    if "--trainstep" in sys.argv:
        bench_train_step()
        return
    if "--statecost" in sys.argv:
        bench_state_cost()
        return
    if "--gradprobe" in sys.argv:
        bench_grad_probe()
        return
    if "--fold" in sys.argv:
        bench_fold()
        return
    q_float = QuantSpec(qat=False)
    q_qat = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    q_bf16 = dataclasses.replace(q_qat, compute_dtype="bfloat16")
    bench_model(q_float, "ConvTasNet float f32")
    bench_model(q_qat, "ConvTasNet FQSS-8bit QAT f32")
    bench_model(q_bf16, "ConvTasNet FQSS-8bit QAT bf16")
    bench_engine(q_qat, "bfloat16", False, "int8 engine (XLA, bf16 rest)")
    try:
        bench_engine(q_qat, "bfloat16", True, "int8 engine (Pallas fused)")
    except Exception as e:
        print(f"pallas engine FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
