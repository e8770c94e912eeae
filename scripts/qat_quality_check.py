#!/usr/bin/env python3
"""QAT quality check: float vs FQSS-8bit on a synthetic separation task.

The acceptance-shaped experiment (BASELINE.md: FQSS-8bit within 0.3 dB of
float): train a small ConvTasNet float model from scratch on synthetic
2-source mixtures, then run FQSS QAT (splitter=2/combiner=2, KD from the
float teacher, observer calibration) from those weights, and compare val
SI-SDR. Runs end-to-end on one chip in minutes.

Usage: python scripts/qat_quality_check.py [--steps-float N] [--steps-qat N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fqss_tpu.data import synth_batch
from fqss_tpu.models import ConvTasNet
from fqss_tpu.quant import QuantSpec
from fqss_tpu.separation.losses import pit_neg_sisdr_db
from fqss_tpu.train import TrainConfig, create_train_state, make_optimizer, make_train_step

ARCH = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=128, bn_chan=32, hid_chan=64, n_blocks=4, n_repeats=2)
SEG = 8000  # 1s @ 8k
BATCH = 8


def data_stream(seed: int):
    rng = np.random.default_rng(seed)
    while True:
        yield synth_batch(rng, BATCH, 2, SEG)


def eval_sisdr(model, variables, n_batches: int = 8, seed: int = 999) -> float:
    rng = np.random.default_rng(seed)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    vals = []
    for _ in range(n_batches):
        mix, src = synth_batch(rng, BATCH, 2, SEG)
        est = fwd(variables, jnp.asarray(mix))[..., :SEG]
        vals.append(-float(pit_neg_sisdr_db(est, jnp.asarray(src))))
    return float(np.mean(vals))


def train(model, teacher, variables, teacher_params, cfg, steps, seed):
    tx = make_optimizer(cfg)
    state = create_train_state(dict(variables), tx, teacher_params=teacher_params)
    step_fn = make_train_step(model, teacher, tx, cfg)
    stream = data_stream(seed)
    t0 = time.time()
    for i in range(steps):
        mix, src = next(stream)
        state, metrics = step_fn(state, jnp.asarray(mix), jnp.asarray(src))
        if i % 200 == 0:
            print(f"  step {i}: loss={float(metrics['loss']):.3f} ({time.time() - t0:.0f}s)")
    out = {"params": jax.device_get(state.params)}
    if state.qparams:
        out["qparams"] = jax.device_get(state.qparams)
    if state.qstats:
        out["qstats"] = jax.device_get(state.qstats)
    return out, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-float", type=int, default=3000)
    ap.add_argument("--steps-qat", type=int, default=1500)
    args = ap.parse_args()

    x0 = jnp.zeros((BATCH, SEG))

    # ---- 1. float training from scratch
    print("== float training ==")
    fmodel = ConvTasNet(**ARCH)
    fvars = dict(fmodel.init(jax.random.PRNGKey(0), x0))
    cfg_f = TrainConfig(kd_lambda=0.0, lr=1e-3)
    fvars_trained, _ = train(fmodel, fmodel, fvars, None, cfg_f, args.steps_float, seed=1)
    float_sisdr = eval_sisdr(fmodel, fvars_trained)
    print(f"float SI-SDR: {float_sisdr:.2f} dB")

    # ---- 2. FQSS QAT from the float weights (KD teacher = float model)
    print("== FQSS 8-bit QAT (splitter=2, combiner=2, KD) ==")
    q = QuantSpec(qat=True, observer=True, n_splitter=2, n_combiner=2, out_quant=True)
    qmodel = ConvTasNet(q=q, **ARCH)
    qvars = dict(qmodel.init(jax.random.PRNGKey(0), x0))
    # load float weights (encoder widened for the splitter)
    from fqss_tpu.models.factory import merge_float_params

    qvars["params"] = merge_float_params(qvars["params"], fvars_trained["params"], 2)
    cfg_q = TrainConfig(kd_lambda=0.1, lr=5e-4)
    qvars_trained, _ = train(qmodel, fmodel, qvars, fvars_trained["params"], cfg_q, args.steps_qat, seed=2)
    qat_sisdr = eval_sisdr(qmodel, qvars_trained)
    print(f"FQSS-8bit SI-SDR: {qat_sisdr:.2f} dB")

    # ---- 3. vanilla QAT control (no splitter/combiner, no KD)
    print("== vanilla 8-bit QAT (no splitter/combiner/KD) ==")
    qv = QuantSpec(qat=True, observer=True, n_splitter=1, n_combiner=1, out_quant=True)
    vmodel = ConvTasNet(q=qv, **ARCH)
    vvars = dict(vmodel.init(jax.random.PRNGKey(0), x0))
    vvars["params"] = merge_float_params(vvars["params"], fvars_trained["params"], 1)
    vvars_trained, _ = train(vmodel, fmodel, vvars, None, TrainConfig(kd_lambda=0.0, lr=5e-4), args.steps_qat, seed=2)
    vanilla_sisdr = eval_sisdr(vmodel, vvars_trained)
    print(f"vanilla-8bit SI-SDR: {vanilla_sisdr:.2f} dB")

    print("\n==== RESULT ====")
    print(f"float:       {float_sisdr:.2f} dB")
    print(f"vanilla QAT: {vanilla_sisdr:.2f} dB (gap {float_sisdr - vanilla_sisdr:+.2f})")
    print(f"FQSS QAT:    {qat_sisdr:.2f} dB (gap {float_sisdr - qat_sisdr:+.2f})")


if __name__ == "__main__":
    main()
