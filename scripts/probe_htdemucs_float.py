#!/usr/bin/env python3
"""Reproduce the HTDemucs float-arm root-cause probes (PARITY.md round-5
"HTDemucs float-arm anomaly" section; VERDICT r4 item 2).

Trains the tiny synthetic-campaign float HTDemucs and checks, in order:
1. per-batch eval finiteness + output scale (eval-masking hypothesis);
2. merge_float_params fidelity at n=1 (init-bug hypothesis) — every param
   leaf must change and the merged vanilla-spec model must eval at exactly
   the float score;
3. the float training trajectory at the chosen lr/schedule (optimization
   hypothesis) — constant 1e-3 oscillates at ~8.5-10 dB NSDR for 20k steps
   while QAT arms from the same weights reach 17-20 dB in 2.5k.

Usage: python scripts/probe_htdemucs_float.py [--steps N] [--lr-decay]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import scripts.qat_quality_check as q
from fqss_tpu.data.synthetic import synth_music_batch
from fqss_tpu.models.factory import merge_float_params
from fqss_tpu.quant import QuantSpec
from fqss_tpu.separation.losses import nsdr_db
from fqss_tpu.train import TrainConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-decay", action="store_true")
    args = ap.parse_args()

    fmodel = q.make_music_model("htdemucs")
    x0 = jnp.zeros((q.BATCH_M, 2, q.SEG_M))
    fvars = dict(fmodel.init(jax.random.PRNGKey(0), x0, train=True))
    ev = lambda v: q.eval_music_nsdr(fmodel, v, band=True, is_htdemucs=True, n_batches=4)
    fvars_t = q.train_music(
        fmodel, fmodel, fvars, None, TrainConfig(kd_lambda=0.0, lr=args.lr),
        args.steps, seed=1, weight_kind="exp", is_htdemucs=True, band=True,
        eval_fn=ev, lr_decay=args.lr_decay,
    )
    print(f"float {args.steps}-step NSDR: {ev(fvars_t):.2f} dB", flush=True)

    # 1. eval finiteness + scale
    fwd = q._cached_fwd(fmodel, train=True)
    rng = np.random.default_rng(999)
    for bi in range(4):
        src = synth_music_batch(rng, q.BATCH_M, q.SEG_M, band_disjoint=True)
        s = jnp.asarray(src)
        raw = np.asarray(fwd(fvars_t, s.sum(axis=1)))[..., : q.SEG_M]
        flat_s = s.reshape(s.shape[0] * s.shape[1], -1)
        per = np.asarray(nsdr_db(flat_s, jnp.asarray(np.nan_to_num(raw)).reshape(flat_s.shape)))
        print(f"batch {bi}: nonfinite={1.0 - np.isfinite(raw).mean():.4f} "
              f"|est|max={np.abs(raw).max():.3f} |tgt|max={float(jnp.abs(s).max()):.3f} "
              f"nsdr={per.mean():.2f}", flush=True)

    # 2. merge fidelity at n=1
    spec = QuantSpec(qat=True, observer=True, n_splitter=1, n_combiner=1, in_quant=True,
                     out_quant=True, act_n_bits=10, in_act_n_bits=8, out_act_n_bits=8)
    vmodel = q.make_music_model("htdemucs", q=spec)
    vvars = dict(vmodel.init(jax.random.PRNGKey(0), x0, train=True))
    merged = merge_float_params(vvars["params"], fvars_t["params"], 1)
    init_by_path = dict(jax.tree_util.tree_flatten_with_path(vvars["params"])[0])
    unchanged = sum(
        1 for path, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]
        if np.allclose(np.asarray(leaf), np.asarray(init_by_path[path]))
    )
    total = len(jax.tree_util.tree_leaves(merged))
    vvars["params"] = merged
    print(f"merge: {total - unchanged}/{total} leaves updated; merged "
          f"vanilla-spec NSDR = {q.eval_music_nsdr(vmodel, vvars, True, True):.2f} dB "
          f"(must equal the float score)", flush=True)


if __name__ == "__main__":
    main()
