#!/usr/bin/env python3
"""Evaluation CLI (reference: val.py:184-226).

Usage: python val.py -y cfg.yaml [--limit N] [--no-stoi]
"""

from __future__ import annotations

import argparse


def argument_handler():
    parser = argparse.ArgumentParser()
    parser.add_argument("--yml_path", "-y", type=str, required=True, help="YML configuration file")
    parser.add_argument("--use_cpu", action="store_true", help="Use cpu")
    parser.add_argument("--limit", type=int, default=None, help="Evaluate at most N items")
    parser.add_argument("--no-stoi", action="store_true", help="Skip STOI (slow on host)")
    parser.add_argument(
        "--engine",
        choices=["fake_quant", "folded", "int8", "auto"],
        default="fake_quant",
        help="Serving path: per-forward fake-quant, weight-folded (bitwise "
        "identical, weight quantizers pre-applied at load), the int8 MXU "
        "engine (ConvTasNet families, Sepformer, DPTNet), or auto — the "
        "measured-fastest path for this model family (serve/autopath.py).",
    )
    return parser.parse_args()


def val():
    args = argument_handler()
    if args.use_cpu:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax.numpy as jnp

    from fqss_tpu.models.factory import create_pretrained_model
    from fqss_tpu.utils.config import load_config

    conf = load_config(args.yml_path)
    model_cfg = conf["model_cfg"]
    dataset_cfg, testing_cfg = conf["dataset_cfg"], conf["testing_cfg"]

    # Build + load; observer disabled for eval (reference val.py:197-198).
    seg = testing_cfg.get("segment_samples") or 8000
    example = jnp.zeros((1, int(seg)), jnp.float32)
    model, variables = create_pretrained_model(model_cfg, example, observer=False)

    # Sanity: splitter/combiner requires QAT. (The reference's check tested
    # n_splitter twice — val.py:207; both are checked here.)
    qat = model_cfg.get("quantization", {}).get("qat", False)
    assert not (not qat and (model.q.n_splitter > 1 or model.q.n_combiner > 1)), (
        "No support for splitter/combiner with non QAT model."
    )

    apply_fn = None
    if args.engine == "folded":
        from fqss_tpu.serve import fold_quantized_weights

        model, variables = fold_quantized_weights(model, variables)
    elif args.engine == "auto":
        from fqss_tpu.serve import auto_serving_model

        model, variables = auto_serving_model(model, variables)
    elif args.engine == "int8":
        from fqss_tpu.serve import make_int8_engine

        try:
            apply_fn = make_int8_engine(model, variables)
        except NotImplementedError as e:
            raise SystemExit(f"--engine int8: {e}; use --engine folded")

    if dataset_cfg["name"] == "librimix":
        from fqss_tpu.train.validate import val_librimix

        sisnr, sisnr_imp, sdr, stoi = val_librimix(
            model, variables, model_cfg, dataset_cfg, testing_cfg,
            limit=args.limit, compute_stoi=not args.no_stoi, apply_fn=apply_fn,
        )
        print("SI-SDR={:0.2f},SI-SDR-imp={:0.2f},SDR={:0.2f},STOI={:0.3f}".format(sisnr, sisnr_imp, sdr, stoi))
    elif dataset_cfg["name"] == "musdbhq":
        from fqss_tpu.train.validate_musdb import val_musdbhq, val_musdbhq_nsdr

        if testing_cfg.get("NSDR", False):
            vals = val_musdbhq_nsdr(model, variables, model_cfg, testing_cfg, limit=args.limit, apply_fn=apply_fn)
            print("NSDR={:0.2f},NSDR_DRUMS={:0.2f},NSDR_BASS={:0.2f},NSDR_OTHER={:0.2f},NSDR_VOCALS={:0.2f}".format(*vals))
        else:
            vals, full = val_musdbhq(model, variables, model_cfg, testing_cfg, limit=args.limit, return_full=True, apply_fn=apply_fn)
            print("SDR={:0.2f},SDR_DRUMS={:0.2f},SDR_BASS={:0.2f},SDR_OTHER={:0.2f},SDR_VOCALS={:0.2f}".format(*vals))
            for metric in ("ISR", "SIR", "SAR"):  # full bss_eval v4 table
                per = full[metric]
                print(metric + "=" + ",".join(f"{s}:{v:0.2f}" for s, v in per.items()))
    else:
        raise ValueError("Dataset {} is not supported!".format(dataset_cfg["name"]))


if __name__ == "__main__":
    val()
