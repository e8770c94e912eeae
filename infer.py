#!/usr/bin/env python3
"""Single-file separation CLI (reference: infer.py:25-102).

Usage: python infer.py -y cfg.yaml -a mixture.wav [-o out_dir]
Writes one WAV per separated source plus a waveform plot.
"""

from __future__ import annotations

import argparse
import os


def argument_handler():
    parser = argparse.ArgumentParser()
    parser.add_argument("--yml_path", "-y", type=str, required=True, help="YML configuration file")
    parser.add_argument("--audio_path", "-a", type=str, required=True, help="Input mixture WAV")
    parser.add_argument("--output_dir", "-o", type=str, default=None, help="Output directory")
    parser.add_argument("--normalize", action="store_true", help="Peak-normalize the input")
    parser.add_argument("--use_cpu", action="store_true", help="Use cpu")
    parser.add_argument(
        "--engine",
        choices=["fake_quant", "folded", "int8", "auto"],
        default="fake_quant",
        help="Serving path: per-forward fake-quant (reference semantics), "
        "weight-folded fake-quant (bitwise identical, weights pre-quantized), "
        "the int8 MXU engine (ConvTasNet families, Sepformer, DPTNet), or "
        "auto — the measured-fastest path for this model family "
        "(serve/autopath.py; never slower than the default path).",
    )
    parser.add_argument(
        "--stream",
        type=int,
        default=None,
        metavar="PUSH",
        help="Feed the file through the real-time StreamingSeparator in "
        "PUSH-sample pushes (bounded-latency serving path; a drained stream "
        "is sample-identical to the offline OLA output).",
    )
    return parser.parse_args()


def infer():
    args = argument_handler()
    if args.use_cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fqss_tpu.models.factory import create_pretrained_model
    from fqss_tpu.separation.ola import ola_infer
    from fqss_tpu.utils.audio import normalize_audio, read_audio, resample_audio, save_audio
    from fqss_tpu.utils.config import load_config

    conf = load_config(args.yml_path)
    model_cfg = conf["model_cfg"]
    dataset_cfg = conf.get("dataset_cfg", {})
    testing_cfg = conf.get("testing_cfg", {})

    wav, fs = read_audio(args.audio_path)
    resample = dataset_cfg.get("resample", 1)
    if resample != 1:
        wav = resample_audio(wav, fs, int(fs * resample))
        fs = int(fs * resample)
    if args.normalize:
        wav = normalize_audio(wav)

    n_srcs = model_cfg.get("n_src", 1)
    segment = testing_cfg.get("segment_samples")
    example = jnp.zeros((1, int(segment or wav.shape[-1])), jnp.float32)
    model, variables = create_pretrained_model(model_cfg, example, observer=False)
    if args.engine == "int8":
        from fqss_tpu.serve import make_int8_engine

        try:
            apply_fn = make_int8_engine(model, variables)
        except NotImplementedError as e:
            raise SystemExit(f"--engine int8: {e}; use --engine folded")
    elif args.engine == "folded":
        from fqss_tpu.serve import fold_quantized_weights

        smodel, svars = fold_quantized_weights(model, variables)
        apply_fn = jax.jit(lambda x: smodel.apply(svars, x))
    elif args.engine == "auto":
        from fqss_tpu.serve import auto_serving_model

        smodel, svars = auto_serving_model(model, variables)
        apply_fn = jax.jit(lambda x: smodel.apply(svars, x))
    else:
        apply_fn = jax.jit(lambda x: model.apply(variables, x))

    overlap = testing_cfg.get("overlap", 0.25)
    if args.stream:
        from fqss_tpu.serve.streaming import StreamingSeparator

        if not segment:
            raise SystemExit("--stream needs testing_cfg.segment_samples")
        channels = wav.shape[0]
        eng = StreamingSeparator(apply_fn, n_srcs=n_srcs, segment=int(segment),
                                 overlap=overlap, channels=channels)
        pieces = [
            eng.push(wav[:, i : i + args.stream] if channels > 1 else wav[0, i : i + args.stream])
            for i in range(0, wav.shape[-1], args.stream)
        ]
        pieces.append(eng.flush())
        out = np.concatenate(pieces, axis=-1)
    else:
        out = ola_infer(apply_fn, wav, n_srcs=n_srcs, segment=segment, overlap=overlap)

    out_dir = args.output_dir or os.path.join(
        conf.get("work_dir", "."), "inference", os.path.splitext(os.path.basename(args.audio_path))[0]
    )
    os.makedirs(out_dir, exist_ok=True)
    for s in range(n_srcs):
        save_audio(os.path.join(out_dir, f"source_{s + 1}.wav"), out[s], fs)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(n_srcs + 1, 1, figsize=(10, 2 * (n_srcs + 1)), sharex=True)
        t = np.arange(wav.shape[-1]) / fs
        axes[0].plot(t, wav[0])
        axes[0].set_title("mixture")
        for s in range(n_srcs):
            axes[s + 1].plot(t[: out.shape[-1]], np.asarray(out[s]).reshape(-1))
            axes[s + 1].set_title(f"source {s + 1}")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "waveforms.png"), dpi=80)
    except Exception as e:  # plotting is best-effort
        print(f"(plot skipped: {e})")

    print(f"Wrote {n_srcs} sources to {out_dir}")


if __name__ == "__main__":
    infer()
