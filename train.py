#!/usr/bin/env python3
"""Training CLI (reference: train.py:15-50).

Usage: python train.py -env {asteroid,speechbrain,tasnet,htdemucs} -y cfg.yaml

One SPMD trainer serves all four environments; the env name selects the
recipe behavior set (loss robustness, augmentation, checkpoint cadence).
"""

from __future__ import annotations

import argparse


def argument_handler():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--env_name", "-env", type=str, required=True,
        choices=["asteroid", "speechbrain", "tasnet", "htdemucs"],
        help="Training environment (recipe)",
    )
    parser.add_argument("--yml_path", "-y", type=str, required=True, help="YML configuration file")
    parser.add_argument("--use_cpu", action="store_true", help="Use cpu")
    # accepted for reference CLI parity; JAX SPMD needs no rank plumbing
    parser.add_argument("--local_rank", type=int, default=0, help=argparse.SUPPRESS)
    parser.add_argument("--distributed_launch", action="store_true", help=argparse.SUPPRESS)
    return parser.parse_args()


def train():
    args = argument_handler()
    if args.use_cpu:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from fqss_tpu.utils.config import load_config

    conf = load_config(args.yml_path)

    if args.env_name in ("asteroid", "speechbrain"):
        from fqss_tpu.train.recipes import train_speech

        result = train_speech(conf, env_name=args.env_name)
        print(f"Training done: best val_loss {result['best_val_loss']:.4f} "
              f"after {result['epochs_run']} epochs")
    elif args.env_name == "tasnet":
        from fqss_tpu.train.recipes_music import train_tasnet_music

        train_tasnet_music(conf)
    elif args.env_name == "htdemucs":
        from fqss_tpu.train.recipes_music import train_htdemucs

        train_htdemucs(conf)


if __name__ == "__main__":
    train()
